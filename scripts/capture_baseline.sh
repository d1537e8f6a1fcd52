#!/bin/bash
# Steal-gated clean-capture loop for the committed BENCH_DETAIL.json
# baseline (protocol: DESIGN r17 §8; acceptance rule pinned in code —
# graft.Bench.probeAccept, < 0.6% on a LOADED probe).
#
# Each attempt:
#   1. PRE-gate: 20 s loaded steal probe (one spin thread per vCPU —
#      idle probes are blind to busy co-tenants). Reject -> sleep, retry.
#   2. Full bench run (which embeds its own loaded probe reading into
#      BENCH_DETAIL.json as probe_mode/probe_steal_pct/probe_accept).
#   3. POST-gate on the artifact itself: the run-long host_steal_pct
#      must pass probeAccept's 0.6% bound and the probe fields must be
#      present (probe_mode:"loaded" — a build that silently dropped the
#      loaded probe is rejected). The in-run probe READING is recorded
#      but not itself a reject condition: it is a 20 s point sample and
#      the run-long steal is the stronger full-window statistic (first
#      live outing: a run with 0.247% run-long steal was rejected on a
#      transient 2.47% probe blip at start — exactly backwards).
#      Reject -> restore the previously committed baseline, retry.
#
# Usage: scripts/capture_baseline.sh [max_attempts]
set -e
cd /root/repo
SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
MAX=${1:-8}
for i in $(seq 1 "$MAX"); do
  PROBE=$(scripts/run_main.sh graft.LoadedProbe 20 2>/dev/null | tail -1)
  echo "attempt $i pre-gate: $PROBE"
  if ! echo "$PROBE" | grep -q '"probe_accept":true'; then
    sleep 90; continue
  fi
  cp BENCH_DETAIL.json /tmp/bench_detail_backup.json
  SPARK_GRAFT_SF_DIR=$SF scripts/run_main.sh graft.Bench 2>/dev/null | tail -1
  VERDICT=$(python3 - <<'EOF'
import json
d = json.load(open('/root/repo/BENCH_DETAIL.json'))
steal = d.get("host_steal_pct")
probe = d.get("probe_steal_pct")
ok = (steal is not None and steal < 0.6 and
      d.get("probe_mode") == "loaded")
print(("accept" if ok else "reject") +
      f" run_steal={steal} probe_steal={probe}")
EOF
)
  echo "attempt $i post-gate: $VERDICT"
  case "$VERDICT" in
    accept*) echo "captured clean baseline"; exit 0 ;;
    *)
      # keep the rejected artifact around: on a night with no clean
      # window, the least-dirty full run is the honest fallback
      cp BENCH_DETAIL.json "/tmp/bench_attempt_$(date +%H%M%S).json"
      cp /tmp/bench_detail_backup.json BENCH_DETAIL.json; sleep 90 ;;
  esac
done
echo "no clean window in $MAX attempts"; exit 1
