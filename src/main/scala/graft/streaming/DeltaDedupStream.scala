package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The incremental near-dup check as a FIRST-CLASS streaming query: an
  * unbounded arrival stream of (doc_id, text) documents is probed, one
  * micro-batch at a time, against a persisted corpus sketch index (the
  * session-pinned shingle/band surface locally; a bucketed table at
  * cluster scale), and confirmed near-dup pairs land in a parquet sink.
  * This is the production shape of `dedup_minhash_incremental_delta`:
  * the one-shot gate query models a single delta; this runs the same
  * core (operators.Dedup.deltaNearDups) under Structured Streaming's
  * checkpointed exactly-once loop, so each crawl drop is deduplicated
  * against the corpus as it arrives.
  *
  * Per-batch cost is O(|batch| sketch + one-sided band join +
  * candidate-scoped verification) — the measured ~2 ms marginal per
  * document (DeltaDedupBench) — and the sink is idempotent per batch:
  * each foreachBatch invocation overwrites its OWN `batch_id=N`
  * partition directory wholesale (mode=overwrite on the per-batch
  * path), so a crash-replayed batch replaces exactly its prior output
  * and never duplicates pairs. Writing the partition path directly —
  * rather than `partitionBy` + dynamic partition overwrite — keeps the
  * plan IDENTICAL across batches (no per-batch `lit(batchId)` column),
  * so whole-stage codegen compiled for batch 0 is cache-hit by every
  * later batch, and skips the staging-dir commit dance. Batch-local
  * shuffles are sized to the arrival volume on the stream's OWN cloned
  * session (foreachBatch hands us the per-query session, so the conf
  * never leaks to the caller); production would size this to the
  * cluster instead.
  */
object DeltaDedupStream {

  def start(
      spark: SparkSession,
      deltaDocs: DataFrame, // streaming (doc_id, text)
      corpusSh: DataFrame,
      corpusBands: DataFrame,
      outDir: String,
      checkpointDir: String): StreamingQuery =
    deltaDocs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.sparkSession.conf.set("spark.sql.shuffle.partitions", "8")
        // AQE re-plans (and re-compiles) every stage per micro-batch; at
        // a few hundred rows per batch it only adds planning latency and
        // defeats codegen reuse across batches — the static plan is the
        // same one AQE would pick anyway at this volume
        batch.sparkSession.conf.set("spark.sql.adaptive.enabled", "false")
        // eager = false: the whole probe is ONE write action per batch;
        // ReuseExchange dedupes the sketch subtrees, so the per-batch
        // eager checkpoints (4 extra jobs for hundreds of rows) vanish
        graft.operators.Dedup.deltaNearDups(batch, corpusSh, corpusBands, eager = false)
          .write.mode("overwrite")
          .parquet(s"$outDir/batch_id=$batchId")
      }
      .start()
}
