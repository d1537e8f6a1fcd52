#!/usr/bin/env python3
"""Derive an sf0.3-equivalent slice from the driver's sf0.1 testdata for
the carrier growth-curve study (round-11 verdict item 5).

The driver's generator is not available locally, so this upsamples
sf0.1 x3 deterministically with DISJOINT key spaces per copy:

- lineitem: l_orderkey/l_partkey/l_suppkey offset by copy * (max+1) --
  the co-order graph becomes 3 disjoint sf0.1 graphs (edges, wedges,
  triangles each x3: exactly the linear-growth null the carriers are
  measured against).
- customer: c_custkey offset, c_name REGENERATED from the new key with
  the generator's own 'Customer#%09d' format -- block structure and
  within-block match density stay exactly sf0.1's (cloned names would
  have made every record a cross-copy levenshtein-0 match and blown the
  pair count x9).
- documents: doc_id offset; for copies 1/2 every token gets a
  copy-specific suffix so cross-copy Jaccard is 0 -- each copy keeps
  sf0.1's intrinsic near-dup rate (cloned texts would have tripled the
  dup rate instead of the corpus). n_chars recomputed.
- all other tables: byte-identical copies (the five carriers never read
  them; present so Tables.* resolves).

Output: /root/repo/target/testdata/sf0.3 (untracked build dir).
"""
import duckdb, os, shutil

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/target/testdata/sf0.3"
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def gen(table, sql):
    out = f"{DST}/{table}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    print(f"{table}: {n} rows")

copies = "(SELECT UNNEST(ARRAY[0,1,2]) AS k)"

gen("lineitem", f"""
  SELECT l_orderkey + k*150000 AS l_orderkey,
         l_partkey + k*20000 AS l_partkey,
         l_suppkey + k*1000 AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
  FROM read_parquet('{SRC}/lineitem.parquet'), {copies}
  ORDER BY l_orderkey, l_linenumber""")

gen("customer", f"""
  SELECT c_custkey + k*15000 AS c_custkey,
         printf('Customer#%09d', c_custkey + k*15000) AS c_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM read_parquet('{SRC}/customer.parquet'), {copies}
  ORDER BY c_custkey""")

gen("documents", f"""
  SELECT doc_id + k*5000 AS doc_id,
         CASE WHEN k = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1_' || k, 'g') END AS text,
         lang, source,
         strlen(CASE WHEN k = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', '\\1_' || k, 'g') END) AS n_chars
  FROM read_parquet('{SRC}/documents.parquet'), {copies}
  ORDER BY doc_id""")

# events: disjoint user/event key spaces per copy, timestamps unchanged --
# 3x the keyed state (users) at sf0.1's per-user event density, the
# linear-growth null for the stateful-stream carriers (r11 wave G/H).
gen("events", f"""
  SELECT event_id + k*1000000000 AS event_id,
         ts,
         user_id + k*1000000 AS user_id,
         event_type, value, props
  FROM read_parquet('{SRC}/events.parquet'), {copies}
  ORDER BY event_id""")

# embeddings: disjoint vec_ids; vectors unchanged (the ANN carriers are
# timed, not oracle-checked, at this SF -- cost scales with rows).
gen("embeddings", f"""
  SELECT vec_id + k*1000000 AS vec_id, embedding, label
  FROM read_parquet('{SRC}/embeddings.parquet'), {copies}
  ORDER BY vec_id""")

for t in ["orders", "part", "supplier", "nation", "region"]:
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(f"{t}: copied")
