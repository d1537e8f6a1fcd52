package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Entity resolution / master-data dedup over a DIMENSION table — the
  * blocking → pairwise-scoring → survivorship pipeline an MDM or
  * customer-360 job runs, and the record-level sibling of the corpus
  * dedup family (same candidate-generation discipline, different
  * similarity kernel: bounded edit distance on short keys instead of
  * set similarity on shingles).
  *
  * Scale discipline: candidate pairs come ONLY from an equi-join on the
  * blocking key (nation, 16-char name prefix) — at any corpus size the
  * pair count is Σ block², and the prefix length is the knob that
  * bounds block width (here ≤ ~100 of the 9-digit name space per
  * nation). The match predicate (levenshtein ≤ 1) runs on the
  * candidates only. Canonicalization uses the SemDeDup "earliest
  * neighbor" convention — dup_of = smallest matching custkey, a record
  * with no smaller match survives — which is single-join deterministic
  * (no transitive closure pass; the component variant is the
  * `dedup_cluster_components` shape and can be swapped in).
  */
object EntityResolution {

  val customerDedup: QueryDef = QueryDef(
    "er_customer_dedup",
    (s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          substring(col("c_name"), 1, 16).as("blk"))
      val matches = c.as("a").join(c.as("b"),
          col("a.c_nationkey") === col("b.c_nationkey") &&
          col("a.blk") === col("b.blk") &&
          col("a.c_custkey") < col("b.c_custkey") &&
          levenshtein(col("a.c_name"), col("b.c_name")) <= 1)
        .select(col("a.c_custkey").as("ka"), col("b.c_custkey").as("kb"),
          col("b.c_nationkey").as("nation"))
        // the blocked levenshtein join is the dominant kernel and feeds
        // BOTH the survivorship agg and the pair rollup — build once
        .localCheckpoint(true)
      // survivor = no smaller matching neighbor
      val dupOf = matches.groupBy(col("kb").as("c_custkey"))
        .agg(min(col("ka")).as("dup_of"))
      c.join(dupOf, Seq("c_custkey"), "left_outer")
        .groupBy(col("c_nationkey").cast("long").as("nation"))
        .agg(
          count(lit(1)).as("n_customers"),
          count(col("dup_of")).as("n_dups_dropped"),
          count(when(col("dup_of").isNull, 1)).as("n_survivors"))
        .join(matches.groupBy(col("nation").cast("long").as("nation"))
          .agg(count(lit(1)).as("n_match_pairs")), Seq("nation"), "left_outer")
        .select(col("nation"), col("n_customers"),
          coalesce(col("n_match_pairs"), lit(0L)).as("n_match_pairs"),
          col("n_dups_dropped"), col("n_survivors"))
        .orderBy("nation")
    },
    Some("""
      WITH c AS (
        SELECT c_custkey, c_name, c_nationkey, substr(c_name, 1, 16) AS blk
        FROM customer),
      matches AS (
        SELECT a.c_custkey AS ka, b.c_custkey AS kb,
               b.c_nationkey AS nation
        FROM c a JOIN c b
          ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
         AND a.c_custkey < b.c_custkey
         AND levenshtein(a.c_name, b.c_name) <= 1),
      dup_of AS (
        SELECT kb AS c_custkey, MIN(ka) AS dup_of FROM matches GROUP BY 1),
      rolled AS (
        SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
               COUNT(*) AS n_customers,
               COUNT(d.dup_of) AS n_dups_dropped,
               COUNT(*) FILTER (WHERE d.dup_of IS NULL) AS n_survivors
        FROM c LEFT JOIN dup_of d ON c.c_custkey = d.c_custkey
        GROUP BY 1),
      pairs AS (
        SELECT CAST(nation AS BIGINT) AS nation, COUNT(*) AS n_match_pairs
        FROM matches GROUP BY 1)
      SELECT r.nation, r.n_customers,
             COALESCE(p.n_match_pairs, 0) AS n_match_pairs,
             r.n_dups_dropped, r.n_survivors
      FROM rolled r LEFT JOIN pairs p ON r.nation = p.nation
      ORDER BY r.nation
    """.stripMargin.trim))

  val defs: Seq[QueryDef] = Seq(customerDedup)
}
