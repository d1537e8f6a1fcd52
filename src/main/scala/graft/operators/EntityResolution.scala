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

  /** THE blocked-and-scored match-pair definition (ka < kb, same
    * nation+prefix block, levenshtein ≤ 1), checkpointed — shared by
    * the greedy survivorship query and the transitive-component census
    * so the two survivorship policies are compared on the SAME pairs.
    */
  private[operators] def erMatches(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        substring(col("c_name"), 1, 16).as("blk"))
    val m = c.as("a").join(c.as("b"),
        col("a.c_nationkey") === col("b.c_nationkey") &&
        col("a.blk") === col("b.blk") &&
        col("a.c_custkey") < col("b.c_custkey") &&
        levenshtein(col("a.c_name"), col("b.c_name")) <= 1)
      .select(col("a.c_custkey").as("ka"), col("b.c_custkey").as("kb"),
        col("b.c_nationkey").as("nation"), col("a.blk").as("blk"))
      // the blocked levenshtein join is the dominant kernel and feeds
      // multiple consumers — build once
      .localCheckpoint(true)
    (c, m)
  }

  /** DuckDB twin of [[erMatches]]: CTEs `c` + `matches`. */
  private val erMatchesDuck: String =
    """c AS (
      |        SELECT c_custkey, c_name, c_nationkey, substr(c_name, 1, 16) AS blk
      |        FROM customer),
      |      matches AS (
      |        SELECT a.c_custkey AS ka, b.c_custkey AS kb,
      |               b.c_nationkey AS nation
      |        FROM c a JOIN c b
      |          ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
      |         AND a.c_custkey < b.c_custkey
      |         AND levenshtein(a.c_name, b.c_name) <= 1)""".stripMargin

  val customerDedup: QueryDef = QueryDef(
    "er_customer_dedup",
    (s, dir) => {
      val (c, matches) = erMatches(s, dir)
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
    Some(s"""
      WITH $erMatchesDuck,
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

  /** Transitive survivorship census over the SAME match pairs: min-label
    * connected components (the [[Dedup.componentLabelsOf]] propagation
    * loop, convergence-bounded over edge vertices only) versus the
    * greedy earliest-neighbor policy. Greedy keeps every record with no
    * SMALLER match — on a chain a−b−c where a−c is no direct match,
    * greedy keeps {a, c} while the true entity count is 1 — so
    * `over_retained = greedy_kept − n_components` per nation is exactly
    * the duplicate mass the cheap policy leaks; the number that decides
    * whether the extra propagation passes are worth running.
    */
  val customerComponents: QueryDef = QueryDef(
    "er_customer_components",
    (s, dir) => {
      val (_, matches) = erMatches(s, dir)
      // ZERO-ROUND components: the match join requires equal
      // (nation, blk), so a component can never span two blocks — the
      // global connected components ARE the per-block components, and a
      // per-block union-find aggregation replaces the driver-scheduled
      // fixpoint loop entirely (r10 verdict item 3: the ~10 serial
      // rounds ARE the cost at local scale, and O(log d) rounds of
      // cluster barriers at 100 TB). One shuffle on the block key,
      // map-side combinable, state bounded by the block width the
      // blocked levenshtein join already commits to (Σ block² pairs).
      // The attach-under-smaller-root invariant makes every tree root
      // the component minimum, so labels are bit-identical to the
      // propagation fixpoint (BlockUnionFindSpec fuzzes the equality;
      // graphs whose components DO span blocking keys — the document
      // near-dup graph — keep using Dedup.propagateMinLabels).
      val comp = blockComponents(matches)
      val nations = matches.select(col("ka").as("doc_id"), col("nation"))
        .union(matches.select(col("kb").as("doc_id"), col("nation")))
        .distinct()
      val greedy = matches.groupBy(col("kb").as("doc_id"))
        .agg(count(lit(1)).as("n_smaller"))
      // r19 (verdict item 5): the three per-record joins key on doc_id
      // over match-proportional stats-less frames — un-hinted they
      // planned SortMergeJoins (exchange + SORT each side); the
      // shuffle_hash hints keep the exchanges but drop every sort
      // (broadcast would trip the broadcast-growth canary: all three
      // sides grow with the match count). perRecord is then
      // checkpointed: un-materialized, BOTH aggregation consumers
      // (per-nation census and component sizes) re-ran the whole
      // nations⋈comp⋈greedy chain including the union-find aggregate —
      // the before-plan carried the full subtree twice.
      val perRecord = nations
        .join(comp.hint("shuffle_hash"), Seq("doc_id"))
        .join(greedy.hint("shuffle_hash"), Seq("doc_id"), "left_outer")
        .select(col("nation").cast("long").as("nation"), col("doc_id"),
          col("comp"), col("n_smaller").isNull.as("greedy_kept"))
        .localCheckpoint(true)
      val compSizes = perRecord.groupBy("nation", "comp")
        .agg(count(lit(1)).as("sz"))
      perRecord.groupBy("nation")
        .agg(count(lit(1)).as("n_matched"),
          countDistinct(col("comp")).as("n_components"),
          count(when(col("greedy_kept"), 1)).as("greedy_kept"))
        // nation-grain side: bounded by the nation dimension (≤ 25 rows
        // at any corpus), so the broadcast is safe where the
        // match-proportional frames above are not
        .join(broadcast(compSizes.groupBy("nation")
          .agg(max(col("sz")).as("max_component_size"))), Seq("nation"))
        .select(col("nation"), col("n_matched"), col("n_components"),
          col("max_component_size"), col("greedy_kept"),
          (col("greedy_kept") - col("n_components")).as("over_retained"))
        .orderBy("nation")
    },
    Some(s"""
      WITH RECURSIVE $erMatchesDuck,
      edges AS (SELECT ka AS src, kb AS dst FROM matches
                UNION ALL SELECT kb, ka FROM matches),
      seeds AS (SELECT DISTINCT ka AS id FROM matches
                UNION SELECT DISTINCT kb FROM matches),
      reach(id, r) AS (
        SELECT id, id FROM seeds
        UNION
        SELECT e.src, reach.r FROM reach JOIN edges e ON reach.id = e.dst),
      comp AS (SELECT id AS doc_id, MIN(r) AS comp FROM reach GROUP BY id),
      nations AS (
        SELECT DISTINCT doc_id, nation FROM (
          SELECT ka AS doc_id, nation FROM matches
          UNION ALL SELECT kb, nation FROM matches) t),
      greedy AS (SELECT kb AS doc_id, COUNT(*) AS n_smaller FROM matches GROUP BY 1),
      per_record AS (
        SELECT CAST(n.nation AS BIGINT) AS nation, n.doc_id, c.comp,
               g.n_smaller IS NULL AS greedy_kept
        FROM nations n JOIN comp c USING (doc_id)
        LEFT JOIN greedy g USING (doc_id)),
      sizes AS (
        SELECT nation, comp, COUNT(*) AS sz FROM per_record GROUP BY 1, 2)
      SELECT p.nation, COUNT(*) AS n_matched,
             COUNT(DISTINCT p.comp) AS n_components,
             (SELECT CAST(MAX(sz) AS BIGINT) FROM sizes s WHERE s.nation = p.nation)
               AS max_component_size,
             COUNT(*) FILTER (WHERE greedy_kept) AS greedy_kept,
             COUNT(*) FILTER (WHERE greedy_kept)
               - COUNT(DISTINCT p.comp) AS over_retained
      FROM per_record p
      GROUP BY p.nation
      ORDER BY p.nation
    """.stripMargin.trim))

  /** Connected-component labels of a BLOCK-CONFINED pair graph as one
    * keyed aggregation: pairs grouped by their blocking key, union-find
    * within each group, labels exploded back out as (doc_id, comp).
    * Correct ONLY when edges cannot span blocks (true here by the match
    * join's equality on nation+blk); the payoff is zero driver-scheduled
    * fixpoint rounds. Returns one row per matched vertex.
    */
  private[operators] def blockComponents(
      matches: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val rowEnc: Encoder[(String, Long, Long)] =
      Encoders.tuple(Encoders.STRING, Encoders.scalaLong, Encoders.scalaLong)
    implicit val pairEnc: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    matches
      .select(concat_ws("|", col("nation"), col("blk")).as("bk"),
        col("ka"), col("kb"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(BlockUnionFind.toColumn.name("labels"))
      .flatMap(_._2)
      .toDF("doc_id", "comp")
  }

  /** Union-find over the pairs of ONE block (§2.10 typed-Aggregator
    * surface, like npm.LatestPerPackage): buffer = parent-pointer
    * forest; union attaches the LARGER root under the smaller, so every
    * final root is its component's minimum id — the same label the
    * min-propagation fixpoint converges to. Merge replays the smaller
    * side's parent edges (each connects two same-component vertices),
    * so partial map-side buffers combine associatively and the result
    * is placement-independent. State is O(block vertices) — bounded by
    * the same block width that bounds the candidate join.
    */
  private[operators] object BlockUnionFind
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long), Map[Long, Long], Seq[(Long, Long)]] {
    import org.apache.spark.sql.{Encoder, Encoders}

    override def zero: Map[Long, Long] = Map.empty

    private def root(p: Map[Long, Long], x: Long): Long = {
      var r = x
      while (p.getOrElse(r, r) != r) r = p(r)
      r
    }

    private def union(p: Map[Long, Long], a: Long, b: Long): Map[Long, Long] = {
      val ra = root(p, a)
      val rb = root(p, b)
      if (ra == rb) p
      else if (ra < rb) p + (rb -> ra)
      else p + (ra -> rb)
    }

    override def reduce(p: Map[Long, Long], pair: (Long, Long)): Map[Long, Long] =
      // self-entries keep vertices visible even when they end up as a
      // tree root that never appears on the child side of an edge
      union(p + (pair._1 -> root(p, pair._1)) + (pair._2 -> root(p, pair._2)),
        pair._1, pair._2)

    override def merge(l: Map[Long, Long], r: Map[Long, Long]): Map[Long, Long] =
      r.foldLeft(l) { case (acc, (k, v)) =>
        union(acc + (k -> root(acc, k)), k, v)
      }

    override def finish(p: Map[Long, Long]): Seq[(Long, Long)] =
      p.keysIterator.map(v => v -> root(p, v)).toSeq

    override def bufferEncoder: Encoder[Map[Long, Long]] =
      Encoders.kryo[Map[Long, Long]]
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      Encoders.kryo[Seq[(Long, Long)]]
  }

  val defs: Seq[QueryDef] = Seq(customerDedup, customerComponents)
}
