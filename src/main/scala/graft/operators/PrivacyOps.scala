package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Privacy operators a training-data pipeline runs before release:
  * PII detection over raw text and identifier pseudonymization with a
  * referential-integrity audit. Both follow the audit_constraints
  * discipline — a clean corpus yields the all-zero PASS artifact, and
  * the specs inject violations/PII to pin that each detector counts
  * exactly them.
  */
object PrivacyOps {

  /** (name, pattern) — identical Java-regex/RE2 semantics: character
    * classes and bounded counts only, no backreferences/lookarounds, so
    * Spark and DuckDB count the same non-overlapping matches.
    */
  private val piiPatterns = Seq(
    "email" -> "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "ipv4" -> "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "ssn" -> "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone" -> "\\+[0-9]{7,15}")

  /** PII scan: per-source match counts for each pattern plus the
    * `clean` flag — all-zero on the synthetic corpus (the release-gate
    * PASS artifact; PrivacySpec injects each PII type and pins detection).
    * One scan, codegen'd regexp_extract_all, no shuffle beyond the
    * source rollup; at 100 TB this is the map-side pass the redaction
    * job shares its scan with.
    */
  val piiScan: QueryDef = QueryDef(
    "privacy_pii_scan",
    (s, dir) => {
      // patterns ride as Column literals, not SQL-string text — Spark's
      // double-quoted SQL literals would eat the backslash escapes
      val counts = piiPatterns.map { case (name, pat) =>
        sum(size(regexp_extract_all(col("text"), lit(pat), lit(0)))
          .cast("long")).as(s"n_$name")
      }
      Tables.documents(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), counts: _*)
        .withColumn("clean",
          piiPatterns.map { case (n, _) => col(s"n_$n") === 0 }.reduce(_ && _))
        .orderBy("source")
    },
    Some(s"""
      SELECT source, COUNT(*) AS n_docs,
             ${piiPatterns.map { case (n, p) =>
               s"CAST(SUM(len(regexp_extract_all(text, '$p'))) AS BIGINT) AS n_$n"
             }.mkString(",\n             ")},
             ${piiPatterns.map { case (_, p) =>
               s"SUM(len(regexp_extract_all(text, '$p'))) = 0" }
               .mkString(" AND ")} AS clean
      FROM documents
      GROUP BY source
      ORDER BY source
    """.stripMargin.trim))

  /** Pseudonymization with referential-integrity audit: user ids are
    * replaced by salted-md5 surrogate keys, and the audit proves the
    * mapping is CONSISTENT (same user → same pseudonym everywhere) and
    * INJECTIVE (no two users share a pseudonym — the property that
    * keeps per-user analytics valid after scrubbing). Per event type:
    * distinct users vs distinct pseudonyms (equal iff injective on
    * that slice); globally: the exact collision count. All map-side
    * hashing + keyed distinct aggregation.
    */
  val pseudonymizeAudit: QueryDef = QueryDef(
    "privacy_pseudonymize_audit",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          md5(concat(lit("pseud:"), col("user_id").cast("string")).cast("binary"))
            .as("pseudonym"),
          col("user_id"))
      val collisions = ev.select("pseudonym", "user_id").distinct()
        .groupBy("pseudonym").agg(count(lit(1)).as("n_users"))
        .filter(col("n_users") > 1)
        .agg(coalesce(sum(col("n_users") - 1), lit(0L)).as("n_collisions"))
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          countDistinct(col("pseudonym")).as("n_pseudonyms"))
        .crossJoin(broadcast(collisions))
        .withColumn("injective", col("n_users") === col("n_pseudonyms"))
        .select("event_type", "n_events", "n_users", "n_pseudonyms",
          "injective", "n_collisions")
        .orderBy("event_type")
    },
    Some("""
      WITH ev AS (
        SELECT event_type,
               md5('pseud:' || CAST(user_id AS VARCHAR)) AS pseudonym,
               user_id
        FROM events),
      coll AS (
        SELECT CAST(COALESCE(SUM(n_users - 1), 0) AS BIGINT) AS n_collisions
        FROM (SELECT pseudonym, COUNT(*) AS n_users
              FROM (SELECT DISTINCT pseudonym, user_id FROM ev) t
              GROUP BY 1 HAVING COUNT(*) > 1) c)
      SELECT event_type, COUNT(*) AS n_events,
             COUNT(DISTINCT user_id) AS n_users,
             COUNT(DISTINCT pseudonym) AS n_pseudonyms,
             COUNT(DISTINCT user_id) = COUNT(DISTINCT pseudonym) AS injective,
             MIN(n_collisions) AS n_collisions
      FROM ev CROSS JOIN coll
      GROUP BY event_type
      ORDER BY event_type
    """.stripMargin.trim))

  /** One shared quasi-identifier definition for both anonymity audits:
    * the released "view" is (nation, market segment) — the classic
    * linkable-attribute pair. Kept as a single column list so the two
    * queries can never audit different views.
    */
  private val quasiIds = Seq("c_nationkey", "c_mktsegment")
  private val quasiIdsSql = quasiIds.mkString(", ")

  /** k-anonymity census of the customer release view: every row's
    * equivalence class under the quasi-identifiers, summarized as a
    * class-size histogram (for each k: how many classes, how many rows
    * sit in them, and whether that bucket violates the k ≥ 5 release
    * policy). The release gate reads one small table instead of
    * scanning per-row: rows in violating buckets are exactly the ones
    * a suppression pass would drop.
    *
    * Scale shape: one keyed count by QI (map-side combinable), then a
    * histogram over class counts — the second agg runs over |classes|
    * rows, never the corpus.
    */
  val kAnonymity: QueryDef = QueryDef(
    "privacy_k_anonymity",
    (s, dir) => {
      Tables.customer(s, dir)
        .groupBy(quasiIds.map(col): _*)
        .agg(count(lit(1)).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("n_classes"),
          sum(col("k")).as("n_customers"))
        .withColumn("violates", col("k") < 5)
        .orderBy("k")
    },
    Some(s"""
      WITH classes AS (
        SELECT $quasiIdsSql, COUNT(*) AS k FROM customer GROUP BY $quasiIdsSql)
      SELECT k, COUNT(*) AS n_classes, CAST(SUM(k) AS BIGINT) AS n_customers,
             k < 5 AS violates
      FROM classes
      GROUP BY k
      ORDER BY k
    """.stripMargin.trim))

  /** l-diversity over the same quasi-identifier classes: the sensitive
    * attribute is the account-balance band (2000-unit buckets), and a
    * class with l = 1 is a homogeneity breach — k-anonymity alone would
    * still let a linker learn every member's balance band. Output is
    * the l-histogram with the minimum class size per l bucket, so the
    * release gate sees at a glance whether low-diversity classes are
    * also small (the worst combination).
    */
  val lDiversity: QueryDef = QueryDef(
    "privacy_l_diversity",
    (s, dir) => {
      Tables.customer(s, dir)
        .withColumn("bal_band", expr("CAST(FLOOR(c_acctbal / 2000) AS BIGINT)"))
        .groupBy(quasiIds.map(col): _*)
        .agg(count(lit(1)).as("k"),
          countDistinct(col("bal_band")).as("l"))
        .groupBy("l")
        .agg(count(lit(1)).as("n_classes"),
          sum(col("k")).as("n_customers"),
          min(col("k")).as("min_class_size"))
        .withColumn("homogeneous", col("l") === 1)
        .orderBy("l")
    },
    Some(s"""
      WITH classes AS (
        SELECT $quasiIdsSql, COUNT(*) AS k,
               COUNT(DISTINCT CAST(FLOOR(c_acctbal / 2000) AS BIGINT)) AS l
        FROM customer GROUP BY $quasiIdsSql)
      SELECT l, COUNT(*) AS n_classes, CAST(SUM(k) AS BIGINT) AS n_customers,
             MIN(k) AS min_class_size, l = 1 AS homogeneous
      FROM classes
      GROUP BY l
      ORDER BY l
    """.stripMargin.trim))

  /** t-closeness over the same quasi-identifier classes — the third
    * rung of the anonymity ladder: a class can be k-anonymous AND
    * l-diverse while its sensitive-attribute DISTRIBUTION still leaks
    * (e.g. 90% of one class in the lowest balance band vs 20%
    * globally). Distance is the Earth Mover's Distance for ordered
    * categories — EMD(P,Q) = Σ_b |cumP(b) − cumQ(b)| / (m−1) over the
    * m balance bands — computed EXACTLY in integers: per-band
    * cumulative counts cross-multiplied against class size k and
    * corpus size n (|cumP·n − cumQ·k| in DECIMAL(38,0): cum·n reaches
    * n², the rank-sum overflow class), normalized to ppm with one
    * final integer division. Output is the t-decile census (classes,
    * rows, worst t per decile) with t > 0.3 flagged — the release
    * gate's one-glance artifact, like the k/l histograms.
    *
    * Scale shape: one keyed (QI, band) count, a broadcast dense-band
    * grid (bands are a fixed value domain — ⌊acctbal/2000⌋ spans ~6
    * values at any corpus size), per-CLASS cumulative windows
    * (partitioned, never global), and the global cumulative ALSO
    * derives from the class cums by re-aggregation (Σ_c cumP(c,b) =
    * cumQ(b)) — so no unpartitioned window exists anywhere; the final
    * census aggregates |classes| rows.
    */
  val tCloseness: QueryDef = QueryDef(
    "privacy_t_closeness",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cellCounts = Tables.customer(s, dir)
        .withColumn("band", expr("CAST(FLOOR(c_acctbal / 2000) AS BIGINT)"))
        .groupBy(quasiIds.map(col) :+ col("band"): _*)
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint(true) // feeds classes, the band list and the grid
      val classes = cellCounts.groupBy(quasiIds.map(col): _*)
        .agg(sum(col("cnt")).as("k"))
      val bands = cellCounts.select("band").distinct()
      val wc = Window.partitionBy(quasiIds.map(col): _*).orderBy("band")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = classes
        .crossJoin(broadcast(bands)) // dense grid: every class × every band
        .join(cellCounts, quasiIds :+ "band", "left")
        .select(quasiIds.map(col) ++ Seq(col("band"), col("k"),
          coalesce(col("cnt"), lit(0L)).as("cnt")): _*)
        .withColumn("cumc", sum(col("cnt")).over(wc))
      val gcum = cum.groupBy("band").agg(sum(col("cumc")).as("cumq"))
      val tot = classes.agg(sum(col("k")).as("n"))
      cum
        .join(broadcast(gcum), "band")
        .crossJoin(broadcast(tot))
        .groupBy(quasiIds.map(col) :+ col("k"): _*)
        .agg(count(lit(1)).as("m"),
          max(col("n")).as("n"),
          sum(expr("ABS(CAST(cumc AS DECIMAL(38,0)) * n - CAST(cumq AS DECIMAL(38,0)) * k)"))
            .as("emd_num"))
        .withColumn("t_ppm", expr(
          """CAST(CAST(emd_num * 1000000 AS DECIMAL(38,0))
             DIV (GREATEST(m - 1, 1) * CAST(k AS DECIMAL(38,0)) * n) AS BIGINT)"""))
        .groupBy(expr("t_ppm DIV 100000").as("t_decile"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("k")).as("n_customers"),
          max(col("t_ppm")).as("max_t_ppm"))
        .withColumn("violates", col("t_decile") >= 3)
        .orderBy("t_decile")
    },
    Some(s"""
      WITH cells AS (
        SELECT $quasiIdsSql, CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS band,
               COUNT(*) AS cnt
        FROM customer GROUP BY $quasiIdsSql, band),
      classes AS (
        SELECT $quasiIdsSql, CAST(SUM(cnt) AS BIGINT) AS k
        FROM cells GROUP BY $quasiIdsSql),
      bands AS (SELECT DISTINCT band FROM cells),
      grid AS (
        SELECT c.*, b.band, COALESCE(x.cnt, 0) AS cnt
        FROM classes c CROSS JOIN bands b
        LEFT JOIN cells x USING ($quasiIdsSql, band)),
      cums AS (
        SELECT *, SUM(cnt) OVER (PARTITION BY $quasiIdsSql ORDER BY band
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        FROM grid),
      gcum AS (SELECT band, CAST(SUM(cumc) AS BIGINT) AS cumq FROM cums GROUP BY band),
      tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM classes),
      scored AS (
        SELECT $quasiIdsSql, k, COUNT(*) AS m, MAX(n) AS n,
               SUM(ABS(CAST(cumc AS HUGEINT) * n - CAST(cumq AS HUGEINT) * k)) AS emd_num
        FROM cums JOIN gcum USING (band) CROSS JOIN tot
        GROUP BY $quasiIdsSql, k),
      t AS (
        SELECT k, t_ppm, CAST(t_ppm // 100000 AS BIGINT) AS t_decile
        FROM (SELECT k, CAST(emd_num * 1000000
                // (GREATEST(m - 1, 1) * CAST(k AS HUGEINT) * n) AS BIGINT) AS t_ppm
              FROM scored) s)
      SELECT t_decile,
             COUNT(*) AS n_classes,
             CAST(SUM(k) AS BIGINT) AS n_customers,
             MAX(t_ppm) AS max_t_ppm,
             t_decile >= 3 AS violates
      FROM t
      GROUP BY t_decile
      ORDER BY t_decile
    """.stripMargin.trim))

  /** Number of leading zero BITS of a 24-bit hex-uniform value v — a
    * Geometric(1/2) draw by inverse CDF, computed as a pure integer
    * threshold ladder (identical text in both dialects): P(lz ≥ k) =
    * P(v < 2^(24−k)) = 2^(−k). No log(), no float — the geometric
    * mechanism with ZERO cross-engine rounding surface.
    */
  private def geoLadder(v: String): String =
    (0 to 23).map(k => s"WHEN $v >= ${1L << (23 - k)} THEN $k")
      .mkString("CASE ", " ", " ELSE 24 END")

  /** Differentially-private release of per-nation customer counts under
    * the GEOMETRIC MECHANISM (the discrete Laplace): noise = G₁ − G₂
    * with G ~ Geometric(1/2) gives the two-sided geometric distribution
    * that satisfies ε-DP for counts at ε = ln 2 (Ghosh-Roughgarden-
    * Sundararajan's universally-optimal integer mechanism). The draws
    * are seeded from the group key via the house md5 hex-uniform and a
    * leading-zero-bit ladder — all-integer inverse-CDF sampling, so the
    * "noise" is deterministic for the oracle while having exactly the
    * two-sided-geometric marginals a production run would draw fresh.
    * Released counts are clamped at 0 (post-processing preserves DP).
    *
    * Scale shape: one broadcast dimension join + keyed count; the noise
    * is a per-GROUP scalar expression — no extra pass, no shuffle
    * beyond the aggregation, mergeable map-side like any count.
    */
  val dpGeometricCounts: QueryDef = QueryDef(
    "privacy_dp_geometric_counts",
    (s, dir) => {
      import org.apache.spark.sql.functions.broadcast
      Tables.customer(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n_exact"))
        .withColumn("v1", expr(ScalePatterns.hexIntSpark(
          "md5(CAST(CONCAT('dp1:', n_name) AS BINARY))")))
        .withColumn("v2", expr(ScalePatterns.hexIntSpark(
          "md5(CAST(CONCAT('dp2:', n_name) AS BINARY))")))
        .withColumn("noise",
          expr(geoLadder("v1")) - expr(geoLadder("v2")))
        .withColumn("n_released", greatest(col("n_exact") + col("noise"), lit(0L)))
        .select("n_name", "n_exact", "noise", "n_released")
        .orderBy("n_name")
    },
    Some(s"""
      WITH counts AS (
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1),
      seeded AS (
        SELECT n_name, n_exact,
               ${ScalePatterns.hexIntDuck("md5('dp1:' || n_name)")} AS v1,
               ${ScalePatterns.hexIntDuck("md5('dp2:' || n_name)")} AS v2
        FROM counts)
      SELECT n_name, n_exact,
             CAST((${geoLadder("v1")}) - (${geoLadder("v2")}) AS INT) AS noise,
             GREATEST(n_exact + (${geoLadder("v1")}) - (${geoLadder("v2")}), 0) AS n_released
      FROM seeded
      ORDER BY n_name
    """.stripMargin.trim))

  val defs: Seq[QueryDef] =
    Seq(piiScan, pseudonymizeAudit, kAnonymity, lDiversity, tCloseness,
      dpGeometricCounts)
}
