package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — contents vary per investigation (currently:
  * round-18 optimization A/Bs — (a) pagerank superstep build side:
  * edges-broadcast [declared] vs node-sized-contrib-broadcast; (b) the
  * co-occurrence pair generator: distinct+self-join vs groupBy+sorted-
  * array pair explosion; (c) theil-sen phase attribution; (d) whether
  * localCheckpoint preserves outputPartitioning for downstream
  * exchange reuse. Prior rounds' measured numbers live in DESIGN.md.)
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    def settle(): Unit = {
      graft.PinnedStorage.sweep(spark, blocking = true)
      System.gc()
    }
    val what = args.headOption.getOrElse("all")

    if (what == "all" || what == "pr") {
      // --- pagerank: which side should each superstep build? ---------
      for (pass <- 1 to 3) {
        println(s"-- pr pass $pass")
        t("declared graph_pagerank_bipartite") {
          GraphIterative.pagerank.run(spark, dir).count()
        }
        settle()
        t("variant: broadcast(contrib) supersteps") {
          val e0 = graft.Tables.lineitem(spark, dir)
            .select((col("l_suppkey") * 2).as("src"), (col("l_partkey") * 2 + 1).as("dst"))
            .distinct()
          val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
            .localCheckpoint()
          val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
            .select(col("src").as("node"), col("deg"))
            .localCheckpoint()
          var ranks = deg.select(col("node"), lit(1000000L).as("rank"))
          for (_ <- 1 to 3) {
            val contrib = ranks.join(deg, "node")
              .select(col("node"), expr("rank DIV deg").as("c"))
            ranks = edges.join(broadcast(contrib), edges("src") === contrib("node"))
              .groupBy(col("dst").as("node"))
              .agg(expr("CAST(150000 + (85 * SUM(c)) DIV 100 AS BIGINT)").as("rank"))
          }
          ranks.select(
              when(col("node") % 2 === 0, lit("supplier")).otherwise(lit("part")).as("node_type"),
              expr("node DIV 2").as("key"), col("node").as("node_id"), col("rank"))
            .orderBy(desc("rank"), asc("node_id")).limit(20).count()
        }
        settle()
      }
    }

    if (what == "all" || what == "pairs") {
      // --- co-purchase pair generation ---------------------------------
      for (pass <- 1 to 3) {
        println(s"-- pairs pass $pass")
        t("declared rec_copurchase_lift") {
          StatsExtra.copurchaseLift.run(spark, dir).count()
        }
        settle()
        t("variant: groupBy+array pair explosion") {
          val sets = graft.Tables.lineitem(spark, dir)
            .groupBy("l_orderkey")
            .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
            .localCheckpoint(false)
          val pairs = sets.select(explode(expr(
              """flatten(transform(ps, (x, i) ->
                 transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
              .as("p"))
            .groupBy(col("p.a").as("part_a"), col("p.b").as("part_b"))
            .agg(count(lit(1)).as("n_ab"))
          val partOrders = sets.select(explode(col("ps")).as("l_partkey"))
            .groupBy("l_partkey").agg(count(lit(1)).as("n_part"))
          val nOrders = sets.agg(count(lit(1)).as("n_orders"))
          pairs
            .join(broadcast(partOrders.withColumnRenamed("l_partkey", "part_a")
              .withColumnRenamed("n_part", "n_a")), "part_a")
            .join(broadcast(partOrders.withColumnRenamed("l_partkey", "part_b")
              .withColumnRenamed("n_part", "n_b")), "part_b")
            .crossJoin(broadcast(nOrders))
            .select(col("part_a"), col("part_b"), col("n_ab"), col("n_a"), col("n_b"),
              expr("""CAST((CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000)
                          DIV (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)""")
                .as("lift_ppm"))
            .orderBy(desc("n_ab"), desc("lift_ppm"), asc("part_a"), asc("part_b"))
            .limit(20).count()
        }
        settle()
      }
    }

    if (what == "all" || what == "tri2") {
      // --- triangle surface build: join vs explosion -------------------
      graft.functions.BloomExpressions.register(spark)
      for (pass <- 1 to 3) {
        println(s"-- tri2 pass $pass")
        t("declared: buildCoOrderEdges (join)") {
          GraphIterative.buildCoOrderEdges(spark, dir).count()
        }
        settle()
        t("variant: explode pairs + distinct") {
          graft.Tables.lineitem(spark, dir)
            .groupBy(col("l_orderkey"))
            .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
            .select(explode(expr(
              """flatten(transform(ps, (x, i) ->
                 transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"""))
              .as("p"))
            .select(col("p.a").as("a"), col("p.b").as("b")).distinct()
            .localCheckpoint(true).count()
        }
        settle()
      }
    }

    if (what == "all" || what == "ts") {
      // --- theil-sen phase attribution ---------------------------------
      for (pass <- 1 to 3) {
        println(s"-- ts pass $pass")
        t("declared stats_theil_sen_mann_kendall") {
          StatsExtra.theilSenMk.run(spark, dir).count()
        }
        settle()
        val daily = t("  phase: daily grain + checkpoint") {
          graft.Tables.orders(spark, dir)
            .groupBy(to_date(col("o_orderdate")).as("d"))
            .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)")
              .as("rc"))
            .select(datediff(col("d"), lit("1992-01-01")).cast("long").as("di"),
              col("rc"))
            .localCheckpoint(true)
        }
        val pairs = t("  phase: pair frame + checkpoint") {
          daily.as("a")
            .join(broadcast(daily.as("b")), col("a.di") < col("b.di"))
            .select(
              ((col("b.rc") - col("a.rc")).cast("double")
                / (lit(100.0) * (col("b.di") - col("a.di")).cast("double"))).as("slope"),
              signum((col("b.rc") - col("a.rc")).cast("double")).cast("long").as("sgn"))
            .localCheckpoint(true)
        }
        t("  phase: median via two-stage rank") {
          TwoStageOrder.withGlobalRank(
              pairs.select("slope"), Seq(asc("slope")), "r", "tot")
            .filter(col("r") === expr("(tot + 1) DIV 2") || col("r") === expr("(tot + 2) DIV 2"))
            .agg(avg(col("slope")).as("theil_sen_slope")).count()
        }
        t("  phase: MK agg") {
          pairs.agg(sum(col("sgn")).as("mk_s"))
            .crossJoin(daily.agg(count(lit(1)).as("n_days"))).count()
        }
        settle()
      }
    }

    if (what == "all" || what == "ckpt") {
      // --- does localCheckpoint carry partitioning downstream? ---------
      val df = graft.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
        .repartition(col("k"))
        .localCheckpoint(true)
      val agg = df.groupBy("k").agg(count(lit(1)).as("n"))
      val nEx = agg.queryExecution.executedPlan.toString
        .split("\n").count(_.contains("Exchange"))
      println(s"[prof] ckpt: groupBy-after-repartition+checkpoint exchanges=$nEx")
      println(agg.queryExecution.executedPlan.toString.split("\n").take(12).mkString("\n"))
    }
    spark.stop()
  }
}
