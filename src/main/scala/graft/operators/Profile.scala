package graft.operators
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main — contents vary per investigation (currently:
  * round-11 items — (a) ER min-label convergence rounds, one-hop vs
  * pointer doubling; (b) graph_triangle_count build-vs-census
  * attribution; prior investigations' measured numbers live in
  * DESIGN.md).
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
      println(f"[prof] $name%-38s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val what = args.headOption.getOrElse("all")

    if (what == "all" || what == "er") {
      // --- ER components: one-hop propagation vs pointer doubling -----
      for (pass <- 1 to 2) {
        println(s"-- er pass $pass")
        val (_, m) = EntityResolution.erMatches(spark, dir)
        val pairs = m.select(col("ka").as("ia"), col("kb").as("ib"))
          .localCheckpoint(true)
        t("doubling: propagateMinLabels") {
          val n = Dedup.propagateMinLabels(pairs).count()
          println(s"[prof]   labels=$n rounds=${Dedup.lastPropagationRounds.get()}")
        }
        // one-hop-only replica of the pre-r11 loop body for the A/B
        t("one-hop: replica loop") {
          val edgesFull = pairs.select(col("ia").as("src"), col("ib").as("dst"))
            .union(pairs.select(col("ib").as("src"), col("ia").as("dst")))
            .localCheckpoint(true)
          val parts = math.max(1, math.ceil(edgesFull.count() / 4194304.0).toInt)
          val edges = edgesFull.coalesce(parts)
          var labels = edges.select(col("src").as("doc_id")).distinct()
            .withColumn("comp", col("doc_id")).coalesce(parts).localCheckpoint(true)
          var changed = 1L
          var rounds = 0
          while (changed > 0) {
            val prop = edges.join(labels, edges("dst") === labels("doc_id"))
              .groupBy(col("src")).agg(min("comp").as("ncomp"))
            val next = labels.as("l").join(prop, col("l.doc_id") === col("src"), "left")
              .select(col("l.doc_id").as("doc_id"), col("l.comp").as("prev"),
                least(col("l.comp"), coalesce(col("ncomp"), col("l.comp"))).as("comp"))
              .localCheckpoint(true)
            changed = next.filter(col("comp") =!= col("prev")).count()
            labels = next.select("doc_id", "comp")
            rounds += 1
          }
          println(s"[prof]   labels=${labels.count()} rounds=$rounds")
        }
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }
    }

    if (what == "erq") {
      for (pass <- 1 to 2) {
        println(s"-- erq pass $pass")
        val m = t("erMatches build") {
          val mm = EntityResolution.erMatches(spark, dir)._2; mm.count(); mm
        }
        t("2hop aug + distinct + propagate") {
          val e1 = m.select(col("ka").as("src"), col("kb").as("dst"))
            .union(m.select(col("kb").as("src"), col("ka").as("dst")))
          val twoHop = e1.as("x").join(e1.as("y"), col("x.dst") === col("y.src"))
            .select(least(col("x.src"), col("y.dst")).as("ia"),
              greatest(col("x.src"), col("y.dst")).as("ib"))
            .filter(col("ia") =!= col("ib"))
          val n = Dedup.propagateMinLabels(
            m.select(col("ka").as("ia"), col("kb").as("ib"))
              .union(twoHop).distinct()).count()
          println(s"[prof]   labels=$n rounds=${Dedup.lastPropagationRounds.get()}")
        }
        t("full er_customer_components") {
          val n = EntityResolution.customerComponents.run(spark, dir).count()
          println(s"[prof]   rows=$n rounds=${Dedup.lastPropagationRounds.get()}")
        }
        // decomposition over a WARM matches frame
        val comp0 = t("  [warm] aug+propagate") {
          val e1 = m.select(col("ka").as("src"), col("kb").as("dst"))
            .union(m.select(col("kb").as("src"), col("ka").as("dst")))
          val twoHop = e1.as("x").join(e1.as("y"), col("x.dst") === col("y.src"))
            .select(least(col("x.src"), col("y.dst")).as("ia"),
              greatest(col("x.src"), col("y.dst")).as("ib"))
            .filter(col("ia") =!= col("ib"))
          val c = Dedup.propagateMinLabels(
            m.select(col("ka").as("ia"), col("kb").as("ib"))
              .union(twoHop).distinct())
          c.count(); c
        }
        t("  [warm] census from comp+matches") {
          val nations = m.select(col("ka").as("doc_id"), col("nation"))
            .union(m.select(col("kb").as("doc_id"), col("nation"))).distinct()
          val greedy = m.groupBy(col("kb").as("doc_id"))
            .agg(count(lit(1)).as("n_smaller"))
          val perRecord = nations.join(comp0, Seq("doc_id"))
            .join(greedy, Seq("doc_id"), "left_outer")
            .select(col("nation").cast("long").as("nation"), col("doc_id"),
              col("comp"), col("n_smaller").isNull.as("greedy_kept"))
          val compSizes = perRecord.groupBy("nation", "comp").agg(count(lit(1)).as("sz"))
          perRecord.groupBy("nation")
            .agg(count(lit(1)).as("n_matched"),
              countDistinct(col("comp")).as("n_components"),
              count(when(col("greedy_kept"), 1)).as("greedy_kept"))
            .join(compSizes.groupBy("nation").agg(max(col("sz")).as("max_component_size")), Seq("nation"))
            .count()
        }
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }
    }

    if (what == "rank") {
      import org.apache.spark.sql.expressions.Window
      val D = org.apache.spark.sql.types.DecimalType(12, 2)
      for (pass <- 1 to 3) {
        println(s"-- rank pass $pass")
        val perUser = graft.Tables.events(spark, dir)
          .groupBy("user_id")
          .agg(max(col("ts")).as("last_ts"), count(lit(1)).as("freq"),
            sum((col("value").cast(D) * 100).cast("long")).as("cents"))
          .localCheckpoint(true)
        val order = Seq(asc("cents"), asc("user_id"))
        t("rank A: pid-window") {
          val parts = 32
          val local = perUser
            .repartitionByRange(parts, order: _*)
            .withColumn("__pid", spark_partition_id())
            .withColumn("__lrank", row_number().over(
              Window.partitionBy(col("__pid")).orderBy(order: _*)))
            .localCheckpoint(false)
          val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__pcnt"))
            .withColumn("__one", pmod(col("__pid"), lit(1)))
          val offsets = counts.as("a")
            .join(broadcast(counts.as("b")), col("a.__one") === col("b.__one"))
            .groupBy(col("a.__pid").as("__pid"))
            .agg(coalesce(sum(when(col("b.__pid") < col("a.__pid"), col("b.__pcnt"))), lit(0L)).as("__offset"),
              sum(col("b.__pcnt")).as("nt"))
          local.join(broadcast(offsets), "__pid")
            .withColumn("rk", col("__offset") + col("__lrank"))
            .agg(sum("rk")).head()
        }
        t("rank B: sort+mid") {
          val parts = 32
          val local = perUser
            .repartitionByRange(parts, order: _*)
            .sortWithinPartitions(order: _*)
            .withColumn("__mid", monotonically_increasing_id())
            .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
            .withColumn("__lrank", (col("__mid").bitwiseAND(lit((1L << 33) - 1)) + 1L))
            .drop("__mid")
            .localCheckpoint(false)
          val counts = local.groupBy(col("__pid")).agg(count(lit(1)).as("__pcnt"))
            .withColumn("__one", pmod(col("__pid"), lit(1)))
          val offsets = counts.as("a")
            .join(broadcast(counts.as("b")), col("a.__one") === col("b.__one"))
            .groupBy(col("a.__pid").as("__pid"))
            .agg(coalesce(sum(when(col("b.__pid") < col("a.__pid"), col("b.__pcnt"))), lit(0L)).as("__offset"),
              sum(col("b.__pcnt")).as("nt"))
          local.join(broadcast(offsets), "__pid")
            .withColumn("rk", col("__offset") + col("__lrank"))
            .agg(sum("rk")).head()
        }
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }
    }

    if (what == "all" || what == "tri") {
      // --- triangle: surface build vs closure census ------------------
      graft.functions.BloomExpressions.register(spark)
      for (pass <- 1 to 2) {
        println(s"-- tri pass $pass")
        val und = t("build: co-order edge list") {
          GraphIterative.buildCoOrderEdges(spark, dir)
        }
        val deg = t("build: degrees") {
          val d = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
            .groupBy("v").agg(count(lit(1)).as("d")).localCheckpoint(true)
          d
        }
        val ori = t("build: orientation") {
          und.join(deg.select(col("v").as("a"), col("d").as("da")), "a")
            .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
            .select(
              when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
                col("a")).otherwise(col("b")).as("u"),
              when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
                col("b")).otherwise(col("a")).as("w"))
            .localCheckpoint(true)
        }
        t("census: bloom + SHJ closure + agg") {
          val bf = ori.withColumn("k", expr("xxhash64(u, w)"))
            .stat.bloomFilter("k", 2000000L, 0.01)
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          val wedgeClose = ori.as("e1").join(ori.as("e2"), col("e1.w") === col("e2.u"))
            .select(col("e1.u").as("u"), col("e2.w").as("w"))
            .filter(call_function("bloom_might_contain",
              lit(bos.toByteArray), expr("xxhash64(u, w)")))
            .join(ori.hint("shuffle_hash"), Seq("u", "w"), "left_semi")
          val n = wedgeClose.agg(count(lit(1))).head().getLong(0)
          println(s"[prof]   triangles=$n")
        }
        spark.sharedState.cacheManager.clearCache()
        System.gc()
      }
    }
    spark.stop()
  }
}
