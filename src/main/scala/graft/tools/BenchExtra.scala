package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Isolation benchmarks for round-6 optimization (guide §1.4): times
  * individual stages of the expensive query pipelines with the noop sink
  * so the computation is measured, not the sink or driver collect.
  * Separate from the frozen graft.Bench driver contract.
  *
  * Usage: runMain graft.tools.BenchExtra [stage ...]
  *   default stages: theme, ratio, ann, tfidf, clusters
  *   extra (opt-in): themeplan (blob-build executed-plan dump),
  *                   catmerge (keyed-vs-plain repartition A/B)
  */
object BenchExtra {

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timed(spark: SparkSession, name: String)(f: => Unit): Double = {
    spark.sparkContext.setJobDescription(name)
    val t0 = System.nanoTime()
    f
    val s = (System.nanoTime() - t0) / 1e9
    println(f"[benchextra] $name%-40s $s%8.3f s")
    spark.sparkContext.setJobDescription(null)
    s
  }

  def main(args: Array[String]): Unit = {
    val stages = if (args.isEmpty) Set("theme", "ratio", "ann", "tfidf",
      "clusters") else args.toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.SparkTune.conf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(s: String) = spark.read.parquet(s"$sfDir/$s.parquet")

    // mirror of the (private) FuzzyQueries.themeBlobs join/aggregate
    // shape, parameterized by the lineitem source so the theme
    // decomposition and the themeplan dump share ONE definition — kept
    // in lock-step with production by using the same keyed scan
    def blobPipeline(li: DataFrame): DataFrame = {
      val o = t("orders"); val c = t("customer")
      val n = t("nation"); val p = t("part")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(p, li("l_partkey") === p("p_partkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name").as("uni"), col("o_orderkey").as("course"))
        .agg(array_sort(collect_set(lower(col("p_name")))).as("skills"))
        .withColumn("blob", concat_ws(" ", col("skills")))
    }
    def productionBlobs(): DataFrame = blobPipeline(
      graft.util.Scans.parallelBy(t("lineitem"), col("l_orderkey")))

    if (stages("theme")) {
      // decompose the theme pipeline: blob build / distinct / scoring /
      // full page. 2 reps each (first pays codegen).
      for (rep <- 1 to 2) {
        val blobs = productionBlobs()
        timed(spark, s"theme/blobs rep$rep") { noop(blobs) }
        val distinctBlobs = blobs.select(col("blob")).distinct()
        timed(spark, s"theme/distinct rep$rep") { noop(distinctBlobs) }
        val scored = distinctBlobs
          .withColumn("kw_scores", array(Seq("green", "steel").map(kw =>
            graft.fuzzy.Ratio.fuzzPartialRatio(lit(kw), lower(col("blob")))): _*))
          .withColumn("score", array_max(col("kw_scores")))
        timed(spark, s"theme/scored rep$rep") { noop(scored) }
        val filtered = scored.filter(col("score") >= 60)
        timed(spark, s"theme/filtered rep$rep") { noop(filtered) }
      }
      graft.analytics.FuzzyQueries.clearThemeMemo()
      timed(spark, "theme/q_theme_grouped full") {
        graft.analytics.FuzzyQueries.queries("q_theme_grouped")(spark, sfDir)
          .count()
      }
      graft.analytics.FuzzyQueries.clearThemeMemo()
      timed(spark, "theme/q_theme_grouped full rep2") {
        graft.analytics.FuzzyQueries.queries("q_theme_grouped")(spark, sfDir)
          .count()
      }
    }

    if (stages("themeplan")) {
      val blobs = productionBlobs()
      noop(blobs)
      println("[benchextra] blobs FINAL plan:\n" +
        blobs.queryExecution.executedPlan.toString.take(6000))
    }

    if (stages("catmerge")) {
      def variant(li: org.apache.spark.sql.DataFrame) = {
        val base = li.select(col("l_orderkey"), col("l_partkey"),
          array(col("l_returnflag"), col("l_linestatus")).as("categories"))
        val existing = base.filter(col("l_orderkey") % 2 === 0)
        val incoming = base.filter(col("l_orderkey") % 2 === 1)
        graft.sources.Sources.upsertMergeCategories(existing, incoming,
          Seq("l_orderkey", "l_partkey"), "categories")
          .select(col("l_orderkey"), col("l_partkey"),
            array_join(col("categories"), ",").as("categories"))
          .orderBy(col("l_orderkey"), col("l_partkey"))
      }
      for (rep <- 1 to 3) {
        timed(spark, s"catmerge/plain rep$rep") {
          variant(t("lineitem")).count() }
        timed(spark, s"catmerge/keyed rep$rep") {
          variant(graft.util.Scans.parallelBy(t("lineitem"),
            col("l_orderkey"), col("l_partkey"))).count() }
      }
    }

    if (stages("ratio")) {
      // driver-side microbench of the ratio family on realistic blobs
      val blobs = {
        val li = t("lineitem"); val p = t("part")
        li.join(p, li("l_partkey") === p("p_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(concat_ws(" ",
            array_sort(collect_set(lower(col("p_name"))))).as("blob"))
          .select("blob").limit(20000).collect().map(_.getString(0))
      }
      println(s"[benchextra] ratio corpus: ${blobs.length} blobs, " +
        f"mean len ${blobs.map(_.length).sum.toDouble / blobs.length}%.1f")
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        var acc = 0L
        blobs.foreach { b =>
          acc += graft.fuzzy.Ratio.partialRatio("green", b)
          acc += graft.fuzzy.Ratio.partialRatio("steel", b)
        }
        val s = (System.nanoTime() - t0) / 1e9
        println(f"[benchextra] ratio/partial 2x${blobs.length} rep$rep: " +
          f"$s%8.3f s (acc=$acc) ${s / blobs.length * 1e6 / 2}%.2f us/call")
      }
    }

    if (stages("ann")) {
      for (rep <- 1 to 2) {
        timed(spark, s"ann/q_ann_lsh rep$rep") {
          graft.similarity.Ann.queries("q_ann_lsh")(spark, sfDir).count()
        }
        timed(spark, s"ann/q_emb_similar_pairs rep$rep") {
          graft.similarity.Ann.queries("q_emb_similar_pairs")(spark, sfDir)
            .count()
        }
      }
    }

    if (stages("tfidf")) {
      for (rep <- 1 to 2) {
        timed(spark, s"tfidf/fit-only rep$rep") {
          noop(graft.ml.MlOps.tfidf(t("documents"))
            .select(col("doc_id"), col("tfidf")))
        }
        timed(spark, s"tfidf/q_tfidf_similar rep$rep") {
          graft.ml.MlOps.queries("q_tfidf_similar")(spark, sfDir).count()
        }
        timed(spark, s"tfidf/q_tfidf_lsh rep$rep") {
          graft.ml.MlOps.queries("q_tfidf_lsh")(spark, sfDir).count()
        }
        timed(spark, s"tfidf/q_kmeans rep$rep") {
          graft.ml.MlOps.queries("q_kmeans_clusters")(spark, sfDir).count()
        }
      }
    }

    if (stages("clusters")) {
      for (rep <- 1 to 2) {
        timed(spark, s"clusters/q_dedup_minhash rep$rep") {
          graft.dedup.Dedup.queries("q_dedup_minhash")(spark, sfDir).count()
        }
        timed(spark, s"clusters/q_dedup_clusters rep$rep") {
          graft.dedup.Dedup.queries("q_dedup_clusters")(spark, sfDir).count()
        }
      }
    }

    spark.stop()
  }
}
