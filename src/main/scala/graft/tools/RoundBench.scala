package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.corpus.Synth
import graft.extract.{EscoMatcher, TextExtract}

/** Standalone micro-repro of the crawl round's fetch+extract stage:
  * corpus cache → broadcast-sel join → extraction projection → cache.
  * Used to isolate which part of the round burns ~30× the measured
  * per-page pipeline cost (BASELINE.md round-2 cliff notes).
  *
  * Usage: graft.tools.RoundBench [nSel] [richness] [mode]
  *   mode: proj  — projection over a plain synthesized DF (no join)
  *         join  — corpus cache ⋈ broadcast(sel) then projection
  */
object RoundBench {
  def main(args: Array[String]): Unit = {
    val nSel = if (args.length > 0) args(0).toInt else 12000
    val richness = if (args.length > 1) args(1).toInt else 30
    val mode = if (args.length > 2) args(2) else "proj"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config(graft.SparkTune.conf)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.StageLog.maybeInstall(spark.sparkContext)
    import spark.implicits._

    val dictLabels = Synth.escoLabels().map(l =>
      (l.concept_uri, l.preferred_label))
    val dict = EscoMatcher.broadcastDict(spark, dictLabels)
    val matchUris = EscoMatcher.matcherUdf(dict)
    val labelOf = udf((uris: Seq[String]) =>
      uris.map(u => dict.value.labelOf.getOrElse(u, u)).sorted)
    val signatures = udf((text: String) => (
      graft.dedup.Dedup.simhash(text),
      graft.dedup.Dedup.minhash(text).toSeq,
      graft.text.TextStats.detectLang(text),
      if (text == null || text.trim.isEmpty) 0
      else text.trim.split("\\s+").length))

    def project(fetched: DataFrame): DataFrame = fetched
      .withColumn("text", TextExtract.extractText(col("html")))
      .withColumn("skill_uris", matchUris(col("text")))
      .withColumn("skill_labels", labelOf(col("skill_uris")))
      .withColumn("sig", signatures(col("text")))
      .select(col("url"), col("text"), col("skill_uris"),
        col("skill_labels"), col("sig._1").as("simhash"),
        col("sig._2").as("minhash"), col("sig._3").as("lang_pred"),
        col("sig._4").as("n_tokens"))

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[roundbench] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    mode match {
      case "proj" =>
        val pages = Synth.pages(spark, 100, nSel / 100, richness)
          .toDF().cache()
        val n = timed("corpus cache")(pages.count())
        println(s"[roundbench] corpus rows=$n")
        for (i <- 1 to 3) {
          val out = project(pages).cache()
          timed(s"projection pass $i")(out.count())
          out.unpersist()
        }
      case "join" | "joinnc" =>
        val pages = Synth.pages(spark, 1000, 256, richness).toDF().cache()
        val n = timed("corpus cache")(pages.count())
        println(s"[roundbench] corpus rows=$n")
        val sel = pages.select(col("url")).limit(nSel)
          .withColumn("url_hash", lit(0L)).cache()
        sel.count()
        for (i <- 1 to 3) {
          val joined = pages.alias("p")
            .join(broadcast(sel.alias("f")), col("f.url") === col("p.url"))
            .select(col("p.url").as("url"), col("p.html").as("html"))
          val fetched = if (mode == "join") joined.cache() else joined
          val out = project(fetched).cache()
          timed(s"$mode+projection pass $i")(out.count())
          out.unpersist()
          if (mode == "join") fetched.unpersist()
        }
    }
    println("[roundbench] matchCalls=" + EscoMatcher.callCount.sum())
    spark.stop()
  }
}
