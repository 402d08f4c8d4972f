package graft.analytics

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.fuzzy.Ratio

class OpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fuzzy join: blocked candidates only, all scores ≥ threshold") {
    val out = FuzzyQueries.qFuzzyJoin(spark, dir).collect()
    out.foreach { r =>
      val a = r.getAs[String]("key_a"); val b = r.getAs[String]("key_b")
      assert(r.getAs[Int]("score") >= 88)
      assert(Ratio.tokenSetRatio(a, b) === r.getAs[Int]("score"))
      // blocking key correctness: same first token
      assert(a.toLowerCase.split(" ").head === b.toLowerCase.split(" ").head)
    }
  }

  test("fuzzy join: distinct-key scoring ≡ direct row-pair scoring") {
    // the production path scores distinct key pairs and expands back via
    // a native join; this is the O(rows²/blocks) reference formulation it
    // must match row-for-row
    val p = spark.read.parquet(s"$dir/part.parquet")
    val k = p.select(col("p_partkey").as("id"), col("p_name").as("key"),
      split(lower(col("p_name")), " ").getItem(0).as("block"))
    val direct = k.alias("a").join(k.alias("b"),
        col("a.block") === col("b.block") && col("a.id") < col("b.id"))
      .withColumn("score",
        Ratio.fuzzTokenSetRatio(col("a.key"), col("b.key")))
      .filter(col("score") >= 88)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.key").as("key_a"), col("b.key").as("key_b"), col("score"))
    val fast = FuzzyQueries.fuzzyJoin(p, "p_name", "p_partkey", 88)
    assert(fast.exceptAll(direct).isEmpty && direct.exceptAll(fast).isEmpty)
  }

  test("best-match-one: exactly one winner per probe, max score") {
    val out = FuzzyQueries.qBestMatch(spark, dir)
    val perProbe = out.groupBy("probe_id").count().collect()
    assert(perProbe.forall(_.getLong(1) === 1L))
  }

  test("nested grouping emits sorted struct lists with frequencies") {
    val out = FuzzyQueries.qNestedGroups(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("n_members") > 0)
      assert(r.getAs[String]("members_json").startsWith("["))
    }
  }

  test("mining: degree tokens, ects values, level inference") {
    import spark.implicits._
    val df = Seq(
      "BSc of Science with 12 ECTS mandatory, also Master option",
      "PhD programme, 30 credits, elective",
      "nothing here").toDF("t")
    val got = df.select(
      Mining.degreeTokens(col("t")).as("deg"),
      Mining.ectsValues(col("t")).as("ects"),
      Mining.mandOptFlags(col("t")).as("flags"),
      Mining.inferLevel(col("t")).as("level")).collect()
    assert(got(0).getSeq[String](0).toSet === Set("BSc", "MSc"))
    assert(got(0).getSeq[Int](1) === Seq(12))
    assert(got(0).getSeq[String](2) === Seq("Mandatory"))
    assert(got(1).getSeq[String](0) === Seq("PhD"))
    assert(got(1).getSeq[Int](1) === Seq(30))
    assert(got(1).getSeq[String](2) === Seq("Elective"))
    assert(got(1).getString(3) === "PhD")
    assert(got(2).getString(3) === "Other")
  }

  test("canonical key normalizes like the reference _canonical_key") {
    import spark.implicits._
    val got = Seq("  Intro to DB's!!  (2024)  ").toDF("t")
      .select(Mining.canonicalKey(col("t"))).head.getString(0)
    assert(got === "intro to db s 2024")
  }

  test("ml: kmeans is seed-deterministic, tfidf similar is stable") {
    val a = graft.ml.MlOps.qKmeansClusters(spark, dir).collect()
    val b = graft.ml.MlOps.qKmeansClusters(spark, dir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    assert(a.map(_.getAs[Long]("size")).sum === 500L)
    val sim = graft.ml.MlOps.qTfidfSimilar(spark, dir).collect()
    assert(sim.length === 25) // 5 queries × top-5
  }
}
