package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.fuzzy.Ratio

/** Fuzzy-matching operator surface (SURVEY.md J7, W4, A8, A11, F1-F4
  * consumers) over the testdata + documents tables.
  */
object FuzzyQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** J7: fuzzy similarity join with blocking — the reference merges
    * near-duplicate course keys when token_set_ratio ≥ 88
    * (/root/reference/database.py:942-945, 1022-1071). Blocking key =
    * first token, so candidate pairs come from a co-partitioned equi
    * join, never a cross join; the UDF scores only within blocks.
    *
    * Scale shape: the UDF scores **distinct key pairs**, not row pairs —
    * real corpora duplicate keys heavily (every "Introduction to
    * Programming" shares one key), so row-pair scoring is O(rows²/blocks)
    * UDF calls where distinct-pair scoring is O(keys²/blocks), and the
    * row-level result comes back from a native equi join against the
    * passing key pairs (output-identical; OpsSpec asserts equality with
    * the direct row-pair formulation). */
  def fuzzyJoin(df: DataFrame, keyCol: String, idCol: String,
      threshold: Int): DataFrame = {
    val k = df.select(col(idCol).as("id"), col(keyCol).as("key"),
      split(lower(col(keyCol)), " ").getItem(0).as("block"))
    val keys = k.select(col("block"), col("key")).distinct()
    // ordered distinct-key pairs within a block, both orientations (the
    // row-level pair orientation is decided by id, not key) + identical
    // keys (score 100 by definition, no UDF needed)
    val cross = keys.alias("x").join(keys.alias("y"),
        col("x.block") === col("y.block") && col("x.key") < col("y.key"))
      .withColumn("score",
        Ratio.fuzzTokenSetRatio(col("x.key"), col("y.key")))
      .filter(col("score") >= threshold)
    val passing =
      cross.select(col("x.block").as("pblock"), col("x.key").as("key_x"),
          col("y.key").as("key_y"), col("score"))
        .unionByName(cross.select(col("x.block").as("pblock"),
          col("y.key").as("key_x"), col("x.key").as("key_y"), col("score")))
        .unionByName(keys.select(col("block").as("pblock"),
          col("key").as("key_x"), col("key").as("key_y"),
          lit(100).as("score"))
          .filter(lit(threshold) <= 100))
    k.alias("a")
      .join(broadcast(passing),
        col("a.block") === col("pblock") && col("a.key") === col("key_x"))
      .join(k.alias("b"),
        col("b.block") === col("pblock") && col("b.key") === col("key_y") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.key").as("key_a"), col("b.key").as("key_b"), col("score"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val qFuzzyJoin: (SparkSession, String) => DataFrame = (s, dir) =>
    fuzzyJoin(t(s, dir, "part"), "p_name", "p_partkey", 88)

  /** W4: best-match-one — keep only the single highest-scoring match per
    * query key (/root/reference/skills.py:312-324 max-by-score winner). */
  val qBestMatch: (SparkSession, String) => DataFrame = (s, dir) => {
    val p = t(s, dir, "part")
    val probe = p.filter(col("p_partkey") % 50 === 0)
      .select(col("p_partkey").as("probe_id"), col("p_name").as("probe"))
    val cand = p.select(col("p_partkey").as("cand_id"),
      col("p_name").as("cand"))
    // score distinct candidate keys × probes (the UDF-call count is
    // keys×probes, not rows×probes), then fan back out to rows natively
    val scoredKeys = cand.select(col("cand")).distinct()
      .crossJoin(broadcast(probe))
      .withColumn("score", Ratio.fuzzRatio(col("probe"), col("cand")))
    val scored = cand.join(broadcast(scoredKeys), Seq("cand"))
      .filter(col("probe_id") =!= col("cand_id"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("cand_id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("probe_id"), col("cand_id"), col("score"))
      .orderBy(col("probe_id"))
  }

  /** A8: per-group keyword-area coverage — % of groups whose member set
    * hits each keyword area (/root/reference/main.py:3152-3261 skill-area
    * coverage). Areas here: part-type words over each order's items. */
  val qAreaCoverage: (SparkSession, String) => DataFrame = (s, dir) => {
    val li = t(s, dir, "lineitem"); val p = t(s, dir, "part")
    val areas = Seq("steel", "brass", "copper", "nickel", "tin")
    val joined = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(" ", collect_set(lower(col("p_type")))).as("blob"))
    val flags = areas.foldLeft(joined) { (df, a) =>
      df.withColumn(s"has_$a",
        when(col("blob").contains(a), 1).otherwise(0))
    }
    val aggCols = count(lit(1)).as("n_orders") +: areas.map(a =>
      (sum(col(s"has_$a")).cast("double") / count(lit(1)) * 100.0)
        .as(s"pct_$a"))
    flags.agg(aggCols.head, aggCols.tail: _*)
  }

  /** A11/A12: nested grouping output — rows → group → sorted struct list
    * with per-key frequency annotation
    * (/root/reference/skills.py:94-106,326-346). */
  val qNestedGroups: (SparkSession, String) => DataFrame = (s, dir) => {
    val c = t(s, dir, "customer"); val n = t(s, dir, "nation")
    val freqW = Window.partitionBy(col("c_mktsegment"))
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .withColumn("segment_freq", count(lit(1)).over(freqW))
      .groupBy(col("n_name"))
      .agg(sort_array(collect_list(struct(
        col("c_custkey").as("custkey"),
        col("c_mktsegment").as("segment"),
        col("segment_freq")))).as("members"))
      .select(col("n_name"), size(col("members")).as("n_members"),
        to_json(col("members")).as("members_json"))
      .orderBy(col("n_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fuzzy_join" -> qFuzzyJoin,
    "q_best_match" -> qBestMatch,
    "q_area_coverage" -> qAreaCoverage,
    "q_nested_groups" -> qNestedGroups)

  /** difflib-based scores have no SQL twin; q_area_coverage does. */
  val oracles: Map[String, String] = Map(
    "q_area_coverage" ->
      """WITH blob AS (
        | SELECT l_orderkey,
        |  string_agg(DISTINCT lower(p_type), ' ') AS b
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY l_orderkey)
        |SELECT count(*) AS n_orders,
        | CAST(sum(CASE WHEN b LIKE '%steel%' THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 100.0 AS pct_steel,
        | CAST(sum(CASE WHEN b LIKE '%brass%' THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 100.0 AS pct_brass,
        | CAST(sum(CASE WHEN b LIKE '%copper%' THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 100.0 AS pct_copper,
        | CAST(sum(CASE WHEN b LIKE '%nickel%' THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 100.0 AS pct_nickel,
        | CAST(sum(CASE WHEN b LIKE '%tin%' THEN 1 ELSE 0 END) AS DOUBLE)
        |   / count(*) * 100.0 AS pct_tin
        |FROM blob""".stripMargin)
}
