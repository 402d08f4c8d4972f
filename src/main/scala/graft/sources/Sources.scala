package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.1) beyond plain parquet:
  *
  *  - S3: JSON-directory batch source — the reference's crawler-output
  *    importer globs a directory of per-lesson JSON files and parses in
  *    pools with 1000-file flush batches (/root/reference/main.py:1278-1396).
  *    Spark-first: one `spark.read.json` (multiLine per-file documents),
  *    schema given or inferred, malformed rows routed to a side channel
  *    instead of per-row savepoints (database.py:746-855 leniency).
  *  - S4/S5: CSV with header aliases + cell cleanup — ESCO skills CSV
  *    (main.py:23-68) and the occupation table with quote-stripping
  *    (policy_engine.py:38-94).
  *  - S9/S10: partitioned parquet sink + quoted CSV export
  *    (test_pipeline.py:492-503, export_db.py:16-46).
  */
object Sources {

  /** S3: lenient JSON-dir read. Returns (good, corrupt) — corrupt rows
    * carry the raw line in `_corrupt_record` (the error side-channel
    * replacing per-row savepoints).
    *
    * Cache lifecycle: the parse runs ONCE (the (good, corrupt) split is
    * materialized eagerly via localCheckpoint while the parsed frame is
    * cached), and the cache is dropped before returning — an import-time
    * source must not leak a cached plan per call (round-2 finding). */
  def jsonDir(spark: SparkSession, dir: String,
      schema: Option[StructType] = None,
      multiLine: Boolean = true): (DataFrame, DataFrame) = {
    val base = spark.read
      .option("multiLine", multiLine)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
    val withSchema = schema match {
      case Some(s) =>
        base.schema(s.add("_corrupt_record", "string"))
      case None => base
    }
    val df = withSchema.json(dir).cache()
    try {
      if (!df.columns.contains("_corrupt_record"))
        (df.localCheckpoint(true), spark.emptyDataFrame)
      else
        (df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
          .localCheckpoint(true),
          df.filter(col("_corrupt_record").isNotNull)
            .select(col("_corrupt_record")).localCheckpoint(true))
    } finally df.unpersist()
  }

  /** S4/S5: CSV source with header aliases and quote/whitespace cleanup.
    * aliases maps canonical name → accepted header variants. */
  def cleanCsv(spark: SparkSession, path: String,
      aliases: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(path)
    // strip stray quotes/space from headers, apply aliases
    val renamed = raw.columns.foldLeft(raw) { (df, c) =>
      val cleaned = c.replaceAll("^[\"' ]+|[\"' ]+$", "")
      val canonical = aliases.collectFirst {
        case (canon, vars) if vars.exists(_.equalsIgnoreCase(cleaned)) ||
          canon.equalsIgnoreCase(cleaned) => canon
      }.getOrElse(cleaned)
      df.withColumnRenamed(c, canonical)
    }
    // strip stray quotes/space from string cells
    renamed.columns.foldLeft(renamed) { (df, c) =>
      df.withColumn(c,
        trim(regexp_replace(col(c), "^[\"']+|[\"']+$", "")))
    }
  }

  /** ESCO dictionary from CSV (the broadcast side of the matcher):
    * accepts the reference's header variants (conceptUri/uri,
    * preferredLabel/label). */
  def escoFromCsv(spark: SparkSession, path: String): Seq[(String, String)] =
    cleanCsv(spark, path, Map(
      "concept_uri" -> Seq("conceptUri", "uri", "concepturi"),
      "preferred_label" -> Seq("preferredLabel", "label", "preferredlabel")))
      .select(col("concept_uri"), col("preferred_label"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq

  /** S8 tail: upsert with set-union array merge on key conflict — the
    * reference's CourseSkill upsert merges per-field provenance category
    * arrays when the (course,skill) link already exists
    * (/root/reference/main.py:2067-2117; sorted(set(old)|set(new))
    * semantics, JSON-array CHECK in database.sql:88-97).
    *
    * Spark-first: union + hash aggregate with
    * array_sort∘array_distinct∘flatten∘collect_list — associative and
    * commutative, so it gets map-side partial aggregation and is
    * insensitive to how the input was split into "existing" vs
    * "incoming" batches (merging N batches ≡ one global merge). */
  def upsertMergeCategories(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String], arrayCol: String): DataFrame =
    existing.unionByName(incoming)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(array_distinct(flatten(
        collect_list(col(arrayCol))))).as(arrayCol))

  /** S9: per-lesson partitioned sink — parquet partitioned by a key
    * (replacing one-file-per-lesson with partition dirs). */
  def writePartitioned(df: DataFrame, dir: String, key: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(key).parquet(dir)

  /** S10: quoted CSV export of any table. */
  def exportCsv(df: DataFrame, dir: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("quoteAll", "true")
      .csv(dir)
}
