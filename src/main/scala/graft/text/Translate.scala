package graft.text

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** F10 tail — `detect_and_translate`
  * (/root/reference/test_pipeline.py:50-65, 85-93): detect the language;
  * English (or undetectable) text passes through IDENTITY; non-English
  * text is translated before extraction so the ESCO matcher sees English
  * labels.
  *
  * The reference translates via a per-chunk HTTP model call with
  * identity fallback on any failure. This engine replaces the network
  * call with a broadcast (source phrase → English) lookup table — the
  * deterministic fixture path SURVEY.md §2.8 F10 specifies — applied
  * per line with identity fallback, mirroring the reference's
  * chunk-and-fall-back semantics without the nondeterminism. At scale
  * the table is one broadcast map probed map-side per row: no shuffle,
  * no service round-trips in the hot loop.
  */
object Translate extends Serializable {

  /** Identity for en/und; line-wise lookup (trimmed key) otherwise. */
  def translate(table: Map[String, String], text: String): String = {
    if (text == null || text.isEmpty) return text
    val lang = TextStats.detectLang(text)
    if (lang == "en" || lang == "und") text
    else text.split("\n", -1)
      .map(line => table.getOrElse(line.trim, line))
      .mkString("\n")
  }

  def translateUdf(bc: Broadcast[Map[String, String]]): Column => Column = {
    val f = udf((text: String) => translate(bc.value, text))
    c => f(c)
  }

  def broadcastTable(spark: SparkSession,
      entries: Seq[(String, String)]): Broadcast[Map[String, String]] =
    spark.sparkContext.broadcast(entries.toMap)
}
