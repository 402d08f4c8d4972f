package graft.url

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Country-from-TLD resolution (SURVEY.md F5, second half) — the
  * reference maps a page's host to a country via a 26-entry TLD suffix
  * map checked in insertion order, then three special-case substring
  * rules, else "Unknown"
  * (/root/reference/test_pipeline.py:95-114 extract_country_from_url).
  *
  * Pure column expression (chained CASE WHEN): stays inside whole-stage
  * codegen, no UDF, trivially SQL-expressible for the oracle twin.
  */
object Geo {

  /** Insertion-ordered, exactly the reference map. */
  val TldCountries: Seq[(String, String)] = Seq(
    ".nl" -> "Netherlands", ".gr" -> "Greece", ".de" -> "Germany",
    ".fr" -> "France", ".it" -> "Italy", ".es" -> "Spain",
    ".pt" -> "Portugal", ".pl" -> "Poland", ".fi" -> "Finland",
    ".se" -> "Sweden", ".no" -> "Norway", ".dk" -> "Denmark",
    ".be" -> "Belgium", ".at" -> "Austria", ".cz" -> "Czech Republic",
    ".sk" -> "Slovakia", ".ro" -> "Romania", ".bg" -> "Bulgaria",
    ".hu" -> "Hungary", ".ch" -> "Switzerland", ".ie" -> "Ireland",
    ".uk" -> "United Kingdom", ".lu" -> "Luxembourg",
    ".lt" -> "Lithuania", ".lv" -> "Latvia", ".ee" -> "Estonia")

  /** Country of a (lowercase) host column: first TLD suffix match wins,
    * then the reference's special-case substring rules, else Unknown. */
  def countryOfHost(host: Column): Column = {
    val h = lower(host)
    val special = when(h.contains("rug.nl"), "Netherlands")
      .when(h.contains("auth.gr"), "Greece")
      .when(h.contains("uni-"), "Germany")
      .otherwise("Unknown")
    TldCountries.foldRight(special) { case ((tld, country), acc) =>
      when(h.endsWith(tld), country).otherwise(acc)
    }
  }

  /** Country of a URL column (host-extract then TLD map). */
  def countryOfUrl(url: Column): Column =
    countryOfHost(Canonical.urlHost(url))
}
