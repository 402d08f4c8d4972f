package graft.extract

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf
import scala.collection.mutable

/** Broadcast ESCO skill-dictionary matcher.
  *
  * Replaces the reference's per-document HTTP calls to the
  * esco-skill-extractor service (/root/reference/main.py:2346-2381,
  * skills.py:27-38) and the URL→label resolution against the local ESCO CSV
  * (/root/reference/main.py:23-88) with one deterministic map-side pass:
  * the whole dictionary is broadcast, document text is tokenized, and every
  * token n-gram (n up to the longest label) is looked up in a hash map.
  * O(tokens × maxN) per document, no shuffle, no network — the "broadcast
  * skill-label dictionary matcher expressed through Catalyst UDFs" of the
  * north rule.
  *
  * Normalization mirrors `_normalize_skill`
  * (/root/reference/recommendation_system/backend/student_recommender.py:28-41):
  * lowercase, keep [a-z0-9 + - . #] and Greek letters, collapse whitespace.
  */
object EscoMatcher extends Serializable {

  final case class Dict(
      byNgram: Map[String, Array[String]], // normalized label -> concept uris
      labelOf: Map[String, String],        // concept uri -> preferred label
      maxN: Int)

  def normalize(s: String): String = {
    if (s == null) return ""
    val lower = s.toLowerCase
    val sb = new java.lang.StringBuilder(lower.length)
    var i = 0
    var lastSpace = true
    while (i < lower.length) {
      val c = lower.charAt(i)
      val keep = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '+' || c == '-' || c == '.' || c == '#' ||
        (c >= 'α' && c <= 'ω')
      if (keep) { sb.append(c); lastSpace = false }
      else if (!lastSpace) { sb.append(' '); lastSpace = true }
      i += 1
    }
    sb.toString.trim
  }

  /** Build the lookup dictionary from (concept_uri, preferred_label) rows. */
  def buildDict(labels: Seq[(String, String)]): Dict = {
    val byNgram = mutable.HashMap.empty[String, mutable.ArrayBuffer[String]]
    val labelOf = mutable.HashMap.empty[String, String]
    var maxN = 1
    labels.foreach { case (uri, label) =>
      val norm = normalize(label)
      if (norm.nonEmpty) {
        byNgram.getOrElseUpdate(norm, mutable.ArrayBuffer.empty) += uri
        labelOf(uri) = label
        val n = norm.count(_ == ' ') + 1
        if (n > maxN) maxN = n
      }
    }
    Dict(byNgram.map { case (k, v) => k -> v.toArray.sorted }.toMap,
      labelOf.toMap, maxN)
  }

  /** Match: tokenize normalized text, slide n-grams (1..maxN), collect
    * distinct concept uris in first-hit order, then sort for determinism
    * (reference sorts skill lists before compare,
    * tests/test_compare_extracted_skills.py:29-33). */
  /** Diagnostic: total matchUris invocations in this JVM (local mode —
    * driver and executors share it). Lets the crawl round log report
    * calls/page and catch plan shapes that re-evaluate extraction. */
  val callCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def matchUris(dict: Dict, text: String): Seq[String] = {
    callCount.incrementAndGet()
    val norm = normalize(text)
    if (norm.isEmpty) return Nil
    val tokens = norm.split(' ')
    val hits = mutable.TreeSet.empty[String]
    var i = 0
    while (i < tokens.length) {
      var n = 1
      val sb = new java.lang.StringBuilder()
      while (n <= dict.maxN && i + n <= tokens.length) {
        if (n > 1) sb.append(' ')
        sb.append(tokens(i + n - 1))
        dict.byNgram.get(sb.toString).foreach(_.foreach(hits.add))
        n += 1
      }
      i += 1
    }
    hits.toSeq
  }

  /** UDF pair over a broadcast dict: text → sorted concept uris / labels. */
  def matcherUdf(bc: Broadcast[Dict]): Column => Column = {
    val f = udf((text: String) => graft.Prof.time("match")(matchUris(bc.value, text)))
    c => f(c)
  }

  def labelsUdf(bc: Broadcast[Dict]): Column => Column = {
    val f = udf((text: String) =>
      matchUris(bc.value, text).map(u => bc.value.labelOf(u)).sorted)
    c => f(c)
  }

  def broadcastDict(spark: SparkSession,
      labels: Seq[(String, String)]): Broadcast[Dict] =
    spark.sparkContext.broadcast(buildDict(labels))
}
