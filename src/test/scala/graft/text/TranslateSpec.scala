package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.extract.{EscoMatcher, TextExtract}

/** F10 tail: translation lookup path — identity for en, broadcast
  * (phrase → en) table for non-en fixtures (detect_and_translate analog,
  * /root/reference/test_pipeline.py:50-65). */
class TranslateSpec extends SparkSpec {

  private val table = Map(
    "maschinelles lernen und statistik" -> "machine learning and statistics",
    "der kurs ist mit daten" -> "the course works with data")

  test("english text is identity (never looked up)") {
    val en = "the course covers machine learning and the data with it"
    assert(Translate.translate(table, en) eq en)
  }

  test("und/empty text is identity") {
    assert(Translate.translate(table, "") === "")
    assert(Translate.translate(table, "xyzzy plugh") === "xyzzy plugh")
  }

  test("non-en lines are looked up, unknown lines fall back to identity") {
    val de = "maschinelles lernen und statistik\nder kurs ist mit daten\n" +
      "unbekannte zeile und das und das"
    val got = Translate.translate(table, de)
    assert(got === "machine learning and statistics\n" +
      "the course works with data\nunbekannte zeile und das und das")
  }

  test("non-en page flows extraction → translate → matcher end-to-end") {
    import spark.implicits._
    val dict = EscoMatcher.broadcastDict(spark, Seq(
      ("uri:ml", "machine learning"), ("uri:stats", "statistics")))
    val bc = Translate.broadcastTable(spark, table.toSeq)
    // German page: detectLang sees 'und'/'der'/'ist'/'mit'/'das' markers
    val html = ("<html><body><p>maschinelles lernen und statistik</p>" +
      "<p>der kurs ist mit daten</p><p>und das und das ist mit der</p>" +
      "</body></html>").getBytes("UTF-8")
    val df = Seq(Tuple1(html)).toDF("html")
      .withColumn("text", TextExtract.extractText(col("html")))
      .withColumn("text_en", Translate.translateUdf(bc)(col("text")))
      .withColumn("skills", EscoMatcher.matcherUdf(dict)(col("text_en")))
    val row = df.select("text", "text_en", "skills").head
    assert(TextStats.detectLang(row.getString(0)) === "de")
    assert(row.getString(1).contains("machine learning and statistics"))
    assert(row.getSeq[String](2).toSet === Set("uri:ml", "uri:stats"))
    // the untranslated text matches nothing — translation is load-bearing
    val noTrans = Seq(Tuple1(html)).toDF("html")
      .withColumn("text", TextExtract.extractText(col("html")))
      .withColumn("skills", EscoMatcher.matcherUdf(dict)(col("text")))
    assert(noTrans.select("skills").head.getSeq[String](0).isEmpty)
  }
}
