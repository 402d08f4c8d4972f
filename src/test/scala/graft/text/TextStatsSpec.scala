package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextStatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("tokenCount: whitespace split, empty-safe") {
    import spark.implicits._
    val df = Seq("a b  c", "", "   ", "single").toDF("text")
    val got = df.select(TextStats.tokenCount(col("text"))).collect()
      .map(_.getInt(0)).toSeq
    assert(got === Seq(3, 0, 0, 1))
  }

  test("detectLang: marker-token heuristic on known sentences") {
    assert(TextStats.detectLang("the cat and the dog is with me") === "en")
    assert(TextStats.detectLang("der Hund und die Katze ist mit mir") === "de")
    assert(TextStats.detectLang("le chat et la maison est avec moi") === "fr")
    assert(TextStats.detectLang("el perro es con los gatos para ti") === "es")
    assert(TextStats.detectLang("och att det som en med") === "sv")
    assert(TextStats.detectLang("") === "und")
    assert(TextStats.detectLang("xyzzy qwerty plugh") === "und")
  }

  test("detectLang deterministic tie-break is alphabetical") {
    // "is" is an en marker; "es" is an es marker — one hit each → 'en' < 'es'
    assert(TextStats.detectLang("is es") === "en")
  }

  test("quality/fingerprint/lang queries run with stable schemas") {
    assert(TextStats.qDocQuality(spark, dir).columns.toSeq ===
      Seq("doc_id", "n_tokens", "letter_ratio", "stopword_ratio",
        "mean_token_len", "passes_quality"))
    val fp = TextStats.qDocFingerprint(spark, dir)
    assert(fp.count() === 500)
    assert(fp.select("fingerprint").distinct().count() === 500)
    assert(TextStats.qLangId(spark, dir).count() > 0)
  }
}
