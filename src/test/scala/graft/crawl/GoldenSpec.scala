package graft.crawl

import graft.SparkSpec
import graft.corpus.Synth
import graft.tools.GoldenGen
import scala.io.Source

/** Golden crawl-semantics fixtures (FIXTURES.md §B): a fresh crawl must
  * reproduce the committed schedule, seen-set membership, per-url skill
  * labels, and top-skills ranking exactly. Shapes mirror the reference's
  * test suite (/root/reference/tests/test_compare_extracted_skills.py
  * sorted-compare, test_compare_top_skills.py ordered (skill, freq)). */
class GoldenSpec extends SparkSpec {

  private def resource(name: String): String = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream(s"/$name"), "UTF-8")
    try src.mkString finally src.close()
  }

  private lazy val fresh = {
    val pages = Synth.pages(spark, GoldenGen.NHosts, GoldenGen.Base).toDF()
    val robots = Synth.robots(spark, GoldenGen.NHosts)
    val seeds = Synth.seeds(spark, GoldenGen.NHosts)
    val dict = Synth.escoLabels().map(l => (l.concept_uri, l.preferred_label))
    val (_, results, _) = Crawler.crawl(pages, robots, seeds, dict,
      maxRounds = GoldenGen.MaxRounds, roundMs = GoldenGen.RoundMs)(spark)
    results.collect()
  }

  test("crawl schedule matches golden_crawl_order.json") {
    val want = """"([^"]+)": (\d+)""".r
      .findAllMatchIn(resource("golden_crawl_order.json"))
      .map(m => m.group(1) -> m.group(2).toInt).toMap
    val got = fresh.map(r => r.url -> r.round).toMap
    assert(got === want)
  }

  test("final seen membership matches golden_seen_set.json") {
    val want = """"([^"]+)"""".r
      .findAllMatchIn(resource("golden_seen_set.json"))
      .map(_.group(1)).toSet
    assert(fresh.map(_.url).toSet === want)
  }

  test("per-url skill labels match golden_skills_by_url.json (sorted " +
    "compare, reference test_compare_extracted_skills shape)") {
    val entry = """"([^"]+)": \[([^\]]*)\]""".r
    val want = entry.findAllMatchIn(resource("golden_skills_by_url.json"))
      .map { m =>
        m.group(1) -> """"([^"]+)"""".r.findAllMatchIn(m.group(2))
          .map(_.group(1)).toSeq
      }.toMap
    val got = fresh.map(r => r.url -> r.skill_labels).toMap
    assert(got === want)
  }

  test("global top-10 skills match golden_top_skills.json (ordered " +
    "compare, reference top_skills shape)") {
    val pair = """\["([^"]+)", (\d+)\]""".r
    val want = pair.findAllMatchIn(resource("golden_top_skills.json"))
      .map(m => (m.group(1), m.group(2).toInt)).toSeq
    val got = fresh.flatMap(_.skill_labels)
      .groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (l, n) => (-n, l) }.take(10)
    assert(got === want)
  }
}
