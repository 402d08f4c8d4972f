package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Synth

class EscoMatcherSpec extends AnyFunSuite {

  private val dict = EscoMatcher.buildDict(
    Synth.escoLabels().map(l => (l.concept_uri, l.preferred_label)))

  test("normalize mirrors _normalize_skill: lowercase, keep [a-z0-9+-.#]") {
    assert(EscoMatcher.normalize("Machine  Learning!") === "machine learning")
    assert(EscoMatcher.normalize("C++ & C#") === "c++ c#")
    assert(EscoMatcher.normalize("  data-analysis.io ") === "data-analysis.io")
  }

  test("multi-word labels match by token n-gram containment") {
    val uris = EscoMatcher.matchUris(dict,
      "Students learn machine learning and apply statistics daily.")
    val labels = uris.map(dict.labelOf)
    assert(labels.contains("machine learning"))
    assert(labels.contains("apply statistics"))
    assert(labels.contains("statistics")) // single-word label also present
  }

  test("no match on partial words; punctuation-insensitive") {
    val uris = EscoMatcher.matchUris(dict, "machinelearning is one word")
    assert(uris.isEmpty)
    val uris2 = EscoMatcher.matchUris(dict, "We teach: Databases, deeply")
    assert(uris2.map(dict.labelOf).contains("databases"))
  }

  test("embedded labels in synthetic pages are all found") {
    val labels = Synth.escoLabels().map(_.preferred_label).toIndexedSeq
    for (h <- 0 until 8; p <- 0 until 6) {
      val n = Synth.pagesPerHost(h, 8)
      val text = Synth.text(h, p, n, labels)
      val found = EscoMatcher.matchUris(dict, text).map(dict.labelOf).toSet
      val embedded = Synth.embeddedLabels(h, p, labels).toSet
      assert(embedded.subsetOf(found),
        s"missing ${embedded -- found} in page ($h,$p)")
    }
  }

  test("matcher output is deterministic and sorted") {
    val t = "machine learning, data analysis and machine learning again"
    val a = EscoMatcher.matchUris(dict, t)
    assert(a === a.sorted)
    assert(a === EscoMatcher.matchUris(dict, t))
    assert(a.distinct === a)
  }
}
