package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Synth

class EscoMatcherSpec extends AnyFunSuite {

  private val dict = EscoMatcher.buildDict(
    Synth.escoLabels().map(l => (l.concept_uri, l.preferred_label)))

  test("normalize mirrors _normalize_skill: strip+lower, DELETE disallowed") {
    // deletion, not space-substitution; internal whitespace preserved
    assert(EscoMatcher.normalize("Machine  Learning!") === "machine  learning")
    assert(EscoMatcher.normalize("C++/Java") === "c++java")
    assert(EscoMatcher.normalize("C++ & C#") === "c++  c#")
    assert(EscoMatcher.normalize("  data-analysis.io ") === "data-analysis.io")
    assert(EscoMatcher.normalize("ΠΛΗΡΟΦΟΡΙΚΗ") === "πληροφορικη")
  }

  test("normalize matches CPython _normalize_skill on all golden vectors") {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/normalize_vectors.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    def unescape(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        if (s.charAt(i) == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case c => sb.append(c); i += 2
          }
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      sb.toString
    }
    val entry = """\{"in": "(.*?)", "out": "(.*?)"\}""".r
    val vecs = entry.findAllMatchIn(json)
      .map(m => (unescape(m.group(1)), unescape(m.group(2)))).toSeq
    assert(vecs.size === 31)
    vecs.foreach { case (in, out) =>
      assert(EscoMatcher.normalize(in) === out, s"input=${in}")
    }
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
