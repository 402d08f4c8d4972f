package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.url.Canonical
import graft.text.TextStats

/** Pins every round-3 hot-path fast path to the formulation it replaced.
  * The optimizations (zero-alloc ASCII murmur, zero-copy whitespace
  * collapse, single-parse text+links, marker-mask language detection,
  * first-token-prefiltered matcher) all claim BYTE-IDENTICAL outputs;
  * these properties check that claim on adversarial generated inputs
  * (seeded, deterministic), not just the fixture corpus. */
class FastPathSpec extends AnyFunSuite {

  // deterministic edge-case string generator: whitespace runs, controls,
  // non-ASCII (Greek incl. final-sigma context, umlauts, CJK), entity-ish
  private val edgeChars: Array[Char] =
    ("abcXYZ09" + "  \t\n\r\f\u000B" + "άΣςüßΩ€中" + "&<>.!?#+" +
      "\u0001\u001F").toCharArray

  private def edgyStrings(n: Int, maxLen: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val len = rnd.nextInt(maxLen + 1)
      new String(Array.fill(len)(edgeChars(rnd.nextInt(edgeChars.length))))
    }
  }

  test("hash64 ASCII fast path ≡ UTF-8 byte path on arbitrary strings") {
    (edgyStrings(3000, 60, 0xA11CE) ++ (0 to 40).map("x" * _))
      .foreach { s =>
        assert(Canonical.hash64(s) ===
          Canonical.murmur128(s.getBytes("UTF-8"), 0L)._1, s"for ${s.toList}")
      }
  }

  test("collapseTrim ≡ replaceAll(\"[\\\\s ]+\", \" \").trim") {
    edgyStrings(3000, 40, 0xBEE).foreach { s =>
      assert(TextExtract.collapseTrim(s) ===
        s.replaceAll("[\\s ]+", " ").trim, s"for ${s.toList}")
    }
  }

  test("collapseSpaceTab ≡ replaceAll(\"[ \\t]{2,}\", \" \").trim") {
    edgyStrings(3000, 40, 0xCAFE).foreach { s =>
      assert(TextExtract.collapseSpaceTab(s) ===
        s.replaceAll("[ \t]{2,}", " ").trim, s"for ${s.toList}")
    }
  }

  test("extractAll single parse ≡ separate extract + links on corpus html") {
    val labels = graft.corpus.Synth.escoLabels()
      .map(_.preferred_label).toIndexedSeq
    for (h <- 0 until 12; p <- 0 until 8) {
      val html = graft.corpus.Synth
        .html(h, p, 16, labels, richness = 3).getBytes("UTF-8")
      val (text, links) = TextExtract.extractAll(html)
      assert(text === TextExtract.extract(html))
      assert(links === TextExtract.links(html))
    }
  }

  test("streaming detectLang ≡ lowercase-split-count formulation") {
    def reference(text: String): String = {
      if (text == null || text.isEmpty) return "und"
      val toks = text.toLowerCase.split("[^\\p{L}]+").filter(_.nonEmpty)
      val sets = TextStats.LangMarkers.toSeq.sortBy(_._1)
        .map { case (l, m) => (l, m.toSet) }
      var bestLang = "und"; var bestCount = 0
      sets.foreach { case (lang, m) =>
        val c = toks.count(m.contains)
        if (c > bestCount) { bestLang = lang; bestCount = c }
      }
      if (bestCount == 0) "und" else bestLang
    }
    val words = TextStats.LangMarkers.values.flatten.toSeq ++ Seq(
      "data", "unit", "ΤΗΣ", "Und", "THE", "och", "x", "καi", "είναι",
      "DER", "MIT",
      // U+0130 lowercases to i + combining U+0307 (a non-letter): the
      // reference formulation re-splits on it, so "İthe" must count "the"
      "İthe", "İS", "İ", "theİ", "İundİthe",
      // supplementary-plane letters (surrogate pairs) must stay inside
      // their letter run — "𐐷the" is ONE 5-code-point token, not "the"
      "𐐷the", "𐐷", "𐐷𐐷𐐷𐐷𐐷𐐷the")
    val rnd = new scala.util.Random(0xD06)
    (0 until 2000).foreach { _ =>
      val t = (0 until rnd.nextInt(13))
        .map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      assert(TextStats.detectLang(t) === reference(t), s"for '$t'")
    }
  }

  test("first-token-prefiltered matcher ≡ exhaustive n-gram probe") {
    val dict = EscoMatcher.buildDict(
      graft.corpus.Synth.escoLabels()
        .map(l => (l.concept_uri, l.preferred_label)))
    def exhaustive(text: String): Seq[String] = {
      val tokens = EscoMatcher.normTokens(text)
      val hits = scala.collection.mutable.TreeSet.empty[String]
      for (i <- tokens.indices; n <- 1 to dict.maxN if i + n <= tokens.length)
        dict.byNgram.get(tokens.slice(i, i + n).mkString(" "))
          .foreach(_.foreach(hits.add))
      hits.toSeq
    }
    val labels = graft.corpus.Synth.escoLabels().map(_.preferred_label)
    val pieces = labels ++ Seq("students learn", "C++/Java", "machine",
      "apply", "analysis", "ΠΛΗΡΟΦΟΡΙΚΗ και data", "")
    val rnd = new scala.util.Random(0xE57)
    (0 until 500).foreach { _ =>
      val t = (0 until rnd.nextInt(9))
        .map(_ => pieces(rnd.nextInt(pieces.length))).mkString(" ")
      assert(EscoMatcher.matchUris(dict, t) === exhaustive(t), s"for '$t'")
    }
  }
}
