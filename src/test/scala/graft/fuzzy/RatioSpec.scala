package graft.fuzzy

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Golden parity with Python difflib.SequenceMatcher (the algorithm under
  * fuzzywuzzy's ratio — /root/reference tests depend on its exact scores).
  * Vectors generated once from CPython stdlib difflib (autojunk=False),
  * committed at src/test/resources/difflib_ratio_vectors.json. */
class RatioSpec extends AnyFunSuite {

  private case class Vec(a: String, b: String, raw: Double, ratio: Int)

  private lazy val vectors: Seq[Vec] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/difflib_ratio_vectors.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    // minimal parse of the known flat structure
    val entry = """\{"a": "(.*?)", "b": "(.*?)", "raw": ([-0-9.e]+), "ratio": (\d+)\}""".r
    entry.findAllMatchIn(json).map { m =>
      Vec(m.group(1), m.group(2), m.group(3).toDouble, m.group(4).toInt)
    }.toSeq
  }

  test("golden vectors loaded") {
    assert(vectors.size === 130)
  }

  test("ratio matches CPython difflib/fuzzywuzzy on all 130 vectors") {
    vectors.foreach { v =>
      assert(Ratio.ratio(v.a, v.b) === v.ratio, s"ratio('${v.a}','${v.b}')")
      assert(math.abs(Ratio.ratioRaw(v.a, v.b) - v.raw) < 1e-12,
        s"raw('${v.a}','${v.b}')")
    }
  }

  test("ratio parity holds in difflib's argument order (difflib M is " +
    "order-dependent — callers must keep the reference's argument order)") {
    // e.g. vectors exist where ratio(a,b) != ratio(b,a); parity with the
    // reference requires matching difflib's (a, b) orientation, which the
    // golden-vector test above pins down.
    val asym = vectors.find(v => Ratio.ratio(v.a, v.b) != Ratio.ratio(v.b, v.a))
    asym.foreach(v => info(s"asymmetric example: '${v.a}' vs '${v.b}'"))
    succeed
  }

  test("partialRatio: substring containment scores 100") {
    assert(Ratio.partialRatio("machine", "advanced machine learning") === 100)
    assert(Ratio.partialRatio("advanced machine learning", "machine") === 100)
    assert(Ratio.partialRatio("", "") === 100)
    assert(Ratio.partialRatio("abc", "") === 0)
  }

  test("tokenSetRatio: word reorder scores 100; ≥88 gate behaves " +
    "(database.py:942-945 merge threshold)") {
    assert(Ratio.tokenSetRatio("data analysis and statistics",
      "statistics and data analysis") === 100)
    assert(Ratio.tokenSetRatio("Intro to Databases",
      "intro to databases!") === 100)
    assert(Ratio.tokenSetRatio("machine learning",
      "deep sea fishing") < 88)
    assert(Ratio.tokenSetRatio("machine learning fundamentals",
      "machine learning") >= 88)
  }

  test("tokenSortRatio: sorted-token join comparison") {
    assert(Ratio.tokenSortRatio("b a", "a b") === 100)
    assert(Ratio.tokenSortRatio("x y z", "z y x") === 100)
    // duplicates are KEPT (fuzzywuzzy sorts, it does not dedup)
    assert(Ratio.tokenSortRatio("big big data", "big data") < 100)
  }

  test("partialRatio matches the CPython block-anchored replication on " +
      "69 golden vectors (fuzzywuzzy algorithm, autojunk=False)") {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/partial_ratio_vectors.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    val entry = """\{"a": "(.*?)", "b": "(.*?)", "score": (\d+)\}""".r
    val vecs = entry.findAllMatchIn(json)
      .map(m => (m.group(1), m.group(2), m.group(3).toInt)).toSeq
    assert(vecs.size === 69)
    vecs.foreach { case (a, b, want) =>
      assert(Ratio.partialRatio(a, b) === want,
        s"partialRatio('$a','$b')")
    }
  }

  test("partialRatio scores the sentinel tail window fuzzywuzzy visits") {
    // fuzzywuzzy iterates get_matching_blocks() INCLUDING the terminal
    // (len(s), len(l), 0) sentinel — its tail-anchored window is the
    // winner here (CPython fuzzywuzzy: 67; size>0 blocks alone give 40)
    assert(Ratio.partialRatio("abbb c", "bcc") === 67)
    assert(Ratio.partialRatio("bcc", "abbb c") === 67) // arg-order safe
  }

  test("tokenSortRatio matches CPython difflib on 68 golden vectors " +
      "(incl. duplicate-token cases)") {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/token_sort_vectors.json"), "UTF-8")
    val json = try src.mkString finally src.close()
    val entry = """\{"a": "(.*?)", "b": "(.*?)", "score": (\d+)\}""".r
    val vecs = entry.findAllMatchIn(json)
      .map(m => (m.group(1), m.group(2), m.group(3).toInt)).toSeq
    assert(vecs.size === 68)
    vecs.foreach { case (a, b, want) =>
      assert(Ratio.tokenSortRatio(a, b) === want,
        s"tokenSortRatio('$a','$b')")
    }
  }

  test("tokenSetRatio is NOT symmetric (difflib M is order-dependent in " +
      "tie cases) — consumers must score a canonical orientation") {
    // found by random search against CPython difflib; fuzzyJoin scores
    // each unordered pair once in (min,max) key orientation for exactly
    // this reason, and its equivalence spec compares that orientation
    val a = "analysis"; val b = "data intro ba db"
    assert(Ratio.tokenSetRatio(a, b) !== Ratio.tokenSetRatio(b, a))
  }

  test("flat-array block scan ≡ difflib b2j hash form on 4000 " +
      "pseudo-random pairs (round-6 hot-path rewrite; exact list " +
      "equality pins visit order and tie handling, not just scores)") {
    val rnd = new scala.util.Random(42)
    val alphabets = Seq("ab", "abc ", "abcdefgh ", "green stl")
    for (trial <- 0 until 4000) {
      val alpha = alphabets(trial % alphabets.size)
      def str(maxLen: Int) = {
        val n = rnd.nextInt(maxLen + 1)
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val a = str(20)
      val b = str(60)
      assert(Ratio.blocksScanForTest(a, b) === Ratio.blocksHashedForTest(a, b),
        s"blocks diverge on a='$a' b='$b'")
    }
    // long-|b| pairs cross the 512 dispatch boundary: public entry points
    // must be continuous across it
    val longB = ("abc " * 200).trim // 799 chars -> hashed path
    val nearB = longB.take(512)     // scan path
    assert(Ratio.blocksScanForTest("green cab", nearB) ===
      Ratio.blocksHashedForTest("green cab", nearB))
    assert(Ratio.blocksScanForTest("green cab", longB) ===
      Ratio.blocksHashedForTest("green cab", longB))
  }
}
