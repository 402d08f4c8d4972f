package graft.tools

import graft.corpus.Synth
import graft.extract.{EscoMatcher, TextExtract}

/** Microbench for the per-page fetch+extract cost model (no Spark).
  * Prints ms/page for text extraction, skill matching, and signatures
  * at several page-index bands — used to attribute the round-2 crawl
  * cliff (per-page CPU appeared to grow with crawl round; this checks
  * whether cost depends on page index p, i.e. crawl depth).
  *
  * Usage: graft.tools.ExtractBench [nPagesPerBand] [richness]
  */
object ExtractBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 500
    val richness = if (args.length > 1) args(1).toInt else 30
    val labels = Synth.escoLabels()
    val dict = EscoMatcher.buildDict(labels.map(l =>
      (l.concept_uri, l.preferred_label)))
    val labelIdx = labels.map(_.preferred_label).toIndexedSeq
    val nPages = 4096
    for (band <- Seq(0, 100, 1000, 3000)) {
      var tExtract = 0L; var tMatch = 0L; var tSig = 0L; var chars = 0L
      var i = 0
      while (i < n) {
        val h = i % 97; val p = band + (i % 100)
        val html = Synth.html(h, p, nPages, labelIdx, richness)
        var t0 = System.nanoTime()
        val text = TextExtract.extract(
          html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var t1 = System.nanoTime(); tExtract += t1 - t0
        chars += text.length
        val uris = EscoMatcher.matchUris(dict, text)
        val t2 = System.nanoTime(); tMatch += t2 - t1
        val _ = (graft.dedup.Dedup.simhash(text),
          graft.dedup.Dedup.minhash(text),
          graft.text.TextStats.detectLang(text),
          TextExtract.links(html))
        val t3 = System.nanoTime(); tSig += t3 - t2
        if (uris.isEmpty && i == 0) println("warn: no uris")
        i += 1
      }
      println(f"band p=$band%5d  extract=${tExtract / 1e6 / n}%7.2f ms  " +
        f"match=${tMatch / 1e6 / n}%7.2f ms  sig+links=${tSig / 1e6 / n}%7.2f ms  " +
        f"chars/page=${chars / n}%6d")
    }
  }
}
