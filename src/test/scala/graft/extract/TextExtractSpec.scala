package graft.extract

import org.scalatest.funsuite.AnyFunSuite
import graft.corpus.Synth

class TextExtractSpec extends AnyFunSuite {

  test("cookie banner, script, style, and out-of-main chrome are stripped") {
    val html =
      """<html><head><style>a{}</style><script>var x;</script></head><body>
        |<div class="cookie-banner">We use cookies. Accept.</div>
        |<div class="nav">Skip to content</div>
        |<main><h1>Title</h1><p>Body text.</p></main>
        |<div class="footer">Footer junk</div></body></html>""".stripMargin
    assert(TextExtract.extract(html) === "Title\nBody text.")
  }

  test("tables become ' | ' rows, dl becomes 'k: v' lines") {
    val html = "<main><p>Intro.</p>" +
      "<table><tr><td>Course</td><td>ECTS</td></tr>" +
      "<tr><td>Algebra</td><td>6</td></tr></table>" +
      "<dl><dt>Language</dt><dd>English</dd></dl></main>"
    assert(TextExtract.extract(html) ===
      "Intro.\nCourse | ECTS\nAlgebra | 6\nLanguage: English")
  }

  test("line dedup is case-insensitive first-win; phrase dedup spans lines") {
    val html = "<main><p>Hello world.</p><p>HELLO WORLD.</p>" +
      "<p>Hello world. New phrase here.</p></main>"
    // line 2 dup of line 1 (ci); line 3's first sentence already seen
    assert(TextExtract.extract(html) === "Hello world.\nNew phrase here.")
  }

  test("entities decode, whitespace collapses, anchors keep inner text") {
    val html = "<main><p>A &amp; B   are  <a href=\"/x\">linked</a>.</p></main>"
    assert(TextExtract.extract(html) === "A & B are linked.")
  }

  test("links: absolute+relative hrefs kept, noise schemes dropped") {
    val html = "<main><a href=\"/a\">1</a><a href=\"#top\">2</a>" +
      "<a href=\"mailto:x@y\">3</a><a href=\"javascript:void(0)\">4</a>" +
      "<a href=\"https://z.edu/b\">5</a><a href=\"rel/c\">6</a></main>"
    assert(TextExtract.links(html) === Seq("/a", "https://z.edu/b", "rel/c"))
  }

  test("byte-identical invariant: extract(html) == corpus text column " +
    "(two independent code paths over the content model)") {
    val labels = Synth.escoLabels().map(_.preferred_label).toIndexedSeq
    for (h <- 0 until 12; p <- 0 until Synth.pagesPerHost(h, 8)) {
      val html = Synth.html(h, p, Synth.pagesPerHost(h, 8), labels)
      val expected = Synth.text(h, p, Synth.pagesPerHost(h, 8), labels)
      val got = TextExtract.extract(html.getBytes("UTF-8"))
      assert(got === expected,
        s"text mismatch for ${Synth.url(h, p)}\nHTML: $html")
      assert(got.getBytes("UTF-8").sameElements(expected.getBytes("UTF-8")))
    }
  }
}
