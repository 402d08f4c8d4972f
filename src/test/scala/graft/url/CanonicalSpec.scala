package graft.url

import org.scalatest.funsuite.AnyFunSuite

class CanonicalSpec extends AnyFunSuite {

  test("canonicalize strips fragment (apify.js u.hash='' analog)") {
    assert(Canonical.canonicalize("https://x.edu/a#sec") === "https://x.edu/a")
    assert(Canonical.canonicalize("https://x.edu/#") === "https://x.edu/")
  }

  test("canonicalize lowercases scheme+host, keeps path case") {
    assert(Canonical.canonicalize("HTTPS://Uni0.Example.EDU/A/B?q=X") ===
      "https://uni0.example.edu/A/B?q=X")
  }

  test("canonicalize strips default ports, normalizes empty path") {
    assert(Canonical.canonicalize("http://x.edu:80") === "http://x.edu/")
    assert(Canonical.canonicalize("https://x.edu:443/p") === "https://x.edu/p")
    assert(Canonical.canonicalize("https://x.edu:8080/p") ===
      "https://x.edu:8080/p")
    assert(Canonical.canonicalize("https://x.edu?q=1") === "https://x.edu/?q=1")
  }

  test("host extraction") {
    assert(Canonical.host("https://uni3.example.ac.uk/courses/p1") ===
      "uni3.example.ac.uk")
    assert(Canonical.host("http://X.EDU:8080/a") === "x.edu")
    assert(Canonical.host("not a url") === "")
  }

  test("resolve relative hrefs") {
    val base = "https://u.edu/courses/page3"
    assert(Canonical.resolve(base, "/about") === "https://u.edu/about")
    assert(Canonical.resolve(base, "page4") === "https://u.edu/courses/page4")
    assert(Canonical.resolve(base, "https://other.edu/x") ===
      "https://other.edu/x")
    assert(Canonical.resolve(base, "//cdn.u.edu/x") === "https://cdn.u.edu/x")
    assert(Canonical.resolve(base, "#top") === "")
    assert(Canonical.resolve(base, "mailto:a@u.edu") === "")
  }

  test("murmur128 matches Guava murmur3_128 (x64_128 reference impl)") {
    val g = com.google.common.hash.Hashing.murmur3_128()
    val samples = Seq("", "a", "ab", "abc", "abcdefgh", "abcdefghi",
      "https://uni0.example.edu/", "0123456789abcdef",
      "0123456789abcdefg", "ünïcödé-ΔΣΩ", "x" * 1000) ++
      (0 until 200).map(i => s"https://uni$i.example.edu/courses/page$i?q=$i")
    samples.foreach { s =>
      val bytes = s.getBytes("UTF-8")
      val expected = g.hashBytes(bytes).asLong()
      assert(Canonical.murmur128(bytes, 0L)._1 === expected, s"for '$s'")
    }
  }

  test("hash64 is collision-free over the small corpus scale") {
    val urls = (0 until 50).flatMap(h => (0 until 300).map(p =>
      s"https://uni$h.example.edu/courses/page$p"))
    assert(urls.map(Canonical.hash64).distinct.size === urls.size)
  }
}
