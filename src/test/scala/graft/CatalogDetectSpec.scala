package graft

import graft.core.{CatalogDetect, UrlCanon}
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests for catalog (article-list) auto-detection — hand-written
  * HTML, independent of FixtureGen. Pins the semantics ported from the
  * reference's HtmlAnalyzer (link validity :28-31, noise areas :370-375,
  * group thresholds Constants.cs:8-11, dedup-keep-titled :328-334). */
class CatalogDetectSpec extends AnyFunSuite {

  val base = "http://news.example.com/index.html"

  test("detects the dominant dated link group; drops nav/footer noise") {
    val html =
      """<html><body>
        |<nav><a href="/">Home</a><a href="/tags">Tags</a><a href="/feed">Feed</a></nav>
        |<ul>
        |<li><a href="/story/101.html">First long headline here</a><span>2024-03-01 08:00</span></li>
        |<li><a href="/story/102.html">Second long headline here</a><span>2024-03-02 09:30</span></li>
        |<li><a href="/story/103.html">Third long headline here</a><span>2024-03-03 10:15</span></li>
        |</ul>
        |<footer><a href="/about">About</a><a href="/contact">Contact</a><a href="/legal">Legal</a></footer>
        |</body></html>""".stripMargin
    val items = CatalogDetect.detect(html, base)
    assert(items.map(_.url) == Vector(
      "http://news.example.com/story/101.html",
      "http://news.example.com/story/102.html",
      "http://news.example.com/story/103.html"))
    assert(items.forall(_.published.isDefined))
    assert(items(1).title == "Second long headline here")
    assert(items(1).published.get.toString == "2024-03-02T09:30")
  }

  test("invalid links (fragment, javascript, empty) never become items") {
    val html =
      """<html><body><ul>
        |<li><a href="#top">Anchor link with long text</a></li>
        |<li><a href="javascript:void(0)">Javascript link long text</a></li>
        |<li><a href="/a/1.html">Real story headline one</a> 2024-01-01</li>
        |<li><a href="/a/2.html">Real story headline two</a> 2024-01-02</li>
        |<li><a href="/a/3.html">Real story headline three</a> 2024-01-03</li>
        |</ul></body></html>""".stripMargin
    val items = CatalogDetect.detect(html, base)
    assert(items.size == 3)
    assert(items.forall(_.url.contains("/a/")))
  }

  test("groups smaller than 3 links or with only short texts are dropped") {
    val html =
      """<html><body>
        |<a href="/x/1.html">Long enough text one</a>
        |<a href="/x/2.html">Long enough text two</a>
        |<a href="/s/1.html">a</a><a href="/s/2.html">b</a><a href="/s/3.html">c</a>
        |</body></html>""".stripMargin
    assert(CatalogDetect.detect(html, base).isEmpty)
  }

  test("messy hrefs canonicalize and dedup keeps the first titled item") {
    val html =
      """<html><body><ul>
        |<li><a href="HTTP://NEWS.EXAMPLE.COM:80/a/1.html">Dup headline text</a></li>
        |<li><a href="/a/1.html#frag"></a></li>
        |<li><a href="/a/2.html">Another headline text</a></li>
        |<li><a href="a/3.html">Relative headline text</a></li>
        |</ul></body></html>""".stripMargin
    val items = CatalogDetect.detect(html, "http://news.example.com/")
    assert(items.map(_.url) == Vector(
      "http://news.example.com/a/1.html",
      "http://news.example.com/a/2.html",
      "http://news.example.com/a/3.html"))
    assert(items.head.title == "Dup headline text")
  }

  test("<base href> overrides the page url for resolution") {
    val html =
      """<html><head><base href="http://cdn.example.org/mirror/"></head><body>
        |<a href="p/1.html">Mirrored story headline 1</a>
        |<a href="p/2.html">Mirrored story headline 2</a>
        |<a href="p/3.html">Mirrored story headline 3</a>
        |</body></html>""".stripMargin
    val items = CatalogDetect.detect(html, base)
    assert(items.map(_.url) == Vector(
      "http://cdn.example.org/mirror/p/1.html",
      "http://cdn.example.org/mirror/p/2.html",
      "http://cdn.example.org/mirror/p/3.html"))
  }

  test("dated iteration is adopted; sibling undated branch is dropped") {
    // ≥5 dated nodes → RemoveNoiseBranches adopts the dated subtree as
    // the root and the undated list never reaches the output
    // (HtmlAnalyzer.cs:489-512)
    val dated = (1 to 5).map(i =>
      s"""<li><a href="/d/$i.html">Dated headline number $i</a> 2024-05-0$i</li>""").mkString
    val undated = (1 to 5).map(i =>
      s"""<li><a href="/u/$i.html">Undated headline number $i with much longer text</a></li>""").mkString
    val html = s"<html><body><ul>$dated</ul><ul>$undated</ul></body></html>"
    val items = CatalogDetect.detect(html, base)
    assert(items.nonEmpty)
    assert(items.map(_.url).forall(_.contains("/d/")), items.map(_.url))
  }

  test("url resolution: relative forms") {
    assert(UrlCanon.resolve("http://a.com/x/y.html", "z.html") == "http://a.com/x/z.html")
    assert(UrlCanon.resolve("http://a.com/x/y.html", "/z.html") == "http://a.com/z.html")
    assert(UrlCanon.resolve("http://a.com/x/y.html", "//b.com/z") == "http://b.com/z")
    assert(UrlCanon.resolve("http://a.com/x/y.html", "../z.html") == "http://a.com/z.html")
    assert(UrlCanon.resolve("http://a.com/x/y.html", "?p=2") == "http://a.com/x/y.html?p=2")
    assert(UrlCanon.resolve("http://a.com/x/", "./a/b.html") == "http://a.com/x/a/b.html")
    assert(UrlCanon.resolve("http://a.com/x/y?q=1", "z.html") == "http://a.com/x/z.html")
    assert(UrlCanon.resolve("http://a.com", "p.html") == "http://a.com/p.html")
    assert(UrlCanon.resolve("http://a.com/x/y.html", "https://b.com/q") == "https://b.com/q")
  }
}
