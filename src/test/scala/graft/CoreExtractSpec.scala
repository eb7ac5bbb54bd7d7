package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class CoreExtractSpec extends AnyFunSuite {

  // --- TextNormalize -------------------------------------------------

  test("normalizeText collapses runs, trims, then decodes entities") {
    assert(TextNormalize.normalizeText("  a \r\n\t  b  ") == "a b")
    // &nbsp; decodes AFTER trimming, so it survives at the ends
    assert(TextNormalize.normalizeText(" &nbsp;x&nbsp; ") == " x ")
    assert(TextNormalize.normalizeText("a &lt;b&gt; &amp; c") == "a <b> & c")
    assert(TextNormalize.normalizeText("") == "")
    assert(TextNormalize.normalizeText(null) == "")
    // raw nbsp at the ends is trimmed (it's in the trim set)
    assert(TextNormalize.normalizeText("  hi  ") == "hi")
    // raw nbsp inside is NOT collapsed (not in [\r\n\t ])
    assert(TextNormalize.normalizeText("a b") == "a b")
  }

  test("normalizeHtml trims then collapses; strips base64 images on demand") {
    assert(TextNormalize.normalizeHtml("\n <p>a\r\n b</p> \t") == "<p>a b</p>")
    val html = """<img src="data:image/png;base64,AAAA//x">"""
    assert(TextNormalize.normalizeHtml(html, stripBase64Image = true) ==
      """<img src="">""")
    assert(TextNormalize.normalizeHtml(html) == html)
  }

  test("trimHtmlTags removes simple tags and normalizes") {
    assert(TextNormalize.trimHtmlTags("<b>hi</b> <i>there</i>") == "hi there")
    assert(TextNormalize.trimHtmlTags(null) == null)
  }

  test("trimJsonP unwraps callback(...) on a single line") {
    assert(TextNormalize.trimJsonP("""cb({"a":1});""") == """{"a":1}""")
    assert(TextNormalize.trimJsonP("""jsonp_12({"a":1})""") == """{"a":1}""")
    assert(TextNormalize.trimJsonP("""{"a":1}""") == """{"a":1}""")
  }

  test("html entity decode: numeric, hex, unknown passthrough") {
    assert(HtmlEntities.decode("&#65;&#x42;c") == "ABc")
    assert(HtmlEntities.decode("&bogus; &amp; &") == "&bogus; & &")
    assert(HtmlEntities.decode("&#x1F600;") == new String(Character.toChars(0x1F600)))
    assert(HtmlEntities.decode("100 &euro; &mdash; ok") == "100 € — ok")
  }

  // --- UrlCanon -------------------------------------------------------

  test("rootSiteUrl mirrors reference host regex") {
    assert(UrlCanon.rootSiteUrl("https://Example.com/a/b") == "https://Example.com")
    assert(UrlCanon.rootSiteUrl("notaurl") == "notaurl")
    assert(UrlCanon.rootSiteUrl("ftp://X/") == "ftp://x/")
  }

  test("canonicalize: lowercase host, default ports, fragment, escapes") {
    assert(UrlCanon.canonicalize("HTTP://WWW.Example.COM:80/A/B?q=1#frag") ==
      "http://www.example.com/A/B?q=1")
    assert(UrlCanon.canonicalize("https://a.com:443") == "https://a.com/")
    assert(UrlCanon.canonicalize("https://a.com:8443/x") == "https://a.com:8443/x")
    assert(UrlCanon.canonicalize("http://a.com/p%2fq%41 b") == "http://a.com/p%2FqA%20b")
    assert(UrlCanon.canonicalize("http://a.com?x=1") == "http://a.com/?x=1")
  }

  test("canonicalize is idempotent") {
    val urls = Seq(
      "HTTP://A.com:80/%7Euser/x#y", "https://B.org/a b",
      "http://c.net/%2F%2f", "https://d.io")
    for (u <- urls) {
      val once = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(once) == once, s"not idempotent for $u")
    }
  }

  test("host extraction") {
    assert(UrlCanon.host("https://User@WWW.Ex.COM:8080/a") == "www.ex.com")
    assert(UrlCanon.host("http://ex.com") == "ex.com")
    assert(UrlCanon.host("garbage") == "")
  }

  // --- ArticleExtractor ------------------------------------------------

  val article: String = {
    val para1 = "This is the first paragraph of the body text and it talks at length about many important things that matter to the reader. " * 3
    val para2 = "A second paragraph continues the discussion with even more detail and verbose exposition of the topic at hand for testing. " * 3
    s"""<html>
       |<head>
       |<title>Big News Story - Example Site</title>
       |</head>
       |<body>
       |<div class="nav">
       |<a href="/">home</a>
       |<a href="/news">news</a>
       |</div>
       |
       |
       |<h1>Big News Story</h1>
       |<div class="meta">2023-07-14 10:30 作者：张三</div>
       |<div class="content">
       |<p>$para1</p>
       |<p>$para2</p>
       |<p>$para1</p>
       |<p>$para2</p>
       |</div>
       |<div class="footer">
       |</div>
       |</body>
       |</html>""".stripMargin
  }

  test("extract: title prefers h1 prefix of <title>") {
    val a = ArticleExtractor.extract(article)
    assert(a.title == "Big News Story")
  }

  test("extract: date and author from body") {
    val a = ArticleExtractor.extract(article)
    assert(a.published.contains(java.time.LocalDateTime.of(2023, 7, 14, 10, 30, 0)))
    assert(a.author.contains("张三"))
  }

  test("extract: content contains body paragraphs, not nav") {
    val a = ArticleExtractor.extract(article)
    assert(a.content.contains("first paragraph of the body text"))
    assert(a.content.contains("second paragraph continues"))
    assert(!a.content.contains("home"))
  }

  test("extract: compressed single-line html is reflowed") {
    val longText = "Sentence with plenty of characters to push the density scan over its limit threshold. " * 6
    val paras = (1 to 8).map(i => s"<p>Para $i: $longText</p>").mkString
    val footer = "<div>a</div>" * 10
    val compressed = s"<html><head><title>T</title></head><body><div>x</div>" +
      paras + footer + "</body></html>"
    assert(compressed.count(_ == '\n') < 10)
    val a = ArticleExtractor.extract(compressed)
    assert(a.title == "T")
    assert(a.content.contains("plenty of characters"))
  }

  test("extract: short page yields empty content (tail-window semantics)") {
    val html = "<html><title>tiny</title><body><p>short</p></body></html>"
    val a = ArticleExtractor.extract(html)
    assert(a.content == "")
    assert(a.title == "tiny")
  }

  test("extract: script/style/comments are stripped before scan") {
    val longText = "Visible article text that should be retained by the extraction stage. " * 8
    val paras = (1 to 8).map(i => s"<p>Para $i: $longText</p>").mkString("\n")
    val footer = (1 to 10).map(_ => "<div>f</div>").mkString("\n")
    val html = s"""<html><title>S</title>
      |<body>
      |<script>
      |var hidden = "SCRIPT_PAYLOAD";
      |</script>
      |<style>
      |.x { color: red }
      |</style>
      |<!-- COMMENT_PAYLOAD -->
      |$paras
      |$footer
      |</body></html>""".stripMargin
    val a = ArticleExtractor.extract(html)
    assert(!a.content.contains("SCRIPT_PAYLOAD"))
    assert(!a.content.contains("COMMENT_PAYLOAD"))
    assert(a.content.contains("Visible article text"))
  }

  test("date parse shapes") {
    import ArticleExtractor.parseDate
    assert(parseDate("2020-03-16").contains(java.time.LocalDateTime.of(2020, 3, 16, 0, 0)))
    assert(parseDate("03/16/2020").contains(java.time.LocalDateTime.of(2020, 3, 16, 0, 0)))
    assert(parseDate("2020年3月16日 08:05").contains(java.time.LocalDateTime.of(2020, 3, 16, 8, 5)))
    assert(parseDate("16/03/2020").isEmpty) // month 16 invalid, like DateTime.TryParse(en-US)
    assert(parseDate("21/1/2").contains(java.time.LocalDateTime.of(2021, 1, 2, 0, 0)))
    assert(parseDate("99/1/2").contains(java.time.LocalDateTime.of(1999, 1, 2, 0, 0)))
    assert(parseDate("2020-02-30").isEmpty)
  }

  test("getPublishDate picks first match in tag-stripped text") {
    val d = ArticleExtractor.getPublishDate("<span>发布时间：2021-12-01 09:15:30</span>")
    assert(d.contains(java.time.LocalDateTime.of(2021, 12, 1, 9, 15, 30)))
    // backreferenced separator: mixed separators must NOT match
    assert(ArticleExtractor.getPublishDate("2021-12/01").isEmpty)
  }

  test("getAuthor priority: 作者/文 over 来源 over 编辑") {
    assert(ArticleExtractor.getAuthor("x 来源：新华社 作者：李四 y").contains("李四"))
    assert(ArticleExtractor.getAuthor("x 来源：新华社 y").contains("新华社"))
    assert(ArticleExtractor.getAuthor("编辑：小王").contains("小王"))
    assert(ArticleExtractor.getAuthor("nothing here").isEmpty)
  }

  test("multi-line tags are reflowed before the scan") {
    val longText = "Line oriented scanning needs reflowed attributes to work correctly here. " * 6
    val html = s"""<html><title>R</title>
      |<body>
      |<a
      |  href='http://example.com'
      |  class='test'>link</a>
      |<p>$longText</p>
      |<p>$longText</p>
      |<p>$longText</p>
      |</body></html>""".stripMargin
    val a = ArticleExtractor.extract(html)
    assert(a.content.contains("Line oriented scanning"))
  }

  // --- round-3 core review fixes -------------------------------------

  test("resolve: foreign schemes pass through untouched") {
    assert(UrlCanon.resolve("http://s.com/news/", "mailto:ed@s.com")
      == "mailto:ed@s.com")
    assert(UrlCanon.resolve("http://s.com/news/", "tel:+1-555")
      == "tel:+1-555")
    assert(UrlCanon.resolve("http://s.com/news/", "ftp://f.com/a")
      == "ftp://f.com/a")
    // but ordinary relatives still resolve
    assert(UrlCanon.resolve("http://s.com/news/", "a/1.html")
      == "http://s.com/news/a/1.html")
    // and query/fragment forms are untouched by the scheme check
    assert(UrlCanon.resolve("http://s.com/p", "?q=a:b") == "http://s.com/p?q=a:b")
  }

  test("relative <base href> is absolutized against the page URL") {
    val html = """<html><head><base href="/en/"></head>
      |<body><a href="news/1.html">x</a></body></html>""".stripMargin
    val out = UrlCanon.resolveHtmlUrls(html, "http://x.com/a/index.html")
    assert(out.contains("href=\"http://x.com/en/news/1.html\""), out)
  }

  test("MiniDom: '/' ending an unquoted attr value stays in the value") {
    val doc = MiniDom.parse("<div><a href=/news/123/>Story</a></div>")
    val a = doc.children.head.children.head
    assert(a.tag == "a" && a.attr("href").contains("/news/123/"))
    assert(a.innerText == "Story",
      "the anchor must not be self-closing — its text belongs inside")
    // whitespace-separated '/' is still a self-close marker
    val d2 = MiniDom.parse("<div><span a=1 /></div>")
    assert(d2.children.head.children.head.children.isEmpty)
  }

  test("rule with empty itemExp falls back to auto catalog detection") {
    val lis = (0 until 5).map(j =>
      s"""<li><a href="/a/$j.html">Catalog story number $j</a></li>""").mkString
    val html = s"<html><body><ul>$lis</ul></body></html>"
    val rule = CatalogRule("XPath", itemExp = "",
      artContentExp = Some("//div[@id='c']"))
    val items = RuleEngine.detect(html, "http://h.com/", rule)
    assert(items.size == 5, s"auto fallback must find the list: $items")
  }

  test("empty-itemExp fallback is XPath-only (reference HtmlAnalyzer.cs:45-48)") {
    val lis = (0 until 5).map(j =>
      s"""<li><a href="/a/$j.html">Catalog story number $j</a></li>""").mkString
    val html = s"<html><body><ul>$lis</ul></body></html>"
    // a JPath rule with an empty itemExp must NOT run HTML auto-
    // detection over the content — the reference's JPath branch runs
    // its (empty) select over the JSON doc and yields nothing
    val jrule = CatalogRule("JPath", itemExp = "")
    assert(RuleEngine.detect(html, "http://h.com/", jrule).isEmpty,
      "JPath rule auto-detected an HTML catalog")
    // Regex likewise never falls back (the reference branch is
    // NotImplementedException; our extension yields no named groups)
    val rrule = CatalogRule("Regex", itemExp = "")
    assert(RuleEngine.detect(html, "http://h.com/", rrule).isEmpty,
      "Regex rule auto-detected an HTML catalog")
  }

  test("JPath dates parse find-based (ISO-8601 inside a longer token)") {
    assert(ArticleExtractor.getPublishDate("2024-06-01T08:30:00")
      .contains(java.time.LocalDateTime.of(2024, 6, 1, 0, 0)))
  }

  test("XPath content override stores innerHtml as content-with-tags") {
    val html = """<html><body><div id="c"><p>Hello <b>world</b></p></div>
      |<p>Other</p></body></html>""".stripMargin
    val rule = CatalogRule("XPath", "//ul/li[*]/a",
      artContentExp = Some("//div[@id='c']"))
    val d = RuleEngine.parseArticle(html, Some(rule))
    assert(d.contentWithTags == "<p>Hello <b>world</b></p>", d.contentWithTags)
    assert(d.content == "Hello world")
  }

  test("content-with-tags passes through NormalizeHtml (HtmlAnalyzer.cs:234)") {
    val html = "<html><body><div id=\"c\">\n  <p>Hello\r\n  <b>world</b></p>\n</div></body></html>"
    val rule = CatalogRule("XPath", "//ul/li[*]/a",
      artContentExp = Some("//div[@id='c']"))
    val d = RuleEngine.parseArticle(html, Some(rule))
    // trimmed at the ends, inner runs of \r\n\t/space collapse to one
    assert(d.contentWithTags == "<p>Hello <b>world</b></p>", d.contentWithTags)
  }

  test("innerHtml re-quotes attribute values safely; raw source entities survive") {
    val html = """<div id="c"><a href='/x?a=1&b=2&amp;c="q"' title='5 &lt; 6'>t</a>""" +
      "<p>a &amp; b &lt; c</p></div>"
    val doc = MiniDom.parse(html)
    val div = doc.children.head
    val out = div.innerHtml
    // bare & escapes, existing entity refs are NOT double-escaped, and
    // the single-quoted source value re-emits double-quoted with " and
    // < escaped
    assert(out.contains("href=\"/x?a=1&amp;b=2&amp;c=&quot;q&quot;\""), out)
    assert(out.contains("title=\"5 &lt; 6\""), out)
    // text children are raw source (entities undecoded) — verbatim
    assert(out.contains("<p>a &amp; b &lt; c</p>"), out)
    // the serialized form re-parses to the same STRUCTURE (the r3 form
    // with raw " or < in a double-quoted value could re-parse
    // differently) — attr values hold the raw escaped text since
    // MiniDom never decodes entities
    val re = MiniDom.parse("<div>" + out + "</div>")
    val a1 = re.children.head.children.head
    assert(a1.tag == "a")
    assert(a1.attrs("href") == "/x?a=1&amp;b=2&amp;c=&quot;q&quot;")
    assert(a1.attrs("title") == "5 &lt; 6")
  }
}
