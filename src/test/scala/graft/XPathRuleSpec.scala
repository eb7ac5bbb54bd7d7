package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

class XPathRuleSpec extends AnyFunSuite {

  // ---- MiniDom ----------------------------------------------------------

  test("dom: nesting, attrs, text, voids, comments, raw script") {
    val root = MiniDom.parse(
      """<!DOCTYPE html><html><head><meta charset="utf-8">
        |<script>if (a<b && c>d) { x(); }</script></head>
        |<body><!-- noise --><div id="main" class='big box'>
        |Hello <b>world</b><br>line2</div></body></html>""".stripMargin)
    val html = root.children.find(_.tag == "html").get
    val body = html.children.find(_.tag == "body").get
    val div = body.children.find(_.tag == "div").get
    assert(div.attr("id").contains("main"))
    assert(div.attr("class").contains("big box"))
    assert(div.innerText.replaceAll("\\s+", " ").trim == "Hello worldline2")
    // script body is raw text, excluded from innerText
    assert(!html.innerText.contains("x()"))
  }

  test("dom: li soup auto-closes; unmatched close ignored") {
    val root = MiniDom.parse("<ul><li>one<li>two<li>three</ul></div>")
    val ul = root.children.head
    assert(ul.tag == "ul")
    assert(ul.children.count(_.tag == "li") == 3)
    assert(ul.children.map(_.innerText) == Seq("one", "two", "three"))
  }

  // ---- MiniXPath --------------------------------------------------------

  val doc = MiniDom.parse(
    """<html><body>
      |<div class="news extra"><ul class="list">
      |  <li><a href="/a/0.html">Zero</a><span class="d">2024-01-01 10:00</span></li>
      |  <li><a href="/a/1.html">One</a><span class="d">2024-01-02 10:00</span></li>
      |  <li><a href="/a/2.html">Two</a></li>
      |</ul></div>
      |<div id="content"><p>P1</p><p>P2</p></div>
      |<div class="meta">2024-03-04 05:06 作者：Alice</div>
      |</body></html>""".stripMargin)

  test("xpath: descendant, child, attr predicates, position, last()") {
    assert(MiniXPath.selectNodes(doc, "//li").size == 3)
    assert(MiniXPath.selectNodes(doc, "//ul[@class='list']/li/a").size == 3)
    assert(MiniXPath.selectSingle(doc, "//li[2]/a").get.attr("href")
      .contains("/a/1.html"))
    assert(MiniXPath.selectSingle(doc, "//li[last()]/a").get.attr("href")
      .contains("/a/2.html"))
    assert(MiniXPath.selectSingle(doc, "//div[@id='content']").get
      .innerText == "P1P2")
    assert(MiniXPath.selectNodes(doc, "//div[contains(@class,'news')]").size == 1)
    assert(MiniXPath.selectNodes(doc, "//span[@class]").size == 2)
    assert(MiniXPath.selectNodes(doc, "//*[@id='content']").size == 1)
    assert(MiniXPath.selectNodes(doc, "//div/ul/li").size == 3)
    assert(MiniXPath.selectNodes(doc, "/html/body/div").size == 3)
    // relative select from a context node
    val li2 = MiniXPath.selectNodes(doc, "//li")(1)
    assert(MiniXPath.selectSingle(li2, "./span").get.innerText
      == "2024-01-02 10:00")
  }

  test("xpath: unsupported syntax fails loudly at compile") {
    intercept[IllegalArgumentException](MiniXPath.compile("//a/@href"))
    intercept[IllegalArgumentException](MiniXPath.compile("//a/text()"))
    intercept[IllegalArgumentException](MiniXPath.compile("//a[position()<3]"))
  }

  // ---- XPath catalog rules (both modes) --------------------------------

  val listHtml =
    """<html><body><nav><a href="/x.html">Short</a></nav>
      |<ul class="list">
      |<li><a href="/a/0.html">Story number zero</a><span>2024-01-01 10:00</span></li>
      |<li><a href="/a/1.html">Story number one</a><span>2024-01-02 10:00</span></li>
      |<li><a href="/a/2.html">Story number two</a><span>2024-01-03 10:00</span></li>
      |</ul></body></html>""".stripMargin

  test("xpath catalog, link-iteration mode: container/[*] split, href + dates") {
    val rule = CatalogRule("XPath", "//ul[@class='list']/li[*]/a")
    val items = RuleEngine.detect(listHtml, "http://h.example.com/", rule)
    assert(items.map(_.url) == Vector(
      "http://h.example.com/a/0.html", "http://h.example.com/a/1.html",
      "http://h.example.com/a/2.html"))
    assert(items.map(_.title) == Vector("Story number zero",
      "Story number one", "Story number two"))
    assert(items.forall(_.published.isDefined))
    assert(items(1).published.get.toString.startsWith("2024-01-02T10:00"))
  }

  test("xpath catalog: undated head/tail trimming (W4) and short-text trim") {
    val soup =
      """<ul class="list">
        |<li><a href="/a/head.html">Section header undated</a></li>
        |<li><a href="/a/1.html">Story number one</a> 2024-01-01 10:00</li>
        |<li><a href="/a/2.html">Story number two</a> 2024-01-02 10:00</li>
        |<li><a href="/a/3.html">Story number three</a> 2024-01-03 10:00</li>
        |<li><a href="/a/4.html">Story number four</a> 2024-01-04 10:00</li>
        |<li><a href="/a/5.html">Story number five</a> 2024-01-05 10:00</li>
        |<li><a href="/a/more.html">More undated tail</a></li>
        |</ul>""".stripMargin
    val rule = CatalogRule("XPath", "//ul/li[*]/a")
    val items = RuleEngine.detect(soup, "http://h.example.com/", rule)
    // >=5 dated items → undated head and tail rows are trimmed
    assert(items.map(_.url) == (1 to 5).map(j =>
      s"http://h.example.com/a/$j.html").toVector)
    // validateDate=false keeps them
    val keep = RuleEngine.detect(soup, "http://h.example.com/",
      rule.copy(validateDate = false))
    assert(keep.size == 7)
  }

  test("xpath catalog, root mode: per-root field paths; url is node text") {
    val html =
      """<div class="item"><span class="u">http://h.example.com/a/0.html</span>
        |<b>Title zero</b><i>2024-01-01 10:00</i></div>
        |<div class="item"><span class="u">http://h.example.com/a/1.html</span>
        |<b>Title one</b><i>2024-01-02 10:00</i></div>""".stripMargin
    val rule = CatalogRule("XPath", "", urlField = ".//span[@class='u']",
      titleField = ".//b", dateField = ".//i",
      rootExp = Some("//div[@class='item']"))
    val items = RuleEngine.detect(html, "http://h.example.com/", rule)
    assert(items.map(_.url) == Vector("http://h.example.com/a/0.html",
      "http://h.example.com/a/1.html"))
    assert(items.map(_.title) == Vector("Title zero", "Title one"))
    assert(items.forall(_.published.isDefined))
  }

  // ---- article-stage rule overrides -------------------------------------

  val artHtml =
    """<html><head><title>Page title tag</title></head><body>
      |<h1>Rule headline</h1>
      |<div class="meta">2024-03-04 05:06 作者：Alice</div>
      |<div class="article"><p>First paragraph of the body text here.</p>
      |<p>Second paragraph of the body text here.</p></div>
      |</body></html>""".stripMargin

  test("article XPath overrides: title/date/author/content from rule nodes") {
    val rule = CatalogRule("XPath", "//ul/li[*]/a",
      artTitleExp = Some("//h1"),
      artDateExp = Some("//div[@class='meta']"),
      artAuthorExp = Some("//div[@class='meta']"),
      artContentExp = Some("//div[@class='article']"))
    val d = RuleEngine.parseArticle(artHtml, Some(rule))
    assert(d.title == "Rule headline")
    assert(d.published.get.toString.startsWith("2024-03-04T05:06"))
    assert(d.author.exists(_.contains("Alice")))
    assert(d.content.contains("First paragraph"))
    assert(d.content.contains("Second paragraph"))
    assert(!d.content.contains("headline"))
  }

  test("article rule with no art exps leaves the auto draft untouched") {
    val auto = ArticleExtractor.extract(artHtml)
    val d = RuleEngine.parseArticle(artHtml,
      Some(CatalogRule("XPath", "//ul/li[*]/a")))
    assert(d == auto)
  }

  test("article Regex rule overrides date and author only") {
    val rule = CatalogRule("Regex", "",
      artDateExp = Some("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}"""),
      artAuthorExp = Some("""作者：\w+"""))
    val auto = ArticleExtractor.extract(artHtml)
    val d = RuleEngine.parseArticle(artHtml, Some(rule))
    assert(d.content == auto.content && d.title == auto.title)
    assert(d.published.get.toString.startsWith("2024-03-04T05:06"))
    assert(d.author.isDefined)
  }

  test("article JPath rule replaces all fields; HTML page falls back to auto") {
    val rule = CatalogRule("JPath", "$.items[*]",
      artTitleExp = Some("$.title"), artDateExp = Some("$.date"),
      artAuthorExp = Some("$.author"), artContentExp = Some("$.body"))
    val json =
      """{"title": "J title", "date": "2024-05-06 07:08",
        |"author": "Bob", "body": "<p>Json body text</p>"}""".stripMargin
    val d = RuleEngine.parseArticle(json, Some(rule))
    assert(d.title == "J title")
    assert(d.published.get.toString.startsWith("2024-05-06T07:08"))
    assert(d.author.contains("Bob"))
    assert(d.content == "Json body text")
    // HTML content can't parse as JSON → auto draft fallback
    val fb = RuleEngine.parseArticle(artHtml, Some(rule))
    assert(fb == ArticleExtractor.extract(artHtml))
  }
}
