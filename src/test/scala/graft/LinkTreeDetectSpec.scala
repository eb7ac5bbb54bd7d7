package graft

import graft.core.CatalogDetect
import org.scalatest.funsuite.AnyFunSuite

/** Adversarial-page evidence for the DOM link-tree analyzer — the page
  * shapes the reference's RemoveNoiseBranches machinery exists for
  * (HtmlAnalyzer.cs:480-609), beyond the cooperative FixtureGen lists:
  * multi-column table rows with a noise column, duplicate-url columns,
  * and pagination tails. */
class LinkTreeDetectSpec extends AnyFunSuite {

  val base = "http://t.example.com/"

  test("table rows: noise comment-link column is removed, headline column kept") {
    val rows = (1 to 5).map(i =>
      s"""<tr><td><a href="/a/$i.html">Real headline number $i here</a></td>""" +
        s"""<td><a href="/c/$i.html">cmt</a></td>""" +
        s"""<td>2024-01-0$i 10:00</td></tr>""").mkString
    val html = s"<html><body><table>$rows</table></body></html>"
    val items = CatalogDetect.detect(html, base)
    assert(items.map(_.url) == (1 to 5)
      .map(i => s"http://t.example.com/a/$i.html").toVector,
      items.map(_.url))
    assert(items.forall(_.published.isDefined))
    assert(items.map(_.title) ==
      (1 to 5).map(i => s"Real headline number $i here").toVector)
  }

  test("duplicate-url columns: one primary link column survives per row") {
    // every row links the same article twice (gallery link + long-form
    // link); the analyzer keeps ONE column and each url appears once
    val rows = (1 to 5).map(i =>
      s"""<li><a href="/a/$i.html">Gallery view headline $i</a>""" +
        s"""<a href="/a/$i.html">Full headline text number $i of the story</a>""" +
        s""" 2024-02-0$i 09:00</li>""").mkString
    val html = s"<html><body><ul>$rows</ul></body></html>"
    val items = CatalogDetect.detect(html, base)
    assert(items.map(_.url) == (1 to 5)
      .map(i => s"http://t.example.com/a/$i.html").toVector)
    // exactly one title per url (no doubled rows)
    assert(items.size == 5)
    assert(items.forall(_.published.isDefined))
  }

  test("pagination tail: short-text pager links are trimmed from the list") {
    val arts = (1 to 6).map(i =>
      s"""<li><a href="/a/$i.html">Story headline number $i</a> 2024-03-0$i</li>""").mkString
    val pager =
      """<li><a href="?p=1">1</a><a href="?p=2">2</a><a href="?p=3">3</a></li>"""
    val html = s"<html><body><ul>$arts$pager</ul></body></html>"
    val items = CatalogDetect.detect(html, base)
    assert(items.map(_.url) == (1 to 6)
      .map(i => s"http://t.example.com/a/$i.html").toVector,
      items.map(_.url))
  }

  test("two structurally identical lists: the dated one is adopted whole") {
    val dated = (1 to 5).map(i =>
      s"""<li><a href="/d/$i.html">Dated story headline $i</a> 2024-04-0$i</li>""").mkString
    val related = (1 to 4).map(i =>
      s"""<li><a href="/r/$i.html">Related undated link number $i</a></li>""").mkString
    val html =
      s"""<html><body><div><ul>$dated</ul></div><div><ul>$related</ul></div></body></html>"""
    val items = CatalogDetect.detect(html, base)
    assert(items.nonEmpty)
    assert(items.map(_.url).forall(_.contains("/d/")), items.map(_.url))
  }
}
