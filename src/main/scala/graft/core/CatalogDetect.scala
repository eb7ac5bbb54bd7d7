package graft.core

import java.time.LocalDateTime
import java.util.Locale
import java.util.regex.Pattern

/** One detected catalog (listing-page) item. ≈ the reference's
  * `CatalogItem` (Analyzers/HtmlAnalyzer.cs:715-740) as produced by
  * `HtmlAnalyzer.DetectCatalogItems` (Analyzers/HtmlAnalyzer.cs:35-97).
  * `publishedRaw` carries a date/time string that did not parse to a
  * full date (e.g. year-less or time-only — HtmlAnalyzer.cs:727-730);
  * [[hasDate]] mirrors the reference's `CatalogItem.HasDate`
  * (HtmlAnalyzer.cs:732-738), which gates newest-first scheduling. */
final case class CatalogItem(
    url: String,
    title: String,
    published: Option[LocalDateTime],
    publishedRaw: Option[String] = None) {
  def hasDate: Boolean = published.isDefined || publishedRaw.isDefined
}

/** Catalog (article-list) auto-detection over raw HTML: the engine-facing
  * envelope around the DOM link-tree analyzer ([[LinkTreeDetect]] — the
  * faithful port of Analyzers/HtmlAnalyzer.cs:239-656 over [[MiniDom]]):
  *
  *  1. honor `<base href>` (Common/HtmlHelper.cs:56-63);
  *  2. [[LinkTreeDetect.detectWithPath]] picks the winning link block
  *     (similar-link grouping → link trees → noise-branch/column
  *     removal → all-dated-first block ranking);
  *  3. drop invalid links (fragment/javascript — HtmlAnalyzer.cs:28-31),
  *     resolve + canonicalize every URL (north rule: the frontier is
  *     keyed by canonical urls), and dedup keeping the first non-empty
  *     title (HtmlAnalyzer.cs:328-334) — canonicalization also unifies
  *     messy variants (`HTTP://X:80/a` vs `/a`) the reference's raw-url
  *     dedup would keep apart.
  *
  * Pure Scala, zero Spark deps — shared verbatim by the distributed
  * pipeline and the sequential test oracle.
  */
object CatalogDetect {

  val MinLinks = 3       // Constants.cs:8  (RULE_CATALOG_LIST_MIN_LINKCOUNT)
  val MinTextLen = 10    // Constants.cs:9-11 (min/avg link text length)

  private val basePat = Pattern.compile(
    "(?is)<base\\b[^>]*?href\\s*=\\s*(\"([^\"]*)\"|'([^']*)')")

  private def effectiveBase(html: String, baseUrl: String): String = {
    val m = basePat.matcher(html)
    if (m.find()) {
      val b = Option(m.group(2)).orElse(Option(m.group(3))).getOrElse(baseUrl)
      // a relative <base href> ("/en/", "//cdn.example.com/") must
      // itself be absolutized against the page URL (HtmlHelper.cs:42-55)
      // — used verbatim it would leave every relative link unresolved
      // and the host would silently yield zero fetchable items
      UrlCanon.resolve(baseUrl, b)
    } else baseUrl
  }

  private def isValidLink(href: String): Boolean =
    href.nonEmpty && !href.startsWith("#") &&
      !href.toLowerCase(Locale.ROOT).startsWith("javascript")

  private[core] def canonDedup(raw: Seq[LinkTreeDetect.RawItem],
      base: String): Vector[CatalogItem] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, CatalogItem]
    raw.filter(r => isValidLink(r.url)).foreach { r =>
      val u = UrlCanon.canonicalize(UrlCanon.resolve(base, r.url))
      val item = CatalogItem(u, r.title, r.published, r.publishedRaw)
      seen.get(u) match {
        case None => seen.put(u, item)
        case Some(prev) if prev.title.isEmpty && r.title.nonEmpty =>
          seen.put(u, item)
        case _ =>
      }
    }
    seen.values.toVector
  }

  /** Auto-detect the article list of a catalog page. `baseUrl` is the
    * page's own URL (for relative-href resolution). */
  def detect(html: String, baseUrl: String): Vector[CatalogItem] = {
    if (html == null || html.isEmpty) return Vector.empty
    val (items, _) = LinkTreeDetect.detectWithPath(html)
    canonDedup(items, effectiveBase(html, baseUrl))
  }

  /** Rule-editor assist (U12, DetectListPath — Analyzers/
    * HtmlAnalyzer.cs:99-153): the winning block's iteration XPath,
    * e.g. `/html[1]/body[1]/ul[1]/li[*]/a[1]` — directly usable as a
    * rule's ContentUrlExp / RuleSpec.item_exp. */
  def detectListPath(html: String): Option[String] =
    if (html == null || html.isEmpty) None
    else LinkTreeDetect.detectWithPath(html)._2
}
