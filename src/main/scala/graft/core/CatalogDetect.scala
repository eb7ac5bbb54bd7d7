package graft.core

import java.time.LocalDateTime
import java.util.Locale
import java.util.regex.Pattern

/** One detected catalog (listing-page) item. ≈ the reference's
  * `CatalogItem` (/root/reference/Source/WebCrawler/Models/CatalogItem.cs)
  * as produced by `HtmlAnalyzer.DetectCatalogItems`
  * (Analyzers/HtmlAnalyzer.cs:35-97). */
final case class CatalogItem(
    url: String,
    title: String,
    published: Option[LocalDateTime])

/** Catalog (article-list) detection over raw HTML — a Spark-first
  * redesign of the reference's link-tree / text-density auto-detector
  * (Analyzers/HtmlAnalyzer.cs:239-656). The reference walks an
  * HtmlAgilityPack DOM and groups anchors by index-stripped XPath; we
  * have no DOM library in this environment, so the same grouping signal
  * is recovered from a linear tag scan:
  *
  *  1. scan all tags once, tracking open noise sections
  *     (header/footer/aside/nav/abbr — the reference's noise-area regex,
  *     Analyzers/HtmlAnalyzer.cs:370,375) and collecting anchors with
  *     their inner text and the inter-anchor trailing text (where list
  *     pages put their dates);
  *  2. drop invalid links: null/fragment/javascript hrefs
  *     (Analyzers/HtmlAnalyzer.cs:28-31);
  *  3. group by URL template — the link path with digit runs replaced
  *     by a placeholder — the analog of stripping `[n]` indices from
  *     XPaths (Analyzers/HtmlAnalyzer.cs:368-372);
  *  4. keep groups with ≥ MIN_LINKS links and max link-text length
  *     ≥ MIN_TEXT_LEN (thresholds from Constants.cs:8-11);
  *  5. rank groups all-dated-first then by score = count·avg-text-len
  *     (the reference's block ordering, Analyzers/HtmlAnalyzer.cs:68-73)
  *     and emit the winner's items, deduped by URL keeping the first
  *     non-empty title (Analyzers/HtmlAnalyzer.cs:328-334).
  *
  * Pure Scala, zero Spark deps — shared verbatim by the distributed
  * pipeline and the sequential test oracle.
  */
object CatalogDetect {

  val MinLinks = 3       // Constants.cs:8  (RULE_CATALOG_LIST_MIN_LINKCOUNT)
  val MinTextLen = 10    // Constants.cs:9-11 (min/avg link text length)

  private val noiseTag =
    Pattern.compile("(?i)^(header|footer|aside|nav|abbr)$")
  private val anchorOpen = Pattern.compile(
    "(?is)<a\\b[^>]*?href\\s*=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+))[^>]*>")
  private val tagPat = Pattern.compile("(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*>")

  private final case class Anchor(
      href: String, text: String, var trail: String, noisy: Boolean)

  /** Linear scan: anchors + trailing text + noise-section tracking. */
  private def scanAnchors(html: String, baseUrl: String): Vector[Anchor] = {
    val out = Vector.newBuilder[Anchor]
    val m = tagPat.matcher(html)
    var noiseDepth = 0
    var lastAnchor: Anchor = null
    var lastEnd = 0
    var pendingTrail = new java.lang.StringBuilder
    while (m.find()) {
      if (lastAnchor != null) {
        pendingTrail.append(html, lastEnd, m.start())
      }
      lastEnd = m.end()
      val closing = m.group(1) == "/"
      val name = m.group(2).toLowerCase(Locale.ROOT)
      if (noiseTag.matcher(name).matches()) {
        if (closing) noiseDepth = math.max(0, noiseDepth - 1)
        else noiseDepth += 1
      } else if (name == "a" && !closing) {
        // flush previous anchor's trail
        if (lastAnchor != null) {
          lastAnchor.trail = TextNormalize.normalizeText(
            TextNormalize.trimHtmlTags(pendingTrail.toString))
          pendingTrail = new java.lang.StringBuilder
        }
        val am = anchorOpen.matcher(html)
        if (am.find(m.start()) && am.start() == m.start()) {
          val rawHref = Option(am.group(2)).orElse(Option(am.group(3)))
            .orElse(Option(am.group(4))).getOrElse("")
          val close = html.indexOf("</a", am.end())
          val inner = if (close >= 0) html.substring(am.end(), close) else ""
          val a = Anchor(
            href = rawHref.trim,
            text = TextNormalize.trimHtmlTags(inner),
            trail = "",
            noisy = noiseDepth > 0)
          out += a
          lastAnchor = a
          lastEnd = if (close >= 0) close else am.end()
        } else lastAnchor = null
      }
    }
    if (lastAnchor != null) {
      pendingTrail.append(html, lastEnd, html.length)
      lastAnchor.trail = TextNormalize.normalizeText(
        TextNormalize.trimHtmlTags(pendingTrail.toString))
    }
    out.result()
  }

  private def isValidLink(href: String): Boolean =
    href.nonEmpty && !href.startsWith("#") &&
      !href.toLowerCase(Locale.ROOT).startsWith("javascript")

  private val digitRun = Pattern.compile("\\d+")

  /** URL template: scheme://host/path with digit runs → `\0d`. */
  private[core] def urlTemplate(url: String): String =
    digitRun.matcher(url).replaceAll("\u0000d")

  /** Rule-editor assist (U12, Analyzers/HtmlAnalyzer.cs:99-153): the
    * URL template of the page's winning link group — the engine's analog
    * of the reference's iteration-XPath suggestion (`…/li[*]/a`). */
  def detectListTemplate(html: String, baseUrl: String): Option[String] = {
    val items = detect(html, baseUrl)
    items.headOption.map(i => urlTemplate(i.url).replace("\u0000d", "{d}"))
  }

  /** Auto-detect the article list of a catalog page. `baseUrl` is the
    * page's own URL (for relative-href resolution, honoring the same
    * semantics as HtmlHelper.ResolveUrls, Common/HtmlHelper.cs:49-82). */
  def detect(html: String, baseUrl: String): Vector[CatalogItem] = {
    if (html == null || html.isEmpty) return Vector.empty
    // honor <base href=...> like the reference (Common/HtmlHelper.cs:56-63)
    val baseM = Pattern.compile(
      "(?is)<base\\b[^>]*?href\\s*=\\s*(\"([^\"]*)\"|'([^']*)')").matcher(html)
    val effBase =
      if (baseM.find())
        Option(baseM.group(2)).orElse(Option(baseM.group(3))).getOrElse(baseUrl)
      else baseUrl
    val anchors = scanAnchors(html, effBase)
      .filter(a => !a.noisy && isValidLink(a.href))
    if (anchors.isEmpty) return Vector.empty

    final case class Cand(item: CatalogItem, textLen: Int)
    val cands = anchors.map { a =>
      // north rule: canonicalization feeds the frontier — so catalog
      // items are emitted in canonical form (grouping then also unifies
      // messy variants of the same template)
      val abs = UrlCanon.canonicalize(UrlCanon.resolve(effBase, a.href))
      // date lives in the link's own text or the inter-anchor trail
      val published = ArticleExtractor.parseDate(a.text)
        .orElse(ArticleExtractor.parseDate(a.trail))
      Cand(CatalogItem(abs, a.text, published), a.text.length)
    }

    val groups = cands.groupBy(c => urlTemplate(c.item.url)).values.toVector
      .filter(g => g.size >= MinLinks && g.map(_.textLen).max >= MinTextLen)
    if (groups.isEmpty) return Vector.empty

    // all-dated groups first, then by count·avg-text-len, tie-break on
    // first URL for determinism
    def score(g: Vector[Cand]): Long =
      g.size.toLong * (g.map(_.textLen.toLong).sum / g.size)
    val best = groups.maxBy { g =>
      (g.forall(_.item.published.isDefined), score(g),
        g.head.item.url) match {
        case (dated, s, u) => ((if (dated) 1L else 0L), s, u)
      }
    }(Ordering.Tuple3(Ordering.Long, Ordering.Long, Ordering.String))

    // dedup by url, keep first candidate with a non-empty title
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, CatalogItem]
    best.foreach { c =>
      seen.get(c.item.url) match {
        case None => seen.put(c.item.url, c.item)
        case Some(prev) if prev.title.isEmpty && c.item.title.nonEmpty =>
          seen.put(c.item.url, c.item)
        case _ =>
      }
    }
    seen.values.toVector
  }
}
