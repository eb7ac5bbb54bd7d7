package graft.core

import java.util.regex.Pattern

/** Rule-driven catalog/article extraction — the engine's form of the
  * reference's per-host rule table (`atc_websiterules`,
  * /root/reference/Source/MySQLSchema.sql:44-61; dispatcher
  * Analyzers/HtmlAnalyzer.cs:35-97).
  *
  * The reference's rule kinds and our mapping:
  *  - XPath rules (the reference default) → [[MiniDom]] +
  *    [[MiniXPath]] subset, both catalog modes:
  *    link-iteration (`itemExp` like `//ul/li[*]/a`, split at the last
  *    `[*]` into container + relative link path — Block.ContainerPath /
  *    RelativeLinkXPath, HtmlAnalyzer.cs:666-720) and root mode
  *    (`rootExp` + per-item field paths, HtmlAnalyzer.cs:618-644).
  *  - JSONPath rules (JObject.SelectTokens over a TrimJsonP'd feed,
  *    HtmlAnalyzer.cs JPath branch) → [[MiniJson.select]] subset.
  *  - Regex rules (NotImplemented at catalog stage in the reference,
  *    HtmlAnalyzer.cs:93-96) → implemented here with named groups —
  *    a strict capability superset.
  *  - Page-URL revise (S4/U13: `Regex.Replace(pageUrl, exp, replacement,
  *    IgnoreCase)`, Common/HtmlHelper.cs:152) → [[revisePageUrl]].
  *  - Article-stage overrides (ParseArticle, HtmlAnalyzer.cs:155-235)
  *    → [[parseArticle]]: XPath overrides any of title/date/author/
  *    content; JPath REPLACES the whole article; Regex overrides
  *    date/author only — the reference's switch, with one DOCUMENTED
  *    deviation: when an XPath override expression matches NO node we
  *    keep the auto-extracted value, where the reference overwrites
  *    the field with an empty string (HtmlAnalyzer.cs:168-184). The
  *    lenient choice degrades gracefully on site redesigns at the cost
  *    of masking a stale rule; flip by removing the orElse/getOrElse
  *    fallbacks in the XPath branch.
  */
final case class CatalogRule(
    matchType: String,                    // "XPath" | "Regex" | "JPath"
    itemExp: String,                      // XPath link path | Regex w/ groups | JPath to item nodes
    urlField: String = "url",             // JPath field names — or XPath field paths in root mode
    titleField: String = "title",
    dateField: String = "date",
    rootExp: Option[String] = None,       // XPath root mode (ContentRootExp)
    artTitleExp: Option[String] = None,   // article-stage overrides
    artDateExp: Option[String] = None,
    artAuthorExp: Option[String] = None,
    artContentExp: Option[String] = None,
    validateDate: Boolean = true,         // Website.ValidateDate
    pageUrlRevise: Option[(String, String)] = None, // (exp, replacement)
    itemUrlRevise: Option[(String, String)] = None)

object RuleEngine {

  // Constants.cs:9,11
  val MinLinkTextLenSafe = 5
  val MinLinkCountDated = 5

  /** S4/U13: regex-rewrite of the catalog page URL before fetch
    * (AJAX-feed sites), case-insensitive like the reference. */
  def revisePageUrl(pageUrl: String, rule: CatalogRule): String =
    rule.pageUrlRevise match {
      case Some((exp, rep)) =>
        Pattern.compile(exp, Pattern.CASE_INSENSITIVE)
          .matcher(pageUrl).replaceAll(rep)
      case None => pageUrl
    }

  private def reviseItemUrl(url: String, rule: CatalogRule): String =
    rule.itemUrlRevise match {
      case Some((exp, rep)) =>
        Pattern.compile(exp, Pattern.CASE_INSENSITIVE)
          .matcher(url).replaceAll(rep)
      case None => url
    }

  /** Extract catalog items from page content using a rule; item URLs
    * are revise-rewritten, resolved against the page URL and
    * canonicalized, then deduped keeping the first non-empty title
    * (mirroring the auto path, HtmlAnalyzer.cs:328-334). */
  def detect(content: String, pageUrl: String, rule: CatalogRule): Vector[CatalogItem] = {
    if (content == null || content.isEmpty) return Vector.empty
    // Reference fallback (HtmlAnalyzer.cs:45-48): ONLY the XPath branch
    // auto-detects when the catalog item expression is EMPTY — e.g. a
    // rule that only sets article-stage overrides; treating "" as a
    // literal (empty) path would leave the host's catalog permanently
    // empty. XPath root mode is exempt: there the containers come from
    // rootExp and itemExp is legitimately unused. JPath runs its select
    // regardless (HtmlAnalyzer.cs:84-91 — an empty path over the JSON
    // doc yields nothing), and the reference's Regex branch is
    // NotImplementedException (cs:92-93; ours is a documented
    // extension) — neither ever falls back to HTML auto-detection.
    val itemExpEmpty = rule.itemExp == null || rule.itemExp.isEmpty
    if (rule.matchType == "XPath" && itemExpEmpty &&
        !rule.rootExp.exists(_.nonEmpty))
      return CatalogDetect.detect(content, pageUrl)
    // A null/empty item expression outside the XPath fallback yields
    // NOTHING (never a crash, never a spurious root item): a Regex rule
    // has no pattern to run, and the reference's empty JPath select
    // over the JSON doc matches no items (MiniJson.select would return
    // the document ROOT for an empty path — that is a path-syntax
    // artifact, not a catalog item).
    if (itemExpEmpty && rule.matchType != "XPath") return Vector.empty
    val raw: Vector[(String, String, Option[String])] = rule.matchType match {
      case "XPath" => return xpathCatalog(content, pageUrl, rule)
      case "Regex" =>
        val p = Pattern.compile(rule.itemExp,
          Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
        val m = p.matcher(content)
        val b = Vector.newBuilder[(String, String, Option[String])]
        def grp(name: String): Option[String] =
          try Option(m.group(name)) catch { case _: Exception => None }
        while (m.find()) {
          grp("url").foreach { u =>
            b += ((u, grp("title").getOrElse(""), grp("date")))
          }
        }
        b.result()
      case "JPath" =>
        val json = MiniJson.parseOpt(TextNormalize.trimJsonP(content.trim))
        json.map { root =>
          MiniJson.select(root, rule.itemExp).collect {
            case m: Map[_, _] =>
              val mm = m.asInstanceOf[Map[String, Any]]
              def f(k: String) = mm.get(k).collect { case s: String => s }
              f(rule.urlField).map { u =>
                (u, f(rule.titleField).getOrElse(""), f(rule.dateField))
              }
          }.flatten
        }.getOrElse(Vector.empty)
      case other =>
        throw new IllegalArgumentException(s"unknown rule matchType: $other")
    }
    canonDedup(raw.map { case (u, t, d) =>
      // find-based parse (Html2Article.GetPublishDate): rule-supplied
      // date strings are routinely decorated ("2024-06-01T08:30:00",
      // "发布于 2024-06-01") — the strict whole-string parse would
      // drop the date the reference extracts
      (u, t, d.flatMap(ArticleExtractor.getPublishDate), None)
    }, pageUrl, rule)
  }

  /** Shared tail: revise + resolve + canonicalize item URLs, dedup
    * keeping the first non-empty title. */
  private def canonDedup(
      raw: Vector[(String, String, Option[java.time.LocalDateTime], Option[String])],
      pageUrl: String, rule: CatalogRule): Vector[CatalogItem] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, CatalogItem]
    raw.foreach { case (u0, title, date, dateRaw) =>
      val u = UrlCanon.canonicalize(
        UrlCanon.resolve(pageUrl, reviseItemUrl(u0, rule)))
      val item = CatalogItem(u, title, date, dateRaw)
      seen.get(u) match {
        case None => seen.put(u, item)
        case Some(prev) if prev.title.isEmpty && title.nonEmpty =>
          seen.put(u, item)
        case _ =>
      }
    }
    seen.values.toVector
  }

  /** XPath catalog extraction, both reference modes
    * (HtmlAnalyzer.cs:74-83):
    *  - rootExp set → per-root field paths; the reference quirk that
    *    the URL is the url-node's InnerText (not an href) is kept
    *    (HtmlAnalyzer.cs:618-644);
    *  - else itemExp is the link path: split at the LAST `[*]` into
    *    container + relative link, read href + link text per container,
    *    parse the date from the container's full text, then the
    *    reference's noise trimming: drop untitled duplicates, trim
    *    undated head/tail runs when ≥5 items are dated (W4,
    *    HtmlAnalyzer.cs:284-366), trim short-text head/tail links. */
  private def xpathCatalog(content: String, pageUrl: String,
      rule: CatalogRule): Vector[CatalogItem] = {
    val doc = MiniDom.parse(content)
    rule.rootExp match {
      case Some(rootExp) =>
        val raw = MiniXPath.selectNodes(doc, rootExp).map { root =>
          def txt(exp: String): Option[String] =
            if (exp == null || exp.isEmpty) None
            else MiniXPath.selectSingle(root, exp).map(_.innerText)
          val url = txt(rule.urlField).getOrElse("")
          val title = TextNormalize.normalizeText(
            txt(rule.titleField).getOrElse(""))
          // GetPublishDate FINDS a date in the node text (HtmlAnalyzer.cs:640);
          // root mode sets Published only — no PublishedRaw (cs:633-640)
          val date = txt(rule.dateField).flatMap(ArticleExtractor.getPublishDate)
          (url, title, date, None)
        }.filter(_._1.nonEmpty)
        canonDedup(raw, pageUrl, rule)
      case None =>
        // Block.ContainerPath / RelativeLinkXPath split
        // (HtmlAnalyzer.cs:687-720) — SHARED with the auto path:
        // LinkTreeDetect.itemsFromLinkPath IS the rule link-path
        // semantics (container/[*] split, titled-first dedup, W4
        // dated-run trim, short-text trim). One copy, one set of
        // reference quirks.
        val items = LinkTreeDetect.itemsFromLinkPath(doc, rule.itemExp,
          rule.validateDate)
        canonDedup(items.map(r => (r.url, r.title, r.published, r.publishedRaw)),
          pageUrl, rule)
    }
  }

  /** Article-stage extraction: auto density extraction first, then the
    * rule's per-field overrides (ParseArticle, HtmlAnalyzer.cs:155-235).
    * Overridden fields get NormalizeText like the reference's final
    * normalization pass; untouched fields keep the extractor's bytes.
    *
    * Leniency deviations from the reference (documented): a rule with
    * NO art_*_exp columns skips the override switch entirely (the
    * reference would still JSON-parse a JPath host's article page and
    * fail on HTML); a JPath article page that fails to parse falls back
    * to the auto draft instead of failing the fetch. */
  def parseArticle(content: String, rule: Option[CatalogRule]): ArticleDetails = {
    val auto = ArticleExtractor.extract(content)
    rule match {
      case None => auto
      case Some(r) if r.artTitleExp.isEmpty && r.artDateExp.isEmpty &&
        r.artAuthorExp.isEmpty && r.artContentExp.isEmpty => auto
      case Some(r) => r.matchType match {
        case "XPath" =>
          val doc = MiniDom.parse(content)
          def txt(exp: Option[String]): Option[String] =
            exp.filter(_.nonEmpty)
              .flatMap(e => MiniXPath.selectSingle(doc, e)).map(_.innerText)
          // content node selected ONCE; with-tags is the node's
          // innerHtml (reference assigns InnerHtml, HtmlAnalyzer.cs:183
          // — innerText here silently stripped every tag from the
          // stored contenthtml of rule-extracted articles)
          val contentNode = r.artContentExp.filter(_.nonEmpty)
            .flatMap(e => MiniXPath.selectSingle(doc, e))
          auto.copy(
            title = txt(r.artTitleExp)
              .map(TextNormalize.normalizeText).getOrElse(auto.title),
            published = txt(r.artDateExp)
              .flatMap(ArticleExtractor.getPublishDate).orElse(auto.published),
            author = txt(r.artAuthorExp)
              .map(TextNormalize.normalizeText).orElse(auto.author),
            content = contentNode.map(n => TextNormalize.normalizeText(n.innerText))
              .getOrElse(auto.content),
            // the reference passes rule-extracted ContentWithTags
            // through NormalizeHtml (trim + whitespace collapse) at the
            // end of DetectArticle (HtmlAnalyzer.cs:234)
            contentWithTags = contentNode
              .map(n => TextNormalize.normalizeHtml(n.innerHtml))
              .getOrElse(auto.contentWithTags))
        case "JPath" =>
          // full replacement from the JSON article document
          // (HtmlAnalyzer.cs:187-204); unparseable JSON → auto draft
          MiniJson.parseOpt(TextNormalize.trimJsonP(content.trim)) match {
            case None => auto
            case Some(root) =>
              def tok(exp: Option[String]): Option[String] =
                for {
                  e <- exp.filter(_.nonEmpty)
                  v <- MiniJson.select(root, e).headOption
                } yield v match {
                  case s: String => s
                  case other => String.valueOf(other)
                }
              val rawContent = tok(r.artContentExp)
              ArticleDetails(
                title = TextNormalize.normalizeText(tok(r.artTitleExp).getOrElse("")),
                content = TextNormalize.normalizeText(
                  rawContent.map(TextNormalize.trimHtmlTags).getOrElse("")),
                // NormalizeHtml applies to the JPath path too — the
                // reference's tail normalization (HtmlAnalyzer.cs:234)
                // runs on every rule-built article
                contentWithTags = TextNormalize.normalizeHtml(
                  rawContent.getOrElse("")),
                // find-based (GetPublishDate, HtmlAnalyzer.cs:200):
                // ISO-8601 JSON timestamps etc. carry the date inside
                // a longer token the strict parse rejects
                published = tok(r.artDateExp).flatMap(ArticleExtractor.getPublishDate),
                author = tok(r.artAuthorExp).map(TextNormalize.normalizeText))
          }
        case "Regex" =>
          // date/author overrides only (HtmlAnalyzer.cs:205-228)
          def m1(exp: Option[String], flags: Int): Option[String] =
            exp.filter(_.nonEmpty).flatMap { e =>
              val m = Pattern.compile(e, flags).matcher(content)
              if (m.find()) Some(m.group()) else None
            }
          val date = m1(r.artDateExp, Pattern.CASE_INSENSITIVE)
            .flatMap(ArticleExtractor.parseDate)
          val author = m1(r.artAuthorExp,
            Pattern.CASE_INSENSITIVE | Pattern.DOTALL).map { v =>
            ArticleExtractor.getAuthor(v)
              .getOrElse(TextNormalize.normalizeText(TextNormalize.trimHtmlTags(v)))
          }
          auto.copy(
            published = date.orElse(auto.published),
            author = author.orElse(auto.author))
        case other =>
          throw new IllegalArgumentException(s"unknown rule matchType: $other")
      }
    }
  }
}
