package graft.core

import java.util.regex.Pattern

/** Rule-driven catalog/article extraction — the engine's form of the
  * reference's per-host rule table (`atc_websiterules`,
  * /root/reference/Source/MySQLSchema.sql:44-61; dispatcher
  * Analyzers/HtmlAnalyzer.cs:35-97).
  *
  * The reference's rule kinds and our mapping:
  *  - XPath rules → not reproduced literally (no DOM library here); the
  *    auto-detector (CatalogDetect) covers rule-less and XPath-auto
  *    hosts, and REGEX rules (below) cover the precise-selection need.
  *  - JSONPath rules (JObject.SelectTokens over a TrimJsonP'd feed,
  *    HtmlAnalyzer.cs JPath branch) → [[MiniJson.select]] subset.
  *  - Regex rules (NotImplemented in the reference,
  *    HtmlAnalyzer.cs:93-96) → implemented here with named groups —
  *    a strict capability superset.
  *  - Page-URL revise (S4/U13: `Regex.Replace(pageUrl, exp, replacement,
  *    IgnoreCase)`, Common/HtmlHelper.cs:152) → [[revisePageUrl]].
  */
final case class CatalogRule(
    matchType: String,                    // "Regex" | "JPath"
    itemExp: String,                      // Regex w/ groups, or JPath to item nodes
    urlField: String = "url",             // JPath: field names in each node
    titleField: String = "title",
    dateField: String = "date",
    pageUrlRevise: Option[(String, String)] = None, // (exp, replacement)
    itemUrlRevise: Option[(String, String)] = None)

object RuleEngine {

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

  /** Extract catalog items from page content using a rule. Regex rules
    * run named groups `url` (required), `title`, `date` over the raw
    * content; JPath rules parse (JsonP-unwrapped) JSON and select item
    * nodes. Item URLs are revise-rewritten, resolved against the page
    * URL and canonicalized, mirroring the auto-detect path. */
  def detect(content: String, pageUrl: String, rule: CatalogRule): Vector[CatalogItem] = {
    if (content == null || content.isEmpty) return Vector.empty
    val raw: Vector[(String, String, Option[String])] = rule.matchType match {
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
    // same dedup-keep-first-titled as the auto path (HtmlAnalyzer.cs:328-334)
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, CatalogItem]
    raw.foreach { case (u0, title, dateStr) =>
      val u = UrlCanon.canonicalize(
        UrlCanon.resolve(pageUrl, reviseItemUrl(u0, rule)))
      val item = CatalogItem(u, title,
        dateStr.flatMap(ArticleExtractor.parseDate))
      seen.get(u) match {
        case None => seen.put(u, item)
        case Some(prev) if prev.title.isEmpty && title.nonEmpty =>
          seen.put(u, item)
        case _ =>
      }
    }
    seen.values.toVector
  }
}
