package graft.core

import java.util.Locale
import java.util.regex.Pattern

import scala.collection.mutable.ArrayBuffer

/** One node of the lightweight HTML tree. `tag` is lowercase; text
  * nodes have `tag == ""` and carry `text`. Parent pointers exist so
  * XPath positional predicates can rank a node among its siblings. */
final class DomNode(
    val tag: String,
    val attrs: Map[String, String],
    val text: String,
    var parent: DomNode) {
  val children: ArrayBuffer[DomNode] = ArrayBuffer.empty
  def isText: Boolean = tag.isEmpty
  def attr(name: String): Option[String] = attrs.get(name.toLowerCase(Locale.ROOT))

  /** Concatenated descendant text (document order). Unlike
    * HtmlAgilityPack's InnerText we EXCLUDE script/style payloads —
    * rule expressions never target them and including them would leak
    * code into extracted fields. */
  def innerText: String = {
    val sb = new java.lang.StringBuilder
    def walk(n: DomNode): Unit = {
      if (n.isText) sb.append(n.text)
      else if (n.tag != "script" && n.tag != "style")
        n.children.foreach(walk)
    }
    walk(this)
    sb.toString
  }

  /** Serialized markup of the node's CHILDREN (≈ HtmlAgilityPack's
    * `InnerHtml`, which the reference stores as an article's
    * content-with-tags under an XPath content override,
    * HtmlAnalyzer.cs:183). MiniDom keeps no source offsets, so this is
    * re-serialized from the tree: tags lowercase, attributes
    * double-quoted in name order — structurally faithful, not
    * byte-identical to the input (documented deviation). Text nodes
    * hold RAW source text (entities are never decoded at parse time),
    * so emitting them verbatim IS source parity; attribute values are
    * re-quoted, so they escape `"`/`<` and any `&` that does not
    * already start an entity reference (see [[MiniDom.escapeAttr]]) —
    * otherwise the serialized form could re-parse differently. */
  def innerHtml: String = {
    val sb = new java.lang.StringBuilder
    def walk(n: DomNode): Unit = {
      if (n.isText) sb.append(n.text)
      else {
        sb.append('<').append(n.tag)
        n.attrs.toSeq.sortBy(_._1).foreach { case (k, v) =>
          sb.append(' ').append(k).append("=\"")
            .append(MiniDom.escapeAttr(v)).append('"')
        }
        if (n.children.isEmpty) sb.append("/>")
        else {
          sb.append('>')
          n.children.foreach(walk)
          sb.append("</").append(n.tag).append('>')
        }
      }
    }
    children.foreach(walk)
    sb.toString
  }
}

/** Minimal lenient HTML parser — just enough tree for the XPath rule
  * subset (graft.core.MiniXPath), in the spirit of [[MiniJson]]: zero
  * dependencies, tolerant of real-world tag soup. Replaces the
  * reference's HtmlAgilityPack dependency
  * (/root/reference/Source/WebCrawler/Analyzers/HtmlAnalyzer.cs:42-43)
  * for the rule-driven paths.
  *
  * Leniency rules:
  *  - void elements (br/img/meta/…) and `<x/>` never push the stack;
  *  - script/style/textarea bodies are raw text (no tag scanning);
  *  - `<li>` auto-closes an open `<li>` (same for p/td/th/tr/option/
  *    dd/dt) — the common unclosed-list-item soup;
  *  - a close tag pops to its nearest matching ancestor; unmatched
  *    close tags are dropped;
  *  - comments, doctype, CDATA and processing instructions are skipped.
  */
object MiniDom {

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "param", "source", "track", "wbr")
  private val rawTextTags = Set("script", "style", "textarea")
  // tags auto-closed when the same/sibling kind opens (li-soup handling)
  private val impliedClose: Map[String, Set[String]] = Map(
    "li" -> Set("li"), "p" -> Set("p"), "option" -> Set("option"),
    "dd" -> Set("dd", "dt"), "dt" -> Set("dd", "dt"),
    "td" -> Set("td", "th"), "th" -> Set("td", "th"),
    "tr" -> Set("tr", "td", "th"))

  private val tagPat = Pattern.compile(
    "(?s)<(?:(!--.*?--)|(!\\[CDATA\\[.*?]])|(![^>]*)|(\\?[^>]*)|(/?)([a-zA-Z][a-zA-Z0-9:-]*)((?:[^>\"']|\"[^\"]*\"|'[^']*')*?)(/?))>")

  // '&' NOT already starting an entity reference (named / decimal / hex).
  // Attribute values hold RAW source text, so '&amp;' in the source must
  // stay '&amp;' — blanket escaping would double-escape it.
  private val bareAmp = Pattern.compile(
    "&(?![a-zA-Z][a-zA-Z0-9]*;|#[0-9]+;|#[xX][0-9a-fA-F]+;)")

  /** Escape a raw-source attribute value for double-quoted
    * re-serialization: bare `&` → `&amp;` first (so inserted entities
    * below are not re-escaped), then `<` → `&lt;` (never legal raw in a
    * re-emitted value) and `"` → `&quot;` (the source may have
    * single-quoted it). */
  private[core] def escapeAttr(v: String): String =
    bareAmp.matcher(v).replaceAll("&amp;")
      .replace("<", "&lt;").replace("\"", "&quot;")
  private val attrPat = Pattern.compile(
    "([a-zA-Z_:][-a-zA-Z0-9_:.]*)\\s*(?:=\\s*(\"([^\"]*)\"|'([^']*)'|([^\\s>]+)))?")

  private def parseAttrs(s: String): Map[String, String] = {
    if (s == null || s.isEmpty) return Map.empty
    val m = attrPat.matcher(s)
    val b = Map.newBuilder[String, String]
    while (m.find()) {
      val name = m.group(1).toLowerCase(Locale.ROOT)
      val v = Option(m.group(3)).orElse(Option(m.group(4)))
        .orElse(Option(m.group(5))).getOrElse("")
      b += name -> v
    }
    b.result()
  }

  def parse(html: String): DomNode = {
    val root = new DomNode("#root", Map.empty, "", null)
    if (html == null || html.isEmpty) return root
    var cur = root
    // one lowercased copy, computed lazily on the first raw-text
    // element — NOT per script/style tag (a script-heavy page would
    // otherwise pay O(n) allocation dozens of times)
    var htmlLower: String = null
    def addText(s: String): Unit =
      if (s.nonEmpty) {
        val t = new DomNode("", Map.empty, s, cur)
        cur.children += t
      }
    val m = tagPat.matcher(html)
    var pos = 0
    while (m.find(pos)) {
      addText(html.substring(pos, m.start()))
      pos = m.end()
      if (m.group(6) != null) { // a real element tag
        val closing = m.group(5) == "/"
        val name = m.group(6).toLowerCase(Locale.ROOT)
        if (closing) {
          // pop to nearest matching ancestor; ignore unmatched closes
          var n = cur
          while (n != null && n.tag != name) n = n.parent
          if (n != null && (n ne root)) cur = n.parent
        } else {
          // HTML5: a '/' immediately ending an UNQUOTED attribute value
          // belongs to the value, not a self-close marker
          // (<a href=/news/123/> keeps the trailing slash and stays
          // open — treating it as self-closing orphans the anchor text
          // and changes the canonical URL)
          var attrsStr = m.group(7)
          var selfMark = m.group(8) == "/"
          if (selfMark && attrsStr != null &&
              attrsStr.matches("(?s).*=\\s*[^\\s>\"']*")) {
            attrsStr += "/"
            selfMark = false
          }
          val selfClose = selfMark || voidTags.contains(name)
          // implied closes (li-before-li etc.)
          impliedClose.get(name).foreach { closes =>
            if (!cur.eq(root) && closes.contains(cur.tag)) cur = cur.parent
          }
          val node = new DomNode(name, parseAttrs(attrsStr), "", cur)
          cur.children += node
          if (!selfClose) {
            if (rawTextTags.contains(name)) {
              // raw-text element: swallow everything to the close tag
              val closeTag = "</" + name
              if (htmlLower == null) htmlLower = html.toLowerCase(Locale.ROOT)
              val end = htmlLower.indexOf(closeTag, pos)
              val stop = if (end >= 0) end else html.length
              if (stop > pos)
                node.children += new DomNode("", Map.empty,
                  html.substring(pos, stop), node)
              val gt = html.indexOf('>', stop)
              pos = if (gt >= 0) gt + 1 else html.length
            } else cur = node
          }
        }
      } // comments/doctype/CDATA/PI: skipped
    }
    addText(html.substring(pos))
    root
  }
}
