package graft.core

import java.util.regex.Pattern

/** Whitespace/tag normalization — the byte-identical surface.
  *
  * Reference behavior (studied, re-implemented from scratch):
  *  - NormalizeText  — /root/reference/Source/WebCrawler/Common/HtmlHelper.cs:223-240
  *    collapse [\r\n\t ]+ to one space, trim {\r \n \t space U+00A0}
  *    from both ends, THEN entity-decode (order matters: a decoded
  *    `&nbsp;` survives as U+00A0).
  *  - NormalizeHtml  — HtmlHelper.cs:242-261 (trim ends first, then
  *    collapse; optional base64 data-image strip).
  *  - TrimHtmlTags   — HtmlHelper.cs:263-273.
  *
  * .NET-vs-JVM divergences handled here:
  *  - `String.Trim(chars)` trims an explicit char set — reproduced
  *    with trimChars.
  *  - .NET `string.Trim()` (used by the per-line trim in the article
  *    extractor) trims Unicode whitespace per Char.IsWhiteSpace —
  *    reproduced by netTrim (Zs/Zl/Zp + U+0009..U+000D + U+0085),
  *    which differs from Java's String.trim (<= U+0020) and
  *    String.strip (Character.isWhitespace excludes U+00A0).
  */
object TextNormalize {

  private val midWs = Pattern.compile("[\r\n\t ]+")
  private val base64Img =
    Pattern.compile("(?<=src=['\"])data:image/\\w+;base64,[^'\" ]*",
      Pattern.CASE_INSENSITIVE)
  private val anyTag =
    Pattern.compile("<[^<>]+>", Pattern.CASE_INSENSITIVE | Pattern.DOTALL)

  private val normalizeTrimChars: Array[Char] = Array('\r', '\n', '\t', ' ', ' ')

  def trimChars(s: String, chars: Array[Char]): String = {
    var start = 0
    var end = s.length
    while (start < end && chars.contains(s.charAt(start))) start += 1
    while (end > start && chars.contains(s.charAt(end - 1))) end -= 1
    if (start == 0 && end == s.length) s else s.substring(start, end)
  }

  /** .NET Char.IsWhiteSpace set. */
  def isNetWhiteSpace(c: Char): Boolean =
    (c >= '\u0009' && c <= '\u000d') || c == '\u0085' || {
      val t = Character.getType(c)
      t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
        t == Character.PARAGRAPH_SEPARATOR
    }

  /** Equivalent of .NET `string.Trim()`. */
  def netTrim(s: String): String = {
    var start = 0
    var end = s.length
    while (start < end && isNetWhiteSpace(s.charAt(start))) start += 1
    while (end > start && isNetWhiteSpace(s.charAt(end - 1))) end -= 1
    if (start == 0 && end == s.length) s else s.substring(start, end)
  }

  /** Collapse runs of {\r \n \t space} to one space; trim the char set
    * {\r \n \t space nbsp} from both ends; then decode HTML entities. */
  def normalizeText(text: String): String = {
    if (text == null || text.isEmpty) return ""
    var t = midWs.matcher(text).replaceAll(" ")
    t = trimChars(t, normalizeTrimChars)
    HtmlEntities.decode(t)
  }

  /** Trim ends (\r \n \t space), collapse inner whitespace runs,
    * optionally blank base64 data-image payloads inside src="...". */
  def normalizeHtml(html: String, stripBase64Image: Boolean = false): String = {
    if (html == null || html.isEmpty) return ""
    var h = trimChars(html, Array('\r', '\n', '\t', ' '))
    h = midWs.matcher(h).replaceAll(" ")
    if (stripBase64Image) h = base64Img.matcher(h).replaceAll("")
    h
  }

  /** Remove <...> tags (non-nested form), then normalizeText. */
  def trimHtmlTags(html: String): String = {
    if (html == null || html.isEmpty) return html
    normalizeText(anyTag.matcher(html).replaceAll(""))
  }

  /** Unwrap a JSONP payload `cb( ... );` → inner JSON.
    * Reference behavior: HtmlHelper.cs:287-292. */
  private val jsonp = Pattern.compile("^[\\w_]+\\((.+)\\);?$")
  def trimJsonP(content: String): String = {
    val m = jsonp.matcher(content)
    if (m.find()) m.group(1) else content
  }
}
