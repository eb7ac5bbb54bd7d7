package graft.core

import java.time.LocalDateTime
import java.util.regex.{Matcher, Pattern}

/** Extracted article fields. `published` is a wall-clock-free
  * LocalDateTime (the page's own claim, not event time). */
final case class ArticleDetails(
    title: String,
    content: String,
    contentWithTags: String,
    published: Option[LocalDateTime],
    author: Option[String],
)

/** Text-density article extraction.
  *
  * From-scratch Scala implementation of the observable behavior of the
  * reference extractor (StanZhai Html2Article as embedded at
  * /root/reference/Source/WebCrawler/Analyzers/Html2Article.cs:104-373):
  * line-oriented sliding-window density scan with depth=6,
  * limitCount=180, headEmptyLines=2, endLimitCharCount=20.
  *
  * Deliberate spec deviations from the .NET original (our fixtures are
  * the byte contract, see FIXTURES.md §6):
  *  - `[crlf]` markers expand to "\n" (the original uses
  *    Environment.NewLine, i.e. "\r\n" on Windows hosts).
  *  - date strings parse culture-invariantly: shape `d sep d sep yyyy`
  *    is month/day/year; 2-digit years map 00-49→20xx, 50-99→19xx.
  *
  * .NET→JVM regex notes: patterns using \d \s \w compile with
  * UNICODE_CHARACTER_CLASS to match .NET's Unicode-aware classes; the
  * duplicated `sep1` group name in GetPublishDateRaw is renamed (Java
  * forbids duplicate group names).
  */
object ArticleExtractor {

  val Depth = 6
  val LimitCount = 180
  val HeadEmptyLines = 2
  val EndLimitCharCount = 20

  private val U = Pattern.UNICODE_CHARACTER_CLASS
  private val CI = Pattern.CASE_INSENSITIVE
  private val DA = Pattern.DOTALL

  private val bodyPat = Pattern.compile("<body.*?</body>", CI | DA)
  private val filterPats: Array[(Pattern, String)] = Array(
    Pattern.compile("<script.*?>.*?</script>", CI | DA) -> "",
    Pattern.compile("<style.*?>.*?</style>", CI | DA) -> "",
    Pattern.compile("<!--.*?-->", CI | DA) -> "",
    Pattern.compile("</a>", CI | DA) -> "</a>\n",
  )
  private val tagReflowPat = Pattern.compile("(<[^<>]+)\\s*\\n\\s*", U)
  private val lineBreakPat = Pattern.compile("</p>|<br.*?/>", CI | DA)
  private val anyTagDotall = Pattern.compile("<.*?>", CI | DA)
  private val titlePat = Pattern.compile("<title>[\\s\\S]*?</title>", CI)
  private val h1Pat = Pattern.compile("<h1.*?>.*?</h1>", CI)
  private val clearTagPat = Pattern.compile("<.*?>")

  private val datePat = Pattern.compile(
    "(\\d{1,2}(?<sep1>[-/.])\\d{1,2}\\k<sep1>\\d{4}" +
      "|(\\d{4}|\\d{2})(?<sep2>[-/.])\\d{1,2}\\k<sep2>\\d{1,2}" +
      "|\\d{4}年\\d{1,2}月\\d{1,2}日)" +
      "(\\s?\\d{2}:\\d{2}(:\\d{2})?)?",
    CI | U)

  private val dateRawPat = Pattern.compile(
    "(\\d{4}(?<sepa>[-/.])\\d{1,2}\\k<sepa>\\d{1,2}" +
      "|\\d{1,2}(?<sepb>[-/.])\\d{1,2}\\k<sepb>\\d{4}" +
      "|\\d{1,2}[-/]\\d{1,2}" +
      "|((\\d{4}|\\d{2})年)?\\d{1,2}月\\d{1,2}(日|号))?" +
      "(\\s?\\d{2}:\\d{2}(:\\d{2})?)?",
    CI | U)

  private val authorPats = Array(
    Pattern.compile("(?<=作者：|文/)[\\w]+", U),
    Pattern.compile("(?<=来源：|出处：)[\\w]+", U),
    Pattern.compile("(?<=编辑：)[\\w]+", U),
  )

  /** Full extraction: title, dated, author, density-scanned content. */
  def extract(htmlIn: String): ArticleDetails = {
    // compressed (minified) html: the scan is line-oriented, so force a
    // newline after every tag close when fewer than 10 newlines exist
    var html = htmlIn
    var nl = 0
    var i = 0
    while (i < html.length && nl < 10) { if (html.charAt(i) == '\n') nl += 1; i += 1 }
    if (nl < 10) html = html.replace(">", ">\n")

    var body = {
      val m = bodyPat.matcher(html)
      if (m.find()) m.group(0) else ""
    }
    for ((p, rep) <- filterPats) body = p.matcher(body).replaceAll(rep)
    body = reflowTags(body)

    val (content, contentWithTags) = getContent(body)
    // tag-strip the body ONCE and share it between the date and author
    // scans (each used to re-strip the full document — 2 of ~7 whole-
    // document regex passes, measured on the extract kernel)
    val plain = anyTagDotall.matcher(body).replaceAll("")
    ArticleDetails(
      title = getTitle(html),
      content = content,
      contentWithTags = contentWithTags,
      published = datesFromText(plain),
      author = authorFromText(plain),
    )
  }

  /** Join multi-line tags onto one line (strip \r\n inside `<tag ...`
    * plus the surrounding whitespace run the pattern swallowed). */
  private def reflowTags(body: String): String = {
    val m = tagReflowPat.matcher(body)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val v = m.group(0)
      val cleaned = new java.lang.StringBuilder(v.length)
      var j = 0
      while (j < v.length) {
        val c = v.charAt(j)
        if (c != '\r' && c != '\n') cleaned.append(c)
        j += 1
      }
      m.appendReplacement(sb, Matcher.quoteReplacement(cleaned.toString))
    }
    m.appendTail(sb)
    sb.toString
  }

  def getTitle(html: String): String = {
    var title = ""
    val tm = titlePat.matcher(html)
    if (tm.find()) title = clearTagPat.matcher(tm.group(0)).replaceAll("")
    val hm = h1Pat.matcher(html)
    if (hm.find()) {
      val h1 = clearTagPat.matcher(hm.group(0)).replaceAll("")
      if (h1.nonEmpty && title.startsWith(h1)) title = h1
    }
    TextNormalize.normalizeText(title)
  }

  def getPublishDate(html: String): Option[LocalDateTime] = {
    if (html == null || html.isEmpty) return None
    datesFromText(anyTagDotall.matcher(html).replaceAll(""))
  }

  private def datesFromText(text: String): Option[LocalDateTime] = {
    val m = datePat.matcher(text)
    if (m.find() && m.group(0).nonEmpty) parseDate(m.group(0)) else None
  }

  /** Raw date string with the most date/time components among all
    * matches (used by the interactive rule tester in the reference). */
  def getPublishDateRaw(html: String): Option[String] = {
    val text = anyTagDotall.matcher(html).replaceAll("")
    val m = dateRawPat.matcher(text)
    val seps = Array('-', '/', '.', '年', '月', '日', '号', ':')
    var best: String = null
    var bestParts = -1
    while (m.find()) {
      val v = m.group(0)
      if (v != null && v.nonEmpty) {
        val parts = v.split(seps.mkString("[", "", "]")).count(_.nonEmpty)
        if (parts > bestParts) { bestParts = parts; best = v }
      }
    }
    Option(best)
  }

  def getAuthor(html: String): Option[String] = {
    if (html == null || html.isEmpty) return None
    authorFromText(anyTagDotall.matcher(html).replaceAll(""))
  }

  private def authorFromText(text: String): Option[String] = {
    var i = 0
    while (i < authorPats.length) {
      val m = authorPats(i).matcher(text)
      if (m.find()) return Some(m.group(0))
      i += 1
    }
    None
  }

  /** Culture-invariant parse of the three matched date shapes, with an
    * optional trailing HH:mm(:ss). Invalid component values → None
    * (mirrors DateTime.TryParse returning false). */
  private[graft] def parseDate(s: String): Option[LocalDateTime] = {
    val t = s.trim
    // split off time part
    val timeIdx = t.indexWhere(c => c == ':')
    var datePart = t
    var hh = 0; var mm = 0; var ss = 0
    if (timeIdx >= 0) {
      val sp = t.lastIndexOf(' ')
      val (d, tp) = if (sp >= 0) (t.substring(0, sp), t.substring(sp + 1))
                    else ("", t) // time glued without space: "yyyy-MM-ddHH:mm" won't occur per regex \s?
      datePart = d
      val comps = tp.split(':')
      try {
        hh = comps(0).toInt; mm = comps(1).toInt
        if (comps.length > 2) ss = comps(2).toInt
      } catch { case _: Exception => return None }
      if (hh > 23 || mm > 59 || ss > 59) return None
    }
    if (datePart.isEmpty) return None
    var y = 0; var mo = 0; var d = 0
    if (datePart.contains('年')) {
      val m = Pattern.compile("(\\d{4})年(\\d{1,2})月(\\d{1,2})日").matcher(datePart)
      if (!m.matches()) return None
      y = m.group(1).toInt; mo = m.group(2).toInt; d = m.group(3).toInt
    } else {
      val comps = datePart.split("[-/.]")
      if (comps.length != 3) return None
      try {
        if (comps(0).length == 4) { // y/M/d
          y = comps(0).toInt; mo = comps(1).toInt; d = comps(2).toInt
        } else if (comps(2).length == 4) { // M/d/y
          mo = comps(0).toInt; d = comps(1).toInt; y = comps(2).toInt
        } else { // yy/M/d with 2-digit year window 00-49 → 20xx
          val yy = comps(0).toInt
          y = if (yy <= 49) 2000 + yy else 1900 + yy
          mo = comps(1).toInt; d = comps(2).toInt
        }
      } catch { case _: Exception => return None }
    }
    try Some(LocalDateTime.of(y, mo, d, hh, mm, ss))
    catch { case _: Exception => None }
  }

  /** The density scan. Returns (content, contentWithTags). */
  private[graft] def getContent(bodyText: String): (String, String) = {
    val orgLines = bodyText.split('\n')
    val lines = new Array[String](orgLines.length)
    var i = 0
    while (i < orgLines.length) {
      val withMarks = lineBreakPat.matcher(orgLines(i)).replaceAll("[crlf]")
      lines(i) = TextNormalize.netTrim(anyTagDotall.matcher(withMarks).replaceAll(""))
      i += 1
    }

    val sb = new java.lang.StringBuilder
    val orgSb = new java.lang.StringBuilder
    var preTextLen = 0
    var startPos = -1
    i = 0
    var done = false
    while (!done && i < lines.length - Depth) {
      var len = 0
      var j = 0
      while (j < Depth) { len += lines(i + j).length; j += 1 }

      if (startPos == -1) {
        if (preTextLen > LimitCount && len > 0) {
          // walk back until 2 consecutive empty lines mark the header end
          var emptyCount = 0
          var k = i - 1
          while (k > 0 && startPos == -1) {
            if (lines(k).isEmpty) emptyCount += 1 else emptyCount = 0
            if (emptyCount == HeadEmptyLines) startPos = k + HeadEmptyLines
            k -= 1
          }
          if (startPos == -1) startPos = i
          var f = startPos
          while (f <= i) { sb.append(lines(f)); orgSb.append(orgLines(f)); f += 1 }
        }
      } else {
        if (len <= EndLimitCharCount && preTextLen < EndLimitCharCount) {
          done = true
        } else {
          sb.append(lines(i))
          orgSb.append(orgLines(i))
        }
      }
      if (!done) { preTextLen = len; i += 1 }
    }

    val content = HtmlEntities.decode(sb.toString.replace("[crlf]", "\n"))
    (content, orgSb.toString)
  }
}
