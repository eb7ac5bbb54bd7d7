package graft.core

import java.util.Locale
import java.util.regex.Pattern

/** URL canonicalization for the frontier / URL-seen set.
  *
  * The reference's only canonical forms are host extraction via
  * `https?://([^/\r\n ]+)` (/root/reference/Source/WebCrawler/Common/
  * HtmlHelper.cs:17-31), case-insensitive URL equality for the
  * checkpoint stop (Crawlers/ArticleCrawler.cs:165) and
  * `Uri.EscapeUriString` before store (DataLayer/MySQLDataLayer.cs:179).
  * The north rule extends this to full canonicalization: lowercase
  * scheme+host, strip fragment, strip default ports, normalize
  * percent-escapes. All pure string work — no java.net.URL (no DNS).
  */
object UrlCanon {

  private val hostPat = Pattern.compile("https?://([^/\\r\\n ]+)")
  // host() is OUR canonicalization primitive (north rule), not the
  // reference's — it must accept any scheme casing; rootSiteUrl below
  // stays byte-faithful to the reference's case-sensitive regex
  // (Common/HtmlHelper.cs:24).
  private val hostPatCI =
    Pattern.compile("https?://([^/\\r\\n ]+)", Pattern.CASE_INSENSITIVE)

  /** Reference-compatible root-site extraction: `scheme://authority`
    * if the URL parses, else the lowercased input. */
  def rootSiteUrl(url: String): String = {
    if (url == null || url.isEmpty) return ""
    val m = hostPat.matcher(url)
    if (m.find()) m.group(0) else url.toLowerCase(Locale.ROOT)
  }

  /** Registered host (authority minus userinfo/port), lowercased;
    * empty string when the URL has no http(s) authority. */
  def host(url: String): String = {
    if (url == null) return ""
    val m = hostPatCI.matcher(url)
    if (!m.find()) return ""
    var auth = m.group(1)
    val at = auth.lastIndexOf('@')
    if (at >= 0) auth = auth.substring(at + 1)
    // IPv6 literal [::1]:8080 — strip port only after the bracket
    val colon =
      if (auth.startsWith("[")) {
        val close = auth.indexOf(']')
        if (close >= 0) auth.indexOf(':', close) else -1
      } else auth.indexOf(':')
    if (colon >= 0) auth = auth.substring(0, colon)
    auth.toLowerCase(Locale.ROOT)
  }

  private def isUnreserved(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private val hex = "0123456789ABCDEF".toCharArray

  /** Normalize percent-escapes in a path/query:
    *  - uppercase hex digits of valid escapes;
    *  - decode escapes of unreserved characters (%41 → A);
    *  - percent-encode raw spaces and control chars;
    *  - leave everything else byte-for-byte.
    */
  def normalizeEscapes(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < n && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else {
          sb.append('%').append(Character.toUpperCase(s.charAt(i + 1)))
            .append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else if (c == ' ') { sb.append("%20"); i += 1 }
      else if (c < 0x20 || c == 0x7f) {
        sb.append('%').append(hex(c >> 4)).append(hex(c & 0xf)); i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Resolve a possibly-relative URL against a base page URL, mirroring
    * the reference's `new Uri(baseUri, url)` absolutization
    * (/root/reference/Source/WebCrawler/Common/HtmlHelper.cs:33-47)
    * without java.net.URI's DNS/IDN machinery. Handles absolute URLs,
    * protocol-relative `//host/p`, root-relative `/p`, query-only `?q`,
    * and path-relative forms with `.`/`..` segment removal. */
  def resolve(base: String, rel: String): String = {
    if (rel == null || rel.isEmpty) return if (base == null) "" else base
    val r = rel.trim
    if (r.regionMatches(true, 0, "http://", 0, 7) ||
        r.regionMatches(true, 0, "https://", 0, 8)) return r
    // any other explicit scheme (mailto:, tel:, data:, ftp:, …) is
    // already absolute — the reference's `new Uri(base, link)` keeps it
    // as-is; gluing it onto the base path would enqueue phantom http
    // fetches and pollute the seen-set with bogus canonical keys
    val ci = r.indexOf(':')
    if (ci > 0 && r.charAt(0).isLetter && {
          val sl = r.indexOf('/'); sl < 0 || ci < sl
        } && {
          var i = 1; var ok = true
          while (ok && i < ci) {
            val c = r.charAt(i)
            ok = c.isLetter || c.isDigit || c == '+' || c == '-' || c == '.'
            i += 1
          }
          ok
        }) return r
    val b = if (base == null) "" else base.trim
    val scheme =
      if (b.regionMatches(true, 0, "https://", 0, 8)) "https"
      else if (b.regionMatches(true, 0, "http://", 0, 7)) "http"
      else return r
    if (r.startsWith("//")) return scheme + ":" + r
    val rest = b.substring(scheme.length + 3)
    val slash = rest.indexOf('/')
    val auth = if (slash < 0) rest else rest.substring(0, slash)
    val basePathQ = if (slash < 0) "/" else rest.substring(slash)
    val root = scheme + "://" + auth
    if (r.startsWith("/")) return root + removeDotSegments(r)
    if (r.startsWith("?")) {
      val q = basePathQ.indexOf('?')
      val p = if (q >= 0) basePathQ.substring(0, q) else basePathQ
      return root + p + r
    }
    if (r.startsWith("#")) return b
    // path-relative: replace last segment of the base path
    val q = basePathQ.indexOf('?')
    val basePath = if (q >= 0) basePathQ.substring(0, q) else basePathQ
    val dir = basePath.substring(0, basePath.lastIndexOf('/') + 1)
    root + removeDotSegments(dir + r)
  }

  private val hrefSrcAttr = Pattern.compile(
    "(?i)\\b(href|src)\\s*=\\s*(\"([^\"]*)\"|'([^']*)')")
  private val baseHrefPat = Pattern.compile(
    "(?is)<base\\b[^>]*?href\\s*=\\s*(\"([^\"]*)\"|'([^']*)')")

  /** Rewrite every `href`/`src` attribute in an HTML fragment to its
    * absolute form, honoring `<base href>` — the U8 surface
    * (/root/reference/Source/WebCrawler/Common/HtmlHelper.cs:49-82).
    * `javascript:`/`#`/`data:`/`mailto:` values pass through untouched. */
  def resolveHtmlUrls(html: String, pageUrl: String): String = {
    if (html == null || html.isEmpty) return if (html == null) "" else html
    val bm = baseHrefPat.matcher(html)
    val base =
      if (bm.find())
        // a relative <base href> is itself resolved against the page
        // URL first (HtmlHelper.cs:42-55)
        resolve(pageUrl,
          Option(bm.group(2)).orElse(Option(bm.group(3))).getOrElse(pageUrl))
      else pageUrl
    val m = hrefSrcAttr.matcher(html)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val attr = m.group(1)
      val v = Option(m.group(3)).orElse(Option(m.group(4))).getOrElse("")
      val lower = v.trim.toLowerCase(Locale.ROOT)
      val out =
        if (v.isEmpty || lower.startsWith("#") || lower.startsWith("javascript") ||
            lower.startsWith("data:") || lower.startsWith("mailto:")) v
        else resolve(base, v)
      m.appendReplacement(sb,
        java.util.regex.Matcher.quoteReplacement(s"""$attr="$out""""))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** RFC 3986 §5.2.4 dot-segment removal on an absolute path. */
  private def removeDotSegments(path: String): String = {
    val q = path.indexOf('?')
    val (p, query) = if (q >= 0) (path.substring(0, q), path.substring(q)) else (path, "")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val segs = p.split("/", -1)
    var i = 0
    while (i < segs.length) {
      segs(i) match {
        case "."  => // skip
        case ".." => if (out.nonEmpty) out.remove(out.length - 1)
        case s    => out += s
      }
      i += 1
    }
    val trailingSlash = p.endsWith("/") || p.endsWith("/.") || p.endsWith("/..")
    var joined = out.mkString("/")
    if (!joined.startsWith("/")) joined = "/" + joined.dropWhile(_ == '/')
    if (trailingSlash && !joined.endsWith("/")) joined += "/"
    joined + query
  }

  /** Full canonical form: lowercase scheme+authority host, strip
    * userinfo-less default ports (:80 http / :443 https), drop the
    * fragment, normalize percent escapes in path+query, ensure a "/"
    * path when empty. Non-http(s) inputs are returned trimmed+lowercased
    * scheme-only best effort (we only crawl http/https). Idempotent. */
  def canonicalize(url: String): String = {
    if (url == null) return ""
    var u = url.trim
    if (u.isEmpty) return ""
    // drop fragment first
    val hash = u.indexOf('#')
    if (hash >= 0) u = u.substring(0, hash)
    val scheme =
      if (u.regionMatches(true, 0, "https://", 0, 8)) "https"
      else if (u.regionMatches(true, 0, "http://", 0, 7)) "http"
      else return u.toLowerCase(Locale.ROOT)
    val rest0 = u.substring(scheme.length + 3)
    val slash = rest0.indexOf('/')
    val qmark = rest0.indexOf('?')
    val authEnd =
      if (slash < 0 && qmark < 0) rest0.length
      else if (slash < 0) qmark
      else if (qmark < 0) slash
      else math.min(slash, qmark)
    var auth = rest0.substring(0, authEnd).toLowerCase(Locale.ROOT)
    var path = rest0.substring(authEnd)
    // strip default port
    val defPort = if (scheme == "http") ":80" else ":443"
    if (auth.endsWith(defPort)) auth = auth.substring(0, auth.length - defPort.length)
    if (path.isEmpty) path = "/"
    else if (path.charAt(0) == '?') path = "/" + path
    scheme + "://" + auth + normalizeEscapes(path)
  }
}
