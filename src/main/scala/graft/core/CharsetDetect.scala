package graft.core

import java.nio.charset.{Charset, StandardCharsets}
import java.util.regex.Pattern

/** Charset detection for raw fetched page bytes — the U11 surface
  * (/root/reference/Source/WebCrawler/Common/HtmlHelper.cs:296-330 plus
  * the GB2312/GBK registration in Common/AppTools.cs:7-14).
  *
  * Reference order of precedence: HTTP header charset, else a `<meta>`
  * charset sniffed from the (latin-decoded) body — two syntaxes:
  * `<meta charset="...">` and
  * `<meta http-equiv="Content-Type" content="...; charset=...">` — with
  * a `utf8`→`utf-8` fixup. Our page table carries no headers (input_hint
  * has only bytes), so detection is meta-first with a UTF-8 default.
  * The JVM ships GBK/GB2312/Big5 so no extra registration is needed. */
object CharsetDetect {

  private val metaCharset = Pattern.compile(
    "<meta[^>]+charset\\s*=\\s*[\"']?\\s*([a-zA-Z0-9_\\-]+)",
    Pattern.CASE_INSENSITIVE)

  /** Normalize charset token the way the reference does (utf8 → utf-8)
    * and resolve it; unknown names fall back to UTF-8. */
  def resolve(name: String): Charset = {
    if (name == null || name.isEmpty) return StandardCharsets.UTF_8
    val n0 = name.trim.toLowerCase(java.util.Locale.ROOT)
    val n = if (n0 == "utf8") "utf-8" else n0
    try Charset.forName(n)
    catch { case _: Exception => StandardCharsets.UTF_8 }
  }

  /** Sniff the `<meta>` charset from raw bytes (scanning an ISO-8859-1
    * decode of the head region, which is charset-transparent for the
    * ASCII meta tag itself). */
  def sniff(bytes: Array[Byte]): Option[Charset] = {
    if (bytes == null || bytes.isEmpty) return None
    val head = new String(bytes, 0, math.min(bytes.length, 4096),
      StandardCharsets.ISO_8859_1)
    val m = metaCharset.matcher(head)
    if (m.find()) Some(resolve(m.group(1))) else None
  }

  /** Decode page bytes: declared header charset (when the table carries
    * one) beats the meta sniff beats UTF-8 — the reference's precedence
    * (HtmlHelper.cs:101-137). */
  def decode(bytes: Array[Byte], headerCharset: Option[String] = None): String = {
    if (bytes == null) return ""
    val cs = headerCharset.map(resolve).orElse(sniff(bytes))
      .getOrElse(StandardCharsets.UTF_8)
    new String(bytes, cs)
  }
}
