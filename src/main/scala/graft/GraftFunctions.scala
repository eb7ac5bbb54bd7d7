package graft

import graft.core._
import org.apache.spark.sql.SparkSession

/** SQL-surface registration of the pure extraction/canonicalization core
  * (SURVEY.md §2.8 U1–U14) so every function is usable from
  * `spark.sql(...)` as well as the Column API. One Scala implementation
  * backs both paths — the byte-identity requirement forbids parallel
  * reimplementations. */
object GraftFunctions {

  def registerAll(spark: SparkSession): Unit = {
    val u = spark.udf
    // U1 family — text/html normalization (Common/HtmlHelper.cs:223-273)
    u.register("normalize_text", (s: String) => TextNormalize.normalizeText(s))
    u.register("normalize_html", (s: String, strip: Boolean) =>
      TextNormalize.normalizeHtml(s, strip))
    u.register("trim_html_tags", (s: String) => TextNormalize.trimHtmlTags(s))
    u.register("trim_jsonp", (s: String) => TextNormalize.trimJsonP(s))
    u.register("html_decode", (s: String) => HtmlEntities.decode(s))
    // U3–U6 — article extraction (Analyzers/Html2Article.cs:104-373)
    u.register("extract_content", (html: String) =>
      ArticleExtractor.extract(html).content)
    u.register("extract_title", (html: String) => ArticleExtractor.getTitle(html))
    u.register("extract_author", (html: String) =>
      ArticleExtractor.getAuthor(html).orNull)
    u.register("extract_published", (html: String) =>
      ArticleExtractor.getPublishDate(html)
        .map(java.sql.Timestamp.valueOf).orNull)
    // U7/U10 + north rule — URL canonicalization
    u.register("url_canon", (s: String) => UrlCanon.canonicalize(s))
    u.register("url_host", (s: String) => UrlCanon.host(s))
    u.register("url_root_site", (s: String) => UrlCanon.rootSiteUrl(s))
    u.register("url_resolve", (base: String, rel: String) =>
      UrlCanon.resolve(base, rel))
    // U2 (auto-detect path) — catalog items as an exploded array
    u.register("detect_catalog_urls", (html: String, base: String) =>
      CatalogDetect.detect(html, base).map(_.url))
    // text sketches (training-data ops)
    u.register("simhash60", (s: String) => TextSketch.simhash60(s))
    u.register("minhash_sig", (s: String, n: Int) =>
      TextSketch.minhashSignature(TextSketch.shingleHashes(s, 3), n))
    // media container probes (r5 — ops.MediaHeaders real header
    // parsing; total over malformed AND NULL blobs: unknown/0, never
    // an error — Scala UDFs receive null for reference-typed params,
    // so the guard lives here, not in the parsers). `media_probe`
    // returns the whole (container, width, height, durationMs) struct
    // from ONE parse — prefer it when extracting several fields; the
    // scalar forms re-parse per call.
    def probeOf(b: Array[Byte]): graft.ops.MediaHeaders.Probe =
      if (b == null) graft.ops.MediaHeaders.Probe("unknown", 0, 0, 0L)
      else graft.ops.MediaHeaders.probe(b)
        .getOrElse(graft.ops.MediaHeaders.Probe("unknown", 0, 0, 0L))
    u.register("media_probe", (b: Array[Byte]) => probeOf(b))
    u.register("media_container", (b: Array[Byte]) => probeOf(b).container)
    u.register("media_width", (b: Array[Byte]) => probeOf(b).width)
    u.register("media_height", (b: Array[Byte]) => probeOf(b).height)
    u.register("media_duration_ms", (b: Array[Byte]) => probeOf(b).durationMs)
  }
}
