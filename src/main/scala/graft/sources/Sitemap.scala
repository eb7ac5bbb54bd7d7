package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.time.{Instant, LocalDate, ZoneOffset}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{DomNode, MiniDom}

/** One parsed sitemap entry. `kind` is `"url"` (a page entry from a
  * `<urlset>`) or `"sitemap"` (a child-sitemap reference from a
  * `<sitemapindex>` — feed these back into [[Sitemap.read]] to walk the
  * index level). Optional per-spec fields are null when absent. */
final case class SitemapRow(
    sitemap_file: String,
    kind: String,
    loc: String,
    lastmod: Timestamp,
    changefreq: String,
    priority: Option[Double])

/** Sitemap (sitemaps.org XML protocol) ingestion — the crawl-seeding
  * source the reference's live engine leaves on the table: a site's
  * `robots.txt` names sitemap files ([[graft.core.RobotsTxt.sitemaps]]),
  * a `<sitemapindex>` names up to 50 000 child sitemaps, and each
  * `<urlset>` names up to 50 000 page URLs with freshness hints
  * (`lastmod`/`changefreq`/`priority`) — exactly the columns the
  * engine's priority frontier and recrawl scheduler (q68) consume.
  *
  * Scale shape: like [[Warc.read]], the unit of parallelism is the
  * FILE — the spec caps one sitemap at 50 MB / 50 000 entries, so a
  * full parse fits a task trivially and a large site's index fans out
  * to thousands of files, far exceeding executor count. Two-level
  * walk: `read` the index glob, filter `kind = 'sitemap'`, then `read`
  * the referenced files — no recursion (the spec forbids an index
  * referencing an index).
  *
  * Parsing reuses [[MiniDom]] (XML declarations are skipped as
  * processing instructions; sitemap tags are spec-lowercase). Entity
  * references in `<loc>` are decoded per spec §"Entity escaping"
  * (ampersand-escaped URLs are the NORM in real sitemaps). `.gz` files
  * gunzip through the standard single-member path (`sitemap.xml.gz`).
  */
object Sitemap {

  /** Spec-enumerated `<changefreq>` values, in spec order. */
  val ChangeFreqs: IndexedSeq[String] = IndexedSeq(
    "always", "hourly", "daily", "weekly", "monthly", "yearly", "never")

  /** Read a glob of `.xml` / `.xml.gz` sitemap files into a DataFrame
    * of [[SitemapRow]]. A file whose root is neither `<urlset>` nor
    * `<sitemapindex>` fails LOUDLY — a seeding source that silently
    * yields nothing would starve the frontier undetected. */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (path, pds) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val in = pds.open()
        val bytes =
          try {
            val src: java.io.InputStream =
              if (name.endsWith(".gz")) new GZIPInputStream(in, 1 << 16)
              else in
            src.readAllBytes()
          } finally in.close()
        parseRecords(new String(bytes, UTF_8), name)
      }
      .toDS().toDF()
  }

  /** Parse one sitemap document's entries (exposed for tests). */
  private[graft] def parseRecords(xml: String, file: String): Seq[SitemapRow] = {
    val dom = MiniDom.parse(xml)
    def findRoot(n: DomNode): Option[DomNode] =
      if (n.tag == "urlset" || n.tag == "sitemapindex") Some(n)
      else n.children.iterator.flatMap(findRoot).nextOption()
    val root = findRoot(dom).getOrElse(throw new IllegalArgumentException(
      s"$file: no <urlset> or <sitemapindex> root — not a sitemap"))
    val (entryTag, kind) =
      if (root.tag == "urlset") ("url", "url") else ("sitemap", "sitemap")
    root.children.iterator.filter(_.tag == entryTag).flatMap { e =>
      def field(t: String): Option[String] =
        e.children.iterator.find(_.tag == t)
          .map(n => decodeEntities(n.innerText.trim)).filter(_.nonEmpty)
      // spec: <loc> is required; an entry without one carries no URL
      // and is meaningless — fail loudly rather than emit a null seed
      val loc = field("loc").getOrElse(throw new IllegalArgumentException(
        s"$file: <$entryTag> entry without <loc>"))
      Some(SitemapRow(file, kind, loc,
        field("lastmod").map(parseW3cDate).orNull,
        field("changefreq").orNull,
        field("priority").flatMap(_.toDoubleOption)))
    }.toVector
  }

  /** W3C datetime (the `lastmod` format): a bare `yyyy-MM-dd` date or a
    * full ISO-8601 timestamp with zone (`Z` or `±hh:mm`). Bare dates
    * are midnight UTC. Unparseable values fail loudly — a corrupt
    * freshness signal silently defaulting would skew recrawl order. */
  private[graft] def parseW3cDate(s: String): Timestamp =
    if (s.length == 10)
      Timestamp.from(LocalDate.parse(s).atStartOfDay(ZoneOffset.UTC).toInstant)
    else
      Timestamp.from(java.time.OffsetDateTime.parse(s).toInstant)

  /** Decode the five XML predefined entities plus numeric references —
    * the escaping the spec REQUIRES for URLs in `<loc>` (MiniDom keeps
    * text raw, so this source decodes at the edge). */
  private[graft] def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else EntityRef.matcher(s).replaceAll { m =>
      val g = m.group(1)
      val out = g match {
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        case "quot" => "\""
        case "apos" => "'"
        case _ if g.startsWith("#x") || g.startsWith("#X") =>
          new String(Character.toChars(Integer.parseInt(g.substring(2), 16)))
        case _ if g.startsWith("#") =>
          new String(Character.toChars(g.substring(1).toInt))
        case _ => "&" + g + ";" // unknown named entity: keep verbatim
      }
      java.util.regex.Matcher.quoteReplacement(out)
    }

  private val EntityRef = java.util.regex.Pattern.compile(
    "&([a-zA-Z]+|#[0-9]+|#[xX][0-9a-fA-F]+);")

  // ---- engine bridge: freshness hints → recrawl schedule --------------

  /** `<changefreq>` → recrawl interval, integer microseconds. `always`
    * is 0 (always due); `never` is EXCLUDED from the per-host minimum
    * (a never-changing page demands no recrawl; it must not mask a
    * sibling's daily). Month/year use the fixed 30/365-day calendar
    * convention. */
  val FreqIntervalUs: Map[String, Long] = Map(
    "always" -> 0L,
    "hourly" -> 3600L * 1000000L,
    "daily" -> 86400L * 1000000L,
    "weekly" -> 7L * 86400L * 1000000L,
    "monthly" -> 30L * 86400L * 1000000L,
    "yearly" -> 365L * 86400L * 1000000L)

  /** Per-host recrawl schedule from sitemap freshness hints — the
    * bridge from this source to the engine (same shape as
    * `Freshness.recrawlSchedule`, so the EXISTING
    * `Freshness.applySchedule` gates a wave's host dimension on it):
    * a host is next due at `max(lastmod) + min(changefreq interval)`
    * over its sitemap entries. A host advertising no parseable
    * `lastmod` or only `never`/absent changefreqs gets a null
    * `next_due_us` — applySchedule treats null as DUE NOW (no
    * freshness evidence must never suppress a crawl).
    *
    * Scale shape: one partial-aggregated hash shuffle on host over the
    * slim (host, lastmod_us, interval_us) projection — the hint
    * columns arrive as columns, bodies never ride. All integer math,
    * deterministic, SQL-replayable (q77's oracle). */
  def freshnessSchedule(rows: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val intervalExpr = FreqIntervalUs.foldLeft(
      lit(null).cast("long")) { case (acc, (k, v)) =>
      when(col("changefreq") === k, lit(v)).otherwise(acc)
    }
    rows.where(col("kind") === "url")
      .select(graft.ops.UrlOps.host(col("loc")).as("host_id"),
        unix_micros(col("lastmod")).as("lm_us"),
        intervalExpr.as("iv_us"))
      .groupBy("host_id")
      .agg(count(lit(1)).as("n_urls"),
        max(col("lm_us")).as("last_us"),
        min(col("iv_us")).as("interval_us"))
      .withColumn("next_due_us", col("last_us") + col("interval_us"))
      .orderBy("host_id")
  }

  // ---- deterministic fixture (mirrors Warc.synthesizeFromDocs) -------

  /** Deterministic sitemap fixture from a `documents` table: doc d →
    * one `<url>` entry in urlset `part-(d%3)` (parts 0–1 plain `.xml`,
    * part 2 gzipped `.xml.gz`), plus one `<sitemapindex>` naming the
    * three — every field a pure function of the row, so an ANSI-SQL
    * oracle reconstructs the full output without reading the files.
    * Collects to the driver (test fixture only; the READ path under
    * test is fully distributed). */
  def synthesizeFromDocs(docs: DataFrame, dir: String): Unit = {
    import org.apache.spark.sql.functions.col
    val rows = docs.select(col("doc_id").cast("long"), col("source"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .sortBy(_._1)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    (0 until 3).foreach { f =>
      val name = partName(f)
      val sb = new StringBuilder
      sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
      sb ++= "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
      rows.iterator.filter(_._1 % 3 == f).foreach { case (id, src) =>
        sb ++= "  <url>\n"
        sb ++= s"    <loc>${Warc.docUrl(id, src)}</loc>\n"
        sb ++= s"    <lastmod>${Warc.docTsIso(id)}</lastmod>\n"
        sb ++= s"    <changefreq>${ChangeFreqs((id % 7).toInt)}</changefreq>\n"
        // Locale.ROOT: a comma-decimal default locale must not leak
        // into the XML ("0,3" would parse back as a null priority)
        sb ++= "    <priority>" + String.format(java.util.Locale.ROOT,
          "%.1f", Double.box(((id % 9) + 1) / 10.0)) + "</priority>\n"
        sb ++= "  </url>\n"
      }
      sb ++= "</urlset>\n"
      writeFile(s"$dir/$name", sb.toString, gzip = f == 2)
    }
    val idx = new StringBuilder
    idx ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
    idx ++= "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n"
    (0 until 3).foreach { f =>
      idx ++= "  <sitemap>\n"
      idx ++= s"    <loc>http://index.example.org/sitemaps/${partName(f)}</loc>\n"
      idx ++= s"    <lastmod>2024-02-0${f + 1}</lastmod>\n"
      idx ++= "  </sitemap>\n"
    }
    idx ++= "</sitemapindex>\n"
    writeFile(s"$dir/sitemapindex.xml", idx.toString, gzip = false)
  }

  private[graft] def partName(f: Int): String =
    s"part-$f.xml" + (if (f == 2) ".gz" else "")

  private def writeFile(path: String, text: String, gzip: Boolean): Unit = {
    val raw: OutputStream = new BufferedOutputStream(
      new FileOutputStream(path), 1 << 16)
    val out = if (gzip) new GZIPOutputStream(raw, 1 << 16) else raw
    try out.write(text.getBytes(UTF_8)) finally out.close()
  }
}
