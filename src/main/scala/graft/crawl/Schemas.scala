package graft.crawl

import java.sql.Timestamp

/** Row types for the crawl pipeline (typed Dataset path throughout —
  * north rule: no RDDs). The table shapes derive from the reference's
  * five-table schema (/root/reference/Source/MySQLSchema.sql) re-expressed
  * for a columnar lake:
  *
  *  - [[Page]]        — the contractual input table (BASELINE.json
  *                      input_hint): Common-Crawl-style snapshot of the web.
  *  - [[HostConfig]]  — seed list + per-host politeness budget
  *                      (≈ atc_websites, MySQLSchema.sql:64-81, plus the
  *                      north rule's crawl_delay / max_in_flight).
  *  - [[HostState]]   — per-host carried state: the `lasthandled`
  *                      checkpoint (≈ atc_crawllogs.lasthandled,
  *                      MySQLSchema.sql:22) + broken tracking
  *                      (Models/Website.cs:54-55) + cached robots rules
  *                      (north-rule addition; no reference equivalent).
  *  - [[FetchTask]]   — one scheduled article fetch: the politeness
  *                      scheduler's output, with deterministic per-host
  *                      sequence number and logical fetch time.
  *  - [[ArticleRow]]  — output store row (≈ atc_articles,
  *                      MySQLSchema.sql:2-15; unique on url by
  *                      construction — seen-filter + anti-join).
  *  - [[WaveMetrics]] / [[PartitionLineage]] — per-host success/fail
  *                      roll-ups (≈ atc_crawls counters,
  *                      Crawlers/ArticleCrawler.cs:56-68) and the north
  *                      rule's per-partition lineage rows.
  */
final case class Page(
    url: String,          // canonical form (UrlCanon.canonicalize)
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,         // expected extracted text (oracle bytes)
    lang: String)

final case class RobotsRules(
    disallow: Seq[String],       // path prefixes
    crawl_delay_ms: Option[Long] // overrides HostConfig when present
)

final case class HostConfig(
    host_id: Int,
    host: String,          // registered host, lowercase
    home: String,          // seed URL (≈ atc_websites.home)
    rank: Int,             // priority score (≈ atc_websites.rank)
    enabled: Boolean,
    crawl_delay_ms: Long,  // politeness budget
    max_in_flight: Int)    // per-host concurrent fetches (reference: 1)

final case class HostState(
    host: String,
    lasthandled: Option[String],     // newest handled URL (checkpoint)
    broken_since: Option[Timestamp], // first-failure stamp
    robots_disallow: Seq[String],    // cached robots.txt rules
    robots_delay_ms: Option[Long],
    robots_wave: Int)                // wave the robots cache was filled

/** One article fetch scheduled by the politeness stage. `seq` is the
  * deterministic within-host order (newest-published first, reference
  * ordering Crawlers/ArticleCrawler.cs:137-148); `sched_ms` is the
  * logical fetch clock: ceil(seq / max_in_flight) * crawl_delay. */
final case class FetchTask(
    wave: Int,
    host: String,
    url: String,
    title: String,
    published: Option[Timestamp],
    seq: Int,
    sched_ms: Long,
    rank: Int)

final case class ArticleRow(
    url: String,
    host: String,
    wave: Int,
    seq: Int,
    title: String,
    content: String,       // byte-identical extracted text
    published: Option[Timestamp],
    author: Option[String],
    warc_ts: Timestamp)

final case class WaveMetrics(
    wave: Int,
    host: String,
    catalog_found: Int,   // items detected on the catalog page
    scheduled: Int,       // after checkpoint-stop + robots + cap
    robots_denied: Int,
    fetched_ok: Int,
    fetch_failed: Int,    // scheduled but absent from the page table
    deduped: Int,         // dropped by the seen-filter path
    inserted: Int)

/** North rule: per-partition lineage rows — which partition of which
  * stage produced how many rows in which wave. */
final case class PartitionLineage(
    wave: Int,
    stage: String,
    partition_id: Int,
    rows: Long,
    hosts: Long)

/** Bloom-then-Cuckoo seen-filter state, one row per host-hash bucket. */
final case class SeenSketch(
    bucket: Int,
    cuckoo: Array[Byte],
    n_urls: Long)
