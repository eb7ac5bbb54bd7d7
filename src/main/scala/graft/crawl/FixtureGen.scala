package graft.crawl

import java.sql.Timestamp
import java.time.LocalDateTime

import graft.core.{ArticleExtractor, UrlCanon}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic web fixture — the engine's input table in the
  * contractual shape (BASELINE.json input_hint: url, warc_ts, html:binary,
  * text, lang). No wall clock, no RNG, no network: every byte is a pure
  * function of (cfg.seed, host, article index, wave), so the same table
  * can be regenerated at any scale for tests (tiny), the DuckDB-style
  * oracle (small) and the local[8]/local[32] scaling benchmark (large).
  *
  * The site population mirrors the reference's operating envelope
  * (seed-list crawling, /root/reference/Source/WebCrawler/Crawlers/
  * ArticleCrawler.cs:118-262) plus the fixture mix FIXTURES.md §2 calls
  * for: one "hot" host owning a large share of all URLs (skew tests),
  * one host that goes broken at wave 2 (broken tracking,
  * ArticleCrawler.cs:210-232), one robots-blocked host and one
  * robots-delay-overridden host (north-rule politeness additions).
  */
final case class FixtureCfg(
    nHosts: Int = 20,
    baseArticles: Int = 30,  // articles per regular host at wave 0
    growthPerWave: Int = 5,  // new articles per host per wave
    hotHostFactor: Int = 10, // host 0 has this × the volume (skew)
    seed: Long = 42L) {
  require(nHosts >= 12, "fixture roles need at least 12 hosts")
}

object FixtureGen {

  /** Host roles (by index) — documented fixture contract. */
  val HotHost = 0          // owns hotHostFactor× the articles
  val MultiInflightHost = 1 // max_in_flight = 2 (north-rule politeness)
  val SlowDelayHost = 2    // robots crawl-delay override
  val RobotsBlockedHost = 3 // robots disallows its whole /a/ tree
  val BrokenAtWave2Host = 4 // home page vanishes from wave 2 on
  val ShufflingHost = 5    // catalog re-dates items every wave, so the
                           // lasthandled stop re-schedules old URLs and
                           // the seen-filter dedup path actually fires
                           // (the catalog-reorder case the reference's
                           // UNIQUE key absorbs, MySQLSchema.sql:14)
  val GbHost = 6           // article pages declare + encode GB2312
                           // (charset sniff path, HtmlHelper.cs:296-330)
  val JsonFeedHost = 7     // rule-driven host: catalog is a JSONP feed
                           // fetched via page-url revise (S4/U13) and
                           // parsed with a JPath rule (HtmlAnalyzer JPath
                           // branch) instead of HTML auto-detection
  val MissingPagesHost = 8 // catalog lists articles whose pages are
                           // ABSENT from the snapshot: every scheduled
                           // fetch fails, so the lasthandled checkpoint
                           // must NOT advance ("Failed as nothing
                           // succeeded", ArticleCrawler.cs:200-210) and
                           // the same articles are retried next wave
  val UndatedCatalogHost = 9 // catalog lists newest-first with SOME
                           // items undated: the reference sorts by
                           // published only when ALL items have dates
                           // (ArticleCrawler.cs:137-144), so detection
                           // order must be preserved here. Its robots
                           // also carries an Allow override (longest-
                           // match-wins evaluation, RobotsTxt)
  val XPathCatalogHost = 10 // rule-driven via the reference's DEFAULT
                           // rule type: an XPath link path
                           // //ul[@class='list']/li[*]/a, split at the
                           // last [*] into container + relative link
                           // (Block.ContainerPath/RelativeLinkXPath,
                           // HtmlAnalyzer.cs:666-720) over MiniDom
  val ArticleRuleHost = 11 // XPath catalog rule PLUS article-stage
                           // overrides (cnt_exp_title/date/content/
                           // author → ParseArticle switch,
                           // HtmlAnalyzer.cs:155-186): extracted bytes
                           // come from the rule's nodes, not the
                           // density extractor

  def hostName(i: Int): String = f"h$i%03d.example.com"
  def homeUrl(i: Int): String = s"http://${hostName(i)}/"

  def articleCount(cfg: FixtureCfg, i: Int, wave: Int): Int = {
    val n = cfg.baseArticles + wave * cfg.growthPerWave
    if (i == HotHost) n * cfg.hotHostFactor else n
  }

  /** Canonical article URL (what UrlCanon.canonicalize yields). */
  def articleUrl(i: Int, j: Int): String =
    s"http://${hostName(i)}/a/$j.html"

  /** Deterministic small hash for variant selection. */
  private def h(cfg: FixtureCfg, i: Int, j: Int, salt: Int): Long = {
    var x = cfg.seed ^ (i.toLong << 40) ^ (j.toLong << 8) ^ salt
    x ^= (x >>> 33); x *= 0xff51afd7ed558ccdL
    x ^= (x >>> 33); x *= 0xc4ceb9fe1a85ec53L
    x ^ (x >>> 33)
  }

  /** The messy href the home page actually carries — uppercase hosts,
    * explicit :80, fragments, relative forms — all of which canonicalize
    * back to [[articleUrl]] (exercises UrlCanon end-to-end). */
  def messyHref(cfg: FixtureCfg, i: Int, j: Int): String =
    (math.floorMod(h(cfg, i, j, 1), 5) match {
      case 0 => s"/a/$j.html"
      case 1 => s"HTTP://${hostName(i).toUpperCase}:80/a/$j.html"
      case 2 => s"/a/$j.html#comments"
      case 3 => s"a/$j.html"
      case _ => articleUrl(i, j)
    })

  def publishedAt(i: Int, j: Int): LocalDateTime =
    LocalDateTime.of(2024, 1, 1, 0, 0).plusHours(7L * j + i)

  /** The date the CATALOG page displays for an item (what frontier
    * ordering sees). For the shuffling host it is a per-wave pseudo-
    * random permutation; everywhere else it equals the article's own
    * published date. */
  def catalogDate(cfg: FixtureCfg, i: Int, j: Int, wave: Int): LocalDateTime =
    if (i == ShufflingHost)
      LocalDateTime.of(2024, 1, 1, 0, 0)
        .plusMinutes(math.floorMod(h(cfg, i, j, 7000 + wave), 500000L))
    else publishedAt(i, j)

  /** Catalog date as the LIST PAGE shows it — None when the page omits
    * the date (UndatedCatalogHost, odd items), which must force the
    * engine to keep detection order (ArticleCrawler.cs:137-144). */
  def catalogDateOpt(cfg: FixtureCfg, i: Int, j: Int, wave: Int): Option[LocalDateTime] =
    if (i == UndatedCatalogHost && j % 2 == 1) None
    else Some(catalogDate(cfg, i, j, wave))

  /** The order the catalog page lists its items in. The undated host
    * lists newest-first (as real undated news lists do); everyone else
    * ascending (so the engine must do the newest-first sort itself). */
  def catalogOrder(cfg: FixtureCfg, i: Int, wave: Int): Seq[Int] = {
    val n = articleCount(cfg, i, wave)
    if (i == UndatedCatalogHost) (0 until n).reverse else 0 until n
  }

  def warcTs(i: Int, j: Int): Timestamp =
    Timestamp.valueOf(LocalDateTime.of(2024, 6, 1, 0, 0).plusMinutes(i * 1440L + j))

  def isZh(cfg: FixtureCfg, i: Int, j: Int): Boolean =
    i == GbHost || math.floorMod(h(cfg, i, j, 2), 5) == 0

  def articleTitle(i: Int, j: Int): String = s"Story number $j from site $i"

  private def fmtDate(dt: LocalDateTime): String =
    f"${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d " +
      f"${dt.getHour}%02d:${dt.getMinute}%02d"

  /** Deterministic article body long enough (>180 chars/window) to
    * trigger the text-density extractor's start condition
    * (Analyzers/Html2Article.cs:307-365 semantics). */
  private def bodyParagraphs(cfg: FixtureCfg, i: Int, j: Int): Seq[String] = {
    val nPar = 8 + math.floorMod(h(cfg, i, j, 3), 5).toInt
    (0 until nPar).map { p =>
      val words = (0 until 18).map(w =>
        s"w${math.floorMod(h(cfg, i, j, 100 + p * 31 + w), 9973)}")
      s"Paragraph $p of story $j on host $i: " + words.mkString(" ") + "."
    }
  }

  def articleHtml(cfg: FixtureCfg, i: Int, j: Int): String = {
    val dt = publishedAt(i, j)
    val author =
      if (isZh(cfg, i, j)) "作者：张伟" else s"作者：Reporter${math.floorMod(h(cfg, i, j, 4), 50)}"
    val paras = bodyParagraphs(cfg, i, j)
      .map(p => s"<p>$p</p>").mkString("\n")
    val metaCharset = if (i == GbHost)
      """<meta http-equiv="Content-Type" content="text/html; charset=gb2312">"""
    else """<meta charset="utf-8">"""
    s"""<!DOCTYPE html>
       |<html>
       |<head>$metaCharset<title>${articleTitle(i, j)}</title>
       |<script>var x=${j};</script>
       |<style>.c{color:red}</style>
       |</head>
       |<body>
       |<header><a href="/">Home</a> <a href="/about.html">About</a></header>
       |<h1>${articleTitle(i, j)}</h1>
       |<div class="meta">${fmtDate(dt)} $author</div>
       |<!-- tracking comment -->
       |<div class="article">
       |$paras
       |</div>
       |<footer><a href="/contact.html">Contact</a></footer>
       |</body>
       |</html>
       |""".stripMargin
  }

  /** Home (catalog) page at a given wave: lists the wave's article set
    * in ascending-j order (the engine must do the newest-first sort
    * itself, ArticleCrawler.cs:137-148), with messy hrefs, a dated
    * <span> per item, and nav/footer noise links that the noise-area
    * filter must drop (Analyzers/HtmlAnalyzer.cs:370-375). */
  def homeHtml(cfg: FixtureCfg, i: Int, wave: Int): String = {
    val items = catalogOrder(cfg, i, wave).map { j =>
      val dateSpan = catalogDateOpt(cfg, i, j, wave)
        .map(dt => s"""<span class="d">${fmtDate(dt)}</span>""").getOrElse("")
      s"""<li><a href="${messyHref(cfg, i, j)}">${articleTitle(i, j)}</a>$dateSpan</li>"""
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html>
       |<head><title>${hostName(i)} — news</title></head>
       |<body>
       |<nav><a href="/">Home</a> <a href="/arch.html">Archive</a>
       |<a href="/tags.html">Tags</a> <a href="/feed.xml">Feed</a></nav>
       |<h1>Latest stories</h1>
       |<ul class="list">
       |$items
       |</ul>
       |<footer><a href="/about.html">About</a> <a href="#top">Top</a>
       |<a href="javascript:void(0)">Share</a></footer>
       |</body>
       |</html>
       |""".stripMargin
  }

  def feedUrl(i: Int): String = s"http://${hostName(i)}/api/feed.jsonp"

  /** Single-line JSONP feed for the rule-driven host — the shape the
    * reference's TrimJsonP + JPath rules consume (HtmlHelper.cs:287-292;
    * HtmlAnalyzer JPath branch). Lists the wave's article set with
    * catalog dates; item URLs are root-relative. */
  def feedJson(cfg: FixtureCfg, i: Int, wave: Int): String = {
    val n = articleCount(cfg, i, wave)
    val items = (0 until n).map { j =>
      val dt = catalogDate(cfg, i, j, wave)
      s"""{"u": "/a/$j.html", "t": "${articleTitle(i, j)}", """ +
        f""""d": "${dt.getYear}%04d-${dt.getMonthValue}%02d-${dt.getDayOfMonth}%02d ${dt.getHour}%02d:${dt.getMinute}%02d"}"""
    }.mkString(", ")
    s"""loadCatalog({"items": [$items]});"""
  }

  def ruleFor(i: Int): Option[RuleSpec] = i match {
    case JsonFeedHost =>
      Some(RuleSpec("JPath", "$.items[*]", url_field = "u",
        title_field = "t", date_field = "d",
        page_url_revise_exp = Some("/$"),
        page_url_revise_rep = Some("/api/feed.jsonp")))
    case XPathCatalogHost =>
      Some(RuleSpec("XPath", "//ul[@class='list']/li[*]/a"))
    case ArticleRuleHost =>
      Some(RuleSpec("XPath", "//ul[@class='list']/li[*]/a",
        art_title_exp = Some("//h1"),
        art_date_exp = Some("//div[@class='meta']"),
        art_author_exp = Some("//div[@class='meta']"),
        art_content_exp = Some("//div[@class='article']")))
    case _ => None
  }

  /** Expected extracted text for an article — the `text` oracle column
    * (per-row invariant: the pipeline must reproduce these bytes).
    * Rule-bearing hosts go through the article-stage rule overrides
    * exactly like the engine's extract stage. */
  def articleText(cfg: FixtureCfg, i: Int, j: Int): String =
    graft.core.RuleEngine.parseArticle(articleHtml(cfg, i, j),
      ruleFor(i).map(RuleSpec.toCatalogRule)).content

  def lang(cfg: FixtureCfg, i: Int, j: Int): String =
    if (isZh(cfg, i, j)) "zh" else "en"

  def brokenAtWave(i: Int): Option[Int] =
    if (i == BrokenAtWave2Host) Some(2) else None

  // ---- Spark builders ---------------------------------------------------

  /** The web snapshot visible to wave `wave` (articles + home pages).
    * Distributed generation: spark.range over a precomputed per-host
    * offset table, so it scales to the bench sizes without driver
    * materialization. */
  def pages(spark: SparkSession, cfg: FixtureCfg, wave: Int): Dataset[Page] = {
    import spark.implicits._
    val counts = (0 until cfg.nHosts).map(i => articleCount(cfg, i, wave))
    val offsets = counts.scanLeft(0L)(_ + _).toArray // length nHosts+1
    val total = offsets.last
    val articles = spark.range(total).mapPartitions { ids =>
      ids.flatMap { id =>
        // binary search host for this global index
        var lo = 0; var hi = cfg.nHosts - 1
        while (lo < hi) {
          val mid = (lo + hi + 1) >>> 1
          if (offsets(mid) <= id) lo = mid else hi = mid - 1
        }
        val i = lo
        val j = (id - offsets(i)).toInt
        if (i == MissingPagesHost) Iterator.empty // catalog-only host:
        // its article pages 404 → every scheduled fetch fails
        else {
          val html = articleHtml(cfg, i, j)
          // GbHost pages are stored in their DECLARED non-UTF-8 encoding —
          // the engine must sniff the meta charset to round-trip the text
          val enc = if (i == GbHost) "GB2312" else "UTF-8"
          Iterator.single(Page(articleUrl(i, j), warcTs(i, j),
            html.getBytes(enc), articleText(cfg, i, j), lang(cfg, i, j)))
        }
      }
    }
    val homes = spark.range(cfg.nHosts).mapPartitions { ids =>
      ids.flatMap { idl =>
        val i = idl.toInt
        val gone = brokenAtWave(i).exists(wave >= _)
        if (gone) Iterator.empty
        else if (i == JsonFeedHost) Iterator.single(Page(
          UrlCanon.canonicalize(feedUrl(i)), warcTs(i, 0),
          feedJson(cfg, i, wave).getBytes("UTF-8"), "", "en"))
        else Iterator.single(Page(
          UrlCanon.canonicalize(homeUrl(i)), warcTs(i, 0),
          homeHtml(cfg, i, wave).getBytes("UTF-8"), "", "en"))
      }
    }
    articles.unionByName(homes)
  }

  /** Materialize a wave's page snapshot to parquet once and read it
    * back — the realistic input shape (columnar scan, column pruning,
    * pushdown), and it keeps the generator's per-page extraction from
    * re-running on every downstream action. */
  def pagesParquet(spark: SparkSession, cfg: FixtureCfg, wave: Int,
                   dir: String): Dataset[Page] = {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val path = s"$dir/pages_wave=$wave"
    // the memo is keyed on the FULL FixtureCfg: a leftover parquet from
    // a run at a different scale must be regenerated, not silently
    // reused (a stale 50-host snapshot under a 100-host config reads
    // as 50 broken hosts and silently wrong numbers). The marker is
    // underscore-prefixed so Spark's parquet reader ignores it.
    val mark = Paths.get(path, "_fixture_cfg")
    val cfgStr = cfg.toString
    val fresh = Files.exists(Paths.get(path)) &&
      Files.exists(mark) && Files.readString(mark) == cfgStr
    if (!fresh) {
      pages(spark, cfg, wave).write.mode("overwrite").parquet(path)
      Files.writeString(mark, cfgStr)
    }
    spark.read.parquet(path).as[Page]
  }

  def crawlDelayMs(i: Int): Long = 100L * (i % 3 + 1)
  def maxInFlight(i: Int): Int = if (i == MultiInflightHost) 2 else 1

  def hosts(spark: SparkSession, cfg: FixtureCfg): Dataset[HostConfig] = {
    import spark.implicits._
    spark.range(cfg.nHosts).map { idl =>
      val i = idl.toInt
      HostConfig(
        host_id = i,
        host = hostName(i),
        home = homeUrl(i),
        rank = cfg.nHosts - i, // lower index = higher priority
        enabled = true,
        crawl_delay_ms = crawlDelayMs(i),
        max_in_flight = maxInFlight(i),
        rule = ruleFor(i))
    }
  }

  /** RAW robots.txt text per host — what the engine actually parses
    * (graft.core.RobotsTxt) and caches in HostState. */
  def robotsTxtFor(i: Int): String = i match {
    case RobotsBlockedHost =>
      """# articles are off-limits for every crawler
        |User-agent: *
        |Disallow: /a/
        |""".stripMargin
    case SlowDelayHost =>
      """User-agent: *
        |Crawl-delay: 9
        |
        |User-agent: graftbot
        |Crawl-delay: 0.5
        |""".stripMargin
    case UndatedCatalogHost =>
      """User-agent: *
        |Disallow: /a/
        |Allow: /a/1
        |""".stripMargin
    case _ =>
      """User-agent: *
        |Disallow:
        |""".stripMargin
  }

  /** The INTENDED policy per host (hand-written, independent of the
    * parser) — what the oracle uses; RobotsTxtSpec pins
    * parse(robotsTxtFor(i), "graftbot") == robotsFor(i). */
  def robotsFor(i: Int): graft.core.RobotsPolicy = i match {
    case RobotsBlockedHost   => graft.core.RobotsPolicy(Seq("/a/"), Nil, None)
    case SlowDelayHost       => graft.core.RobotsPolicy(Nil, Nil, Some(500L))
    case UndatedCatalogHost  => graft.core.RobotsPolicy(Seq("/a/"), Seq("/a/1"), None)
    case _                   => graft.core.RobotsPolicy.empty
  }

  // RobotsRow moved to Schemas.scala — it is an engine INPUT row, not a
  // fixture type; aliases keep existing sources/tests stable
  type RobotsRow = graft.crawl.RobotsRow
  val RobotsRow = graft.crawl.RobotsRow

  def robots(spark: SparkSession, cfg: FixtureCfg): Dataset[RobotsRow] = {
    import spark.implicits._
    spark.range(cfg.nHosts).map { idl =>
      val i = idl.toInt
      RobotsRow(hostName(i), robotsTxtFor(i))
    }
  }
}
