package graft.crawl

import java.sql.Timestamp

import graft.core.filters.{BloomFilter, CuckooFilter}
import graft.core.{ArticleExtractor, CatalogDetect, UrlCanon}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Internal per-host work row (home fetch result + carried state).
  * Top-level (not nested/private) because Spark's encoder codegen needs
  * public accessors. */
final case class HostWork(
    host: String, host_id: Int, home: String, rank: Int,
    crawl_delay_ms: Long, max_in_flight: Int,
    lasthandled: Option[String], broken_since: Option[Timestamp],
    robots_disallow: Seq[String], robots_delay_ms: Option[Long],
    robots_wave: Int, html: Option[Array[Byte]], fetched_ts: Option[Timestamp])

/** Internal per-host outcome of the politeness/catalog stage. */
final case class HostOutcome(
    state: HostState,
    homeOk: Boolean,
    catalogFound: Int,
    robotsDenied: Int,
    tasks: Seq[FetchTask])

/** Engine tuning knobs. Defaults mirror the reference's operating
  * envelope (/root/reference/Source/WebCrawler.Console/appsettings.json:29-37,
  * Source/WebCrawler/Common/Constants.cs:13). */
final case class CrawlConfig(
    maxPerHostPerWave: Int = 100, // MAX_RECORDS, Constants.cs:13
    hostBuckets: Int = 16,        // seen-filter host-hash buckets (B)
    salt: Int = 4,                // skew salt per host bucket (S)
    bloomFpp: Double = 0.01,
    expectedUrlsPerBucket: Long = 100000L,
    cuckooCapacityPerBucket: Int = 1 << 17,
    fetchPartitions: Int = 0)     // 0 = leave to AQE / input partitioning

/** One wave of the crawl — the Spark re-expression of the reference's
  * fetch–detect–extract–commit loop (Crawlers/ArticleCrawler.cs:33-262):
  *
  * {{{
  * hosts ⋈ carried state  (wave seeding — S7's correlated subquery is
  *        |                the previous wave's state table, broadcast)
  *        v
  * pages ⋈ broadcast(home targets)          (catalog "fetch")
  *        v
  * groupByKey(host).flatMapGroups           (politeness scheduler:
  *        |        catalog detect → newest-first sort → per-wave cap →
  *        |        lasthandled checkpoint stop → robots filter →
  *        |        crawl-delay/max-in-flight logical schedule)
  *        v
  * salted repartition → pages ⋈ tasks       (article fetch-join)
  *        v
  * mapPartitions extract                    (byte-identical text)
  *        v
  * bloom-probe → cuckoo-probe → exact anti-join   (URL-seen dedup)
  *        v
  * append articles + state + seen + metrics + lineage; manifest commit
  * }}}
  *
  * Everything stays in typed Dataset / DataFrame ops (no RDDs); the only
  * driver-side data are per-host state (≤ seed-list size) and per-bucket
  * sketches (bounded by B×S), both of which are broadcast.
  */
object WaveEngine {

  // ---- politeness scheduler (pure core, reused by the test oracle) ----

  /** Deterministic per-host schedule for one wave. Reference semantics:
    * newest-published-first ordering + per-wave cap
    * (ArticleCrawler.cs:137-148), stop at the previous wave's
    * `lasthandled` URL case-insensitively (ArticleCrawler.cs:163-168),
    * then the north rule's additions: robots disallow prefixes, and a
    * logical fetch clock spaced by crawl-delay over max-in-flight lanes. */
  def scheduleHost(
      wave: Int,
      cfg: HostConfig,
      items: Vector[graft.core.CatalogItem],
      lasthandled: Option[String],
      robotsDisallow: Seq[String],
      robotsDelayMs: Option[Long],
      maxPerWave: Int): (Vector[FetchTask], Int) = {
    val ordered = items.sortBy { it =>
      (it.published.map(-_.toEpochSecond(java.time.ZoneOffset.UTC))
        .getOrElse(Long.MaxValue), it.url)
    }.take(maxPerWave)
    val fresh = ordered.takeWhile(it =>
      !lasthandled.exists(_.equalsIgnoreCase(it.url)))
    val (allowed, denied) = fresh.partition { it =>
      val path = pathOf(it.url)
      !robotsDisallow.exists(path.startsWith)
    }
    val delay = robotsDelayMs.getOrElse(cfg.crawl_delay_ms)
    val lanes = math.max(1, cfg.max_in_flight)
    val tasks = allowed.zipWithIndex.map { case (it, k) =>
      FetchTask(
        wave = wave, host = cfg.host, url = it.url, title = it.title,
        published = it.published.map(Timestamp.valueOf),
        seq = k, sched_ms = (k / lanes).toLong * delay, rank = cfg.rank)
    }
    (tasks, denied.size)
  }

  def pathOf(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) return url
    val s = url.indexOf('/', i + 3)
    if (s < 0) "/" else url.substring(s)
  }

  final case class WaveResult(
      wave: Int,
      scheduled: Long,
      fetched: Long,
      inserted: Long,
      deduped: Long,
      failed: Long)

  // ---- the wave ---------------------------------------------------------

  def runWave(
      spark: SparkSession,
      store: SnapshotStore,
      pages: Dataset[Page],
      hosts: Dataset[HostConfig],
      robots: Dataset[FixtureGen.RobotsRow],
      wave: Int,
      cfg: CrawlConfig = CrawlConfig()): WaveResult = {
    import spark.implicits._

    if (store.isCommitted(wave)) { // snapshot-exact resume: already done
      val m = store.read(spark, "metrics", wave).as[WaveMetrics]
      val agg = m.groupBy().agg(
        sum("scheduled"), sum("fetched_ok"), sum("inserted"),
        sum("deduped"), sum("fetch_failed")).head()
      def g(i: Int) = if (agg.isNullAt(i)) 0L else agg.getLong(i)
      return WaveResult(wave, g(0), g(1), g(2), g(3), g(4))
    }

    val prevWave = wave - 1
    val prevState: Dataset[HostState] =
      if (wave > 0 && store.isCommitted(prevWave))
        store.read(spark, "state", prevWave).as[HostState]
      else spark.emptyDataset[HostState]

    // -- seeding: enabled hosts ⋈ carried state ⋈ robots (all host-sized,
    //    broadcast) — the Spark form of QueueCrawlAsync's insert-select
    //    with correlated last-checkpoint subquery (MySQLDataLayer.cs:416-438)
    val seeded = hosts.where($"enabled")
      .join(broadcast(prevState.toDF()), Seq("host"), "left")
      .join(broadcast(robots.toDF()
        .withColumnRenamed("disallow", "r_disallow")
        .withColumnRenamed("crawl_delay_ms", "r_delay")), Seq("host"), "left")

    // -- catalog fetch: big pages table ⋈ broadcast(home targets), inner
    //    (broadcast is only legal on the small side of an inner join;
    //    missing homes are recovered with a cheap anti-join against the
    //    small fetched set — the pages table is scanned, never shuffled)
    val homeTargets = seeded.withColumn("home_canon",
      udf((h: String) => UrlCanon.canonicalize(h)).apply($"home"))
    val homesOk = pages.toDF()
      .select($"url".as("home_canon"), $"html", $"warc_ts".as("fetched_ts"))
      .join(broadcast(homeTargets), Seq("home_canon"), "inner")
    val homesMissing = homeTargets
      .join(homesOk.select($"host".as("ok_host")),
        $"host" === $"ok_host", "left_anti")
      .withColumn("html", lit(null).cast("binary"))
      .withColumn("fetched_ts", lit(null).cast("timestamp"))
    val fetchedHomes = homesOk.drop("home_canon")
      .unionByName(homesMissing.drop("home_canon"))

    val work = fetchedHomes.select(
      $"host", $"host_id", $"home", $"rank",
      col("crawl_delay_ms"), $"max_in_flight",
      $"lasthandled", $"broken_since",
      coalesce($"robots_disallow", $"r_disallow", typedLit(Seq.empty[String]))
        .as("robots_disallow"),
      coalesce($"robots_delay_ms", $"r_delay").as("robots_delay_ms"),
      coalesce($"robots_wave", lit(-1)).as("robots_wave"),
      $"html", $"fetched_ts"
    ).as[HostWork]

    // -- politeness + catalog detection: whole-host groups (NEVER salted —
    //    per-host sequential semantics are the politeness contract, T5)
    val maxPer = cfg.maxPerHostPerWave
    val outcomes: Dataset[HostOutcome] = work.groupByKey(_.host)
      .flatMapGroups { (_, it) =>
        it.map { w =>
          val robotsW = if (w.robots_wave >= 0) w.robots_wave else wave
          w.html match {
            case None => // home fetch failed → broken tracking (T2)
              HostOutcome(
                HostState(w.host, w.lasthandled,
                  w.broken_since.orElse(w.fetched_ts)
                    .orElse(Some(new Timestamp(86400000L * (wave + 1)))),
                  w.robots_disallow, w.robots_delay_ms, robotsW),
                homeOk = false, catalogFound = 0, robotsDenied = 0, Nil)
            case Some(bytes) =>
              val html = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
              val items = CatalogDetect.detect(html, w.home)
              val hc = HostConfig(w.host_id, w.host, w.home, w.rank,
                enabled = true, w.crawl_delay_ms, w.max_in_flight)
              val (tasks, denied) = scheduleHost(wave, hc, items,
                w.lasthandled, w.robots_disallow, w.robots_delay_ms, maxPer)
              val newLast = items.sortBy { i2 =>
                (i2.published.map(-_.toEpochSecond(java.time.ZoneOffset.UTC))
                  .getOrElse(Long.MaxValue), i2.url)
              }.headOption.map(_.url).orElse(w.lasthandled)
              HostOutcome(
                HostState(w.host, newLast, None,
                  w.robots_disallow, w.robots_delay_ms, robotsW),
                homeOk = true, items.size, denied, tasks)
          }
        }
      }.cache()

    val tasks: Dataset[FetchTask] = outcomes.flatMap(_.tasks).cache()

    // -- article fetch-join: pages ⋈ broadcast(tasks) on canonical url.
    //    A wave's fetch batch is bounded (maxPerHostPerWave × hosts), so
    //    the task side broadcasts and the huge pages table is only
    //    SCANNED — never shuffled. At a frontier batch too large to
    //    broadcast, this degrades to a shuffle hash join on url, which
    //    is skew-free (urls are unique); the politeness grouping above
    //    is the only stage that must stay whole-host.
    val tasksDF = tasks.toDF().withColumnRenamed("title", "cat_title")
    val fetched = pages.toDF()
      .join(broadcast(tasksDF), Seq("url"), "inner")

    // tasks whose URL is absent from the page snapshot = fetch failures
    // (reference counts them per site, ArticleCrawler.cs:187-196)
    val fetchFails = tasksDF
      .join(fetched.select($"url"), Seq("url"), "left_anti")
      .select($"host", $"url").as[(String, String)].cache()

    // -- host-hash salted repartitioning (north rule): the CPU-heavy
    //    extract stage is the crawler's "fetch executor queue" — key it
    //    by (host-hash × salt + url-hash % salt) so a hot domain spreads
    //    over `salt` partitions instead of hot-spotting one executor,
    //    and keep within-partition (host, seq) order = politeness order.
    val nFetchParts = if (cfg.fetchPartitions > 0) cfg.fetchPartitions
      else spark.sessionState.conf.numShufflePartitions
    val queued = fetched
      .repartition(nFetchParts,
        expr(s"pmod(hash(host), ${cfg.hostBuckets}) * ${cfg.salt} + pmod(hash(url), ${cfg.salt})"))
      .sortWithinPartitions($"host", $"seq")

    // -- extraction: per-partition batched typed map (byte-identical text)
    val extracted = queued.select(
      $"url", $"host", $"wave", $"seq", $"cat_title", $"published",
      $"html", $"warc_ts").as[(String, String, Int, Int, String,
        Option[Timestamp], Array[Byte], Timestamp)]
      .mapPartitions { rows =>
        rows.map { case (url, host, w, seq, catTitle, pub, b, wts) =>
          val d = ArticleExtractor.extract(
            new String(b, java.nio.charset.StandardCharsets.UTF_8))
          val title = if (d.title.nonEmpty) d.title else catTitle
          ArticleRow(url, host, w, seq, title, d.content,
            d.published.map(Timestamp.valueOf).orElse(pub), d.author, wts)
        }
      }.cache()

    // -- per-partition lineage rows (north rule)
    val lineage = extracted
      .groupBy(spark_partition_id().as("partition_id"))
      .agg(count(lit(1)).as("rows"), countDistinct($"host").as("hosts"))
      .select(lit(wave).as("wave"), lit("extract").as("stage"),
        $"partition_id", $"rows", $"hosts").as[PartitionLineage]

    // -- URL-seen: bloom (rebuilt, broadcast) → cuckoo (carried) → exact
    val seenSketches: Map[Int, Array[Byte]] =
      if (wave > 0 && store.isCommitted(prevWave))
        store.read(spark, "seen", prevWave).as[SeenSketch]
          .collect().map(s => s.bucket -> s.cuckoo).toMap
      else Map.empty

    val existing: Option[DataFrame] =
      if (wave > 0) store.readDeltas(spark, "articles", prevWave) else None

    val blooms: Map[Int, Array[Byte]] = existing match {
      case None => Map.empty
      case Some(art) =>
        SeenFilter.buildBlooms(
          art.select($"host", $"url").as[(String, String)]
            .map { case (h, u) =>
              (SeenFilter.bucket(h, u, cfg.hostBuckets, cfg.salt), u) },
          cfg.expectedUrlsPerBucket, cfg.bloomFpp)
    }

    val bBlooms = spark.sparkContext.broadcast(blooms)
    val bCuckoos = spark.sparkContext.broadcast(seenSketches)
    val hb = cfg.hostBuckets; val sl = cfg.salt
    // Probe semantics: the Bloom stage is rebuilt from the FULL committed
    // URL set, so "bloom no AND cuckoo no" ⇒ definitely unseen (no false
    // negatives); any "yes" routes the row to the exact anti-join (false
    // positives can never lose rows). Sketches deserialize once per
    // partition per bucket, not per row.
    val classified = extracted.mapPartitions { rows =>
      val bloomCache = scala.collection.mutable.HashMap.empty[Int, BloomFilter]
      val cuckooCache = scala.collection.mutable.HashMap.empty[Int, CuckooFilter]
      rows.map { a =>
        val bkt = SeenFilter.bucket(a.host, a.url, hb, sl)
        val hash = BloomFilter.hash64(a.url)
        val maybeBloom = bBlooms.value.contains(bkt) &&
          bloomCache.getOrElseUpdate(bkt,
            BloomFilter.deserialize(bBlooms.value(bkt))).mightContain(hash)
        val maybeCuckoo = !maybeBloom && bCuckoos.value.contains(bkt) &&
          cuckooCache.getOrElseUpdate(bkt,
            CuckooFilter.deserialize(bCuckoos.value(bkt))).contains(hash)
        (a, maybeBloom || maybeCuckoo)
      }
    }.cache()

    val definitelyNew = classified.filter(!_._2).map(_._1)
    val maybeSeen = classified.filter(_._2).map(_._1)
    val confirmedNew = existing match {
      case None => maybeSeen
      case Some(art) => maybeSeen.toDF()
        .join(art.select($"url").distinct(), Seq("url"), "left_anti")
        .as[ArticleRow]
    }
    // intra-wave duplicates (two hosts syndicating the same canonical
    // url in one wave): the reference's UNIQUE key keeps whichever
    // insert lands first; our deterministic projection keeps the
    // lexicographically smallest (host, seq)
    val dedupW = org.apache.spark.sql.expressions.Window
      .partitionBy($"url").orderBy($"host", $"seq")
    val newArticles = definitelyNew.unionByName(confirmedNew).toDF()
      .withColumn("rn", row_number().over(dedupW))
      .where($"rn" === 1).drop("rn").as[ArticleRow].cache()

    // -- metrics per host (A4 roll-up)
    val perHostNew = newArticles.groupBy($"host").agg(count(lit(1)).as("inserted"))
    val perHostFetched = extracted.groupBy($"host").agg(count(lit(1)).as("fetched_ok"))
    val perHostFail = fetchFails.toDF("host", "url")
      .groupBy($"host").agg(count(lit(1)).as("task_failed"))
    val perHostSched = tasks.groupBy($"host").agg(count(lit(1)).as("scheduled"))
    val hostFacts = outcomes.map(o => (o.state.host, o.catalogFound,
      o.robotsDenied, !o.homeOk)).toDF("host", "catalog_found", "robots_denied", "home_failed")

    val metrics = hostFacts
      .join(perHostSched, Seq("host"), "left")
      .join(perHostFetched, Seq("host"), "left")
      .join(perHostFail, Seq("host"), "left")
      .join(perHostNew, Seq("host"), "left")
      .select(
        lit(wave).as("wave"), $"host",
        $"catalog_found",
        coalesce($"scheduled", lit(0L)).cast("int").as("scheduled"),
        $"robots_denied",
        coalesce($"fetched_ok", lit(0L)).cast("int").as("fetched_ok"),
        (coalesce($"task_failed", lit(0L)) + when($"home_failed", 1L).otherwise(0L))
          .cast("int").as("fetch_failed"),
        (coalesce($"fetched_ok", lit(0L)) - coalesce($"inserted", lit(0L)))
          .cast("int").as("deduped"),
        coalesce($"inserted", lit(0L)).cast("int").as("inserted"))
      .as[WaveMetrics]

    // -- carried seen-state update (cuckoo insert of this wave's inserts)
    val newSeen = SeenFilter.updateCuckoos(spark,
      newArticles.map(a => (SeenFilter.bucket(a.host, a.url, hb, sl), a.url)),
      seenSketches, cfg.cuckooCapacityPerBucket)

    val newState = outcomes.map(_.state)

    // -- commit (manifest rename = the snapshot swap). Host-sized tables
    //    coalesce to one file (they are ≤ seed-list rows); articles keep
    //    their partitioning.
    val mCached = metrics.toDF().coalesce(1).cache()
    val nArticles = store.write(newArticles.toDF(), "articles", wave)
    val nFrontier = store.write(tasks.toDF().coalesce(1), "frontier", wave)
    val nState = store.write(newState.toDF().coalesce(1), "state", wave)
    val nSeen = store.write(newSeen.toDF().coalesce(1), "seen", wave)
    val nMetrics = store.write(mCached, "metrics", wave)
    val nLineage = store.write(lineage.toDF().coalesce(1), "lineage", wave)
    store.commit(wave, Map(
      "articles" -> nArticles, "frontier" -> nFrontier, "state" -> nState,
      "seen" -> nSeen, "metrics" -> nMetrics, "lineage" -> nLineage))

    // wave totals from the (cached) metrics roll-up — one job, no extra
    // recomputation of the task/extract lineage
    val agg = mCached.groupBy().agg(
      sum("scheduled"), sum("fetched_ok"), sum("deduped"),
      sum("fetch_failed")).head()
    def g(i: Int) = if (agg.isNullAt(i)) 0L else agg.getLong(i)
    val res = WaveResult(wave, g(0), g(1), nArticles, g(2), g(3))
    outcomes.unpersist(); tasks.unpersist(); fetchFails.unpersist()
    extracted.unpersist(); classified.unpersist(); newArticles.unpersist()
    mCached.unpersist()
    res
  }

  /** Multi-wave driver loop with resume: waves already committed in the
    * store are skipped (recomputed results read back from the snapshot),
    * so a crashed run relaunched with the same arguments produces the
    * identical store (tested in CrawlPipelineSpec). */
  def run(
      spark: SparkSession,
      store: SnapshotStore,
      pagesAt: Int => Dataset[Page],
      hosts: Dataset[HostConfig],
      robots: Dataset[FixtureGen.RobotsRow],
      nWaves: Int,
      cfg: CrawlConfig = CrawlConfig()): Seq[WaveResult] =
    (0 until nWaves).map { w =>
      runWave(spark, store, pagesAt(w), hosts, robots, w, cfg)
    }
}
