package graft.crawl

import java.time.ZoneOffset

/** Single-threaded, Spark-free oracle executing the reference crawler's
  * semantics over the SAME deterministic fixture the engine reads — the
  * equivalence contract SURVEY.md §5.3 defines:
  *
  *   wave seeding with carried checkpoint (MySQLDataLayer.cs:416-438)
  *   → newest-published-first ordering + per-wave cap
  *     (ArticleCrawler.cs:137-148, Constants.cs:13)
  *   → stop at `lasthandled` case-insensitively (ArticleCrawler.cs:163-168)
  *   → robots filter + politeness clock (north-rule additions)
  *   → unique-URL insert-or-skip (MySQLSchema.sql:14,
  *     MySQLDataLayer.cs:190-199)
  *   → checkpoint advance on non-failure, broken tracking on failure
  *     (ArticleCrawler.cs:208-232).
  *
  * Deliberately does NOT reuse the engine's scheduleHost/CatalogDetect:
  * the expected catalog is derived from FixtureGen's generative intent
  * (every article link, noise dropped, hrefs canonical), so the oracle
  * independently checks catalog detection, canonicalization, ordering,
  * checkpointing, dedup and politeness in one sweep.
  *
  * Cross-host nondeterminism note: the reference's thread pool interleaves
  * sites arbitrarily; the deterministic projection we pin is per-host
  * order + wave membership + the seen-set, with intra-wave duplicate-URL
  * winners resolved as min (host, seq) — documented in WaveEngine.
  */
object CrawlOracle {

  final case class OTask(wave: Int, host: String, seq: Int, url: String,
                         schedMs: Long)
  final case class OResult(
      schedule: Vector[OTask],
      // url -> (wave first inserted, winning host, extracted content)
      seen: Map[String, (Int, String, String)],
      lasthandled: Map[String, String],
      brokenHosts: Set[String],
      robotsDenied: Map[(Int, String), Int],
      dedupedPerWave: Map[Int, Int])

  def run(cfg: FixtureCfg, nWaves: Int, maxPerWave: Int = 100): OResult = {
    var lasthandled = Map.empty[String, String]
    var broken = Set.empty[String]
    var seen = Map.empty[String, (Int, String, String)]
    val schedule = Vector.newBuilder[OTask]
    var robotsDenied = Map.empty[(Int, String), Int]
    var dedupedPerWave = Map.empty[Int, Int].withDefaultValue(0)

    for (wave <- 0 until nWaves) {
      // collect this wave's tasks host by host (hosts are independent)
      val waveTasks = Vector.newBuilder[(OTask, Int, Int)] // task, i, j
      for (i <- 0 until cfg.nHosts) {
        val host = FixtureGen.hostName(i)
        val isBroken = FixtureGen.brokenAtWave(i).exists(wave >= _)
        if (isBroken) {
          broken += host
        } else {
          broken -= host
          // items in CATALOG order; sort newest-first ONLY when all are
          // dated (stable — ties keep catalog order), then cap
          // (ArticleCrawler.cs:137-148)
          val items0 = FixtureGen.catalogOrder(cfg, i, wave).map { j =>
            (FixtureGen.articleUrl(i, j), j,
              FixtureGen.catalogDateOpt(cfg, i, j, wave))
          }.toVector
          // W4: detection trims undated head/tail items when ≥5 items
          // are dated (GetCatalogItems validateDate, HtmlAnalyzer.cs:
          // 338-354); the short-text trim is a fixture no-op (all
          // titles ≥ 5 chars)
          val items =
            if (items0.count(_._3.isDefined) >= 5) {
              val from = items0.indexWhere(_._3.isDefined)
              val last = items0.lastIndexWhere(_._3.isDefined)
              items0.slice(from, last + 1)
            } else items0
          val allDated = items.nonEmpty && items.forall(_._3.isDefined)
          val sorted = (if (allDated)
            items.sortBy { case (_, _, dt) => -dt.get.toEpochSecond(ZoneOffset.UTC) }
          else items).take(maxPerWave)
          val last = lasthandled.get(host)
          val fresh = sorted.takeWhile { case (url, _, _) =>
            !last.exists(_.equalsIgnoreCase(url)) }
          val robots = FixtureGen.robotsFor(i)
          val (allowed, denied) = fresh.partition { case (url, _, _) =>
            robots.allows(url.substring(url.indexOf('/', 8)))
          }
          if (denied.nonEmpty) robotsDenied += (wave, host) -> denied.size
          val delay = robots.crawl_delay_ms.getOrElse(FixtureGen.crawlDelayMs(i))
          val lanes = math.max(1, FixtureGen.maxInFlight(i))
          allowed.zipWithIndex.foreach { case ((url, j, _), k) =>
            waveTasks += ((OTask(wave, host, k, url, (k / lanes).toLong * delay), i, j))
          }
          // checkpoint advance = reference catalogItems[0], but ONLY when
          // the crawl did not fail outright ("Failed as nothing
          // succeeded", ArticleCrawler.cs:200-210): a host whose every
          // scheduled fetch failed keeps its old checkpoint and retries
          val pageExists = i != FixtureGen.MissingPagesHost
          val crawlFailed = !pageExists && allowed.nonEmpty
          if (!crawlFailed)
            sorted.headOption.foreach { case (url, _, _) =>
              lasthandled += host -> url }
        }
      }
      val tasks = waveTasks.result()
      schedule ++= tasks.map(_._1)
      // insert in deterministic winner order: (host, seq) per url;
      // tasks whose page is missing from the snapshot failed to fetch
      // and never reach the store or the seen filter
      tasks.sortBy(t => (t._1.host, t._1.seq)).foreach { case (t, i, j) =>
        if (i != FixtureGen.MissingPagesHost) {
          if (!seen.contains(t.url)) {
            seen += t.url -> ((wave, t.host, FixtureGen.articleText(cfg, i, j)))
          } else {
            dedupedPerWave += wave -> (dedupedPerWave(wave) + 1)
          }
        }
      }
    }
    OResult(schedule.result(), seen, lasthandled, broken,
      robotsDenied, dedupedPerWave)
  }
}
