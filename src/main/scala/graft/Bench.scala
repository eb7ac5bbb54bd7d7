package graft

import java.nio.file.Files

import graft.crawl.{CrawlConfig, FixtureCfg, FixtureGen, SnapshotStore, WaveEngine}
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":<sec>,"unit":"sec","queries":{...},"sf":...,
  *  "crawl":{"urls_8":N,"sec_8":s,"ups_8":r,"urls_32":N,"sec_32":s,
  *           "ups_32":r,"scaling_efficiency":e}}
  *
  * Two parts:
  *  1. the SparkEntry query surface timed at local[32] on
  *     SPARK_GRAFT_SF_DIR (driver contract);
  *  2. the crawl-wave engine on a deterministic synthetic frontier run
  *     at TWO parallelism levels — local[8] then local[32] on the SAME
  *     input — the sandbox stand-in for the north rule's N→4N-executor
  *     scaling criterion. ups = URLs fetched+deduped/sec;
  *     efficiency = (ups_32/ups_8)/4.
  */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "8g")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One crawl benchmark run: fresh store, `waves` waves over the
    * synthetic fixture; returns (urls inserted+deduped, seconds). */
  private def crawlRun(spark: SparkSession, fx: FixtureCfg, waves: Int,
                       cc: CrawlConfig): (Long, Double) = {
    val store = new SnapshotStore(
      Files.createTempDirectory("benchstore").toString)
    val t0 = System.nanoTime()
    val results = WaveEngine.run(spark, store,
      w => FixtureGen.pages(spark, fx, w),
      FixtureGen.hosts(spark, fx), FixtureGen.robots(spark, fx), waves, cc)
    val sec = (System.nanoTime() - t0) / 1e9
    // throughput basis: every URL the engine fetched and pushed through
    // extract + seen-filter (inserted + deduped)
    (results.map(r => r.inserted + r.deduped).sum, sec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // ---- part 1: query surface at local[32] -------------------------
    var spark = session(32)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // ---- part 2: crawl scaling local[8] vs local[32] -----------------
    val fx = FixtureCfg(nHosts = 120, baseArticles = 220,
      growthPerWave = 60, hotHostFactor = 12)
    val cc = CrawlConfig(maxPerHostPerWave = 400, hostBuckets = 16,
      salt = 4, expectedUrlsPerBucket = 50000, cuckooCapacityPerBucket = 1 << 15)
    val waves = 2
    // warm JIT/codegen once at local[32] (excluded from both timings)
    crawlRun(spark, FixtureCfg(nHosts = 12, baseArticles = 20), waves, cc)
    spark.stop()

    spark = session(8)
    val (urls8, sec8) = crawlRun(spark, fx, waves, cc)
    spark.stop()

    spark = session(32)
    val (urls32, sec32) = crawlRun(spark, fx, waves, cc)
    spark.stop()

    val ups8 = urls8 / sec8
    val ups32 = urls32 / sec32
    val eff = (ups32 / ups8) / 4.0
    val crawlJson =
      f"""{"urls_8":$urls8,"sec_8":$sec8%.2f,"ups_8":$ups8%.1f,""" +
        f""""urls_32":$urls32,"sec_32":$sec32%.2f,"ups_32":$ups32%.1f,""" +
        f""""scaling_efficiency":$eff%.3f}"""

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","crawl":$crawlJson}""")
  }
}
