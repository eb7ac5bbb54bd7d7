package graft.crawl

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Drives the spark-submit entry point's body ([[CrawlJob.run]])
  * end-to-end on the synthetic fixture: flag parsing semantics, crawl +
  * snapshot-resume, and the `--delete-hosts` S9 maintenance mode. */
class CrawlJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.wholeStage", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val base = Map(
    "hosts" -> "12", "base" -> "5", "growth" -> "2", "hot" -> "2",
    "buckets" -> "4", "salt" -> "2")

  test("crawl then re-run: committed waves replay from the snapshot, not recompute") {
    val dir = Files.createTempDirectory("jobstore").toString
    val opts = base + ("store" -> dir) + ("waves" -> "2")
    val first = CrawlJob.run(spark, opts)
    assert(first.size == 2)
    assert(first.map(_.inserted).sum > 0)
    // identical invocation = snapshot-exact resume (same WaveResults,
    // no new articles)
    val again = CrawlJob.run(spark, opts)
    assert(again == first)
  }

  test("--delete-hosts without --waves is pure maintenance: cascade runs, nothing crawled") {
    val dir = Files.createTempDirectory("jobdel").toString
    val results = CrawlJob.run(spark, base + ("store" -> dir) + ("waves" -> "1"))
    assert(results.size == 1)
    val store = new SnapshotStore(dir)
    val victim = store.read(spark, "articles", 0)
      .select("host").limit(1).collect().head.getString(0)
    val del = CrawlJob.run(spark,
      base + ("store" -> dir) + ("delete-hosts" -> s" $victim ,"))
    assert(del.isEmpty, "maintenance mode must crawl zero waves")
    assert(store.read(spark, "articles", 0)
      .where(s"host = '$victim'").isEmpty)
    assert(!store.read(spark, "articles", 0).isEmpty,
      "other hosts' rows must survive the cascade")
  }

  test("--rerank-links + --max-tasks: the link-graph authority wins the budget") {
    import spark.implicits._
    val dir = Files.createTempDirectory("jobrank").toString
    val fav = FixtureGen.hostName(5)
    val sightings = (0 until 12).map(FixtureGen.hostName)
      .filter(_ != fav).map(h => (h, fav)).toDF("src", "dst")
    val sightingsPath = s"$dir/_sightings"
    sightings.write.parquet(sightingsPath)
    val r = CrawlJob.run(spark, base + ("store" -> dir) + ("waves" -> "1")
      + ("rerank-links" -> sightingsPath) + ("max-tasks" -> "3"))
    assert(r.head.scheduled == 3, "global budget must cap the wave")
    val admitted = new SnapshotStore(dir).read(spark, "frontier", 0)
      .select("host").distinct().collect().map(_.getString(0)).toSet
    assert(admitted == Set(fav),
      s"the linked-to host must win the budgeted frontier, got $admitted")
  }

  test("flag validation: missing --store, unknown store-kind, iceberg delete") {
    assertThrows[RuntimeException](CrawlJob.run(spark, base))
    assertThrows[RuntimeException](CrawlJob.run(spark,
      base + ("store" -> "/tmp/x") + ("store-kind" -> "nope")))
    // --delete-hosts is local-only: path-rewrite maintenance has no
    // Iceberg equivalent in this binding
    assertThrows[RuntimeException](CrawlJob.run(spark,
      base + ("store" -> "/tmp/x") + ("store-kind" -> "iceberg") +
        ("delete-hosts" -> "h.example.com")))
  }
}
