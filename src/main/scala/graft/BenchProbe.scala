package graft

import java.nio.file.Files

import graft.crawl.{CrawlConfig, FixtureCfg, FixtureGen, SnapshotStore, WaveEngine}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Diagnostic main for the N→4N scaling investigation: runs the bench
  * crawl at two parallelism levels with a SparkListener that attributes
  * wall-clock to jobs and splits task time into run/GC/deserialize/
  * shuffle components. NOT part of the driver contract — a lab tool.
  *
  * Usage: sbt "runMain graft.BenchProbe [nLo] [nHi] [hosts] [base]"
  */
object BenchProbe {

  final class Probe extends SparkListener {
    final case class JobAgg(var wallMs: Long = 0L, var tasks: Int = 0,
        var runMs: Long = 0L, var cpuMs: Long = 0L, var gcMs: Long = 0L,
        var deserMs: Long = 0L, var shuffleWaitMs: Long = 0L,
        var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, JobAgg]
    private val jobStart = mutable.Map.empty[Int, Long]
    private val stageToJob = mutable.Map.empty[Int, Int]

    override def onJobStart(j: SparkListenerJobStart): Unit = synchronized {
      jobStart(j.jobId) = j.time
      j.stageIds.foreach(s => stageToJob(s) = j.jobId)
      val agg = jobs.getOrElseUpdate(j.jobId, JobAgg())
      agg.desc = Option(j.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("")
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = synchronized {
      jobs.get(j.jobId).foreach(a =>
        a.wallMs = j.time - jobStart.getOrElse(j.jobId, j.time))
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val jid = stageToJob.getOrElse(t.stageId, -1)
      val a = jobs.getOrElseUpdate(jid, JobAgg())
      a.tasks += 1
      val m = t.taskMetrics
      if (m != null) {
        a.runMs += m.executorRunTime
        a.cpuMs += m.executorCpuTime / 1000000L
        a.gcMs += m.jvmGCTime
        a.deserMs += m.executorDeserializeTime
        a.shuffleWaitMs += m.shuffleReadMetrics.fetchWaitTime
      }
    }
    def report(): String = synchronized {
      val rows = jobs.toSeq.sortBy(-_._2.wallMs).take(sys.env.getOrElse("PROBE_TOPN", "18").toInt).map { case (id, a) =>
        f"  job$id%3d wall=${a.wallMs / 1000.0}%7.2fs tasks=${a.tasks}%4d " +
          f"run=${a.runMs / 1000.0}%8.1fs cpu=${a.cpuMs / 1000.0}%8.1fs " +
          f"gc=${a.gcMs / 1000.0}%6.1fs " +
          f"deser=${a.deserMs / 1000.0}%6.1fs shufWait=${a.shuffleWaitMs / 1000.0}%5.1fs " +
          s"${a.desc.take(70)}"
      }
      val totWall = jobs.valuesIterator.map(_.wallMs).sum / 1000.0
      val totRun = jobs.valuesIterator.map(_.runMs).sum / 1000.0
      val totCpu = jobs.valuesIterator.map(_.cpuMs).sum / 1000.0
      val totGc = jobs.valuesIterator.map(_.gcMs).sum / 1000.0
      f"  TOTAL jobWall=$totWall%.2fs taskRun=$totRun%.1fs taskCpu=$totCpu%.1fs gc=$totGc%.1fs " +
        f"jobs=${jobs.size}\n" + rows.mkString("\n")
    }
  }

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", TempDirs.cleanupOnExit(
        Files.createTempDirectory("benchlocal").toString))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.codegen.wholeStage",
        sys.env.getOrElse("PROBE_CODEGEN", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val nLo = args.lift(0).map(_.toInt).getOrElse(4)
    val nHi = args.lift(1).map(_.toInt).getOrElse(16)
    val hosts = args.lift(2).map(_.toInt).getOrElse(100)
    val base = args.lift(3).map(_.toInt).getOrElse(600)
    val fx = FixtureCfg(nHosts = hosts, baseArticles = base,
      growthPerWave = base / 4, hotHostFactor = 10)
    // Round-4 feature-soak knobs (all default-off → round-3-identical
    // config): PROBE_TTL=<waves> turns on recrawl TTL eviction,
    // PROBE_REVALIDATE=1 the digest revalidation path, PROBE_ADAPTIVE=
    // <factor> the politeness EWMA back-off — so the soak can measure
    // the engine with every round-4 path hot, not just defaults.
    val cc = CrawlConfig(maxPerHostPerWave = base * 2, hostBuckets = 16,
      salt = 4, expectedUrlsPerBucket = 100000,
      cuckooCapacityPerBucket = 1 << 16,
      recrawlAfterWaves = sys.env.getOrElse("PROBE_TTL", "0").toInt,
      revalidateOnRecrawl = sys.env.get("PROBE_REVALIDATE").contains("1"),
      adaptiveDelayFactor =
        sys.env.getOrElse("PROBE_ADAPTIVE", "0").toDouble)
    val waves = sys.env.getOrElse("PROBE_WAVES", "2").toInt
    TempDirs.sweepStale()
    val pagesDir = TempDirs.cleanupOnExit(
      Files.createTempDirectory("probepages").toString)

    // materialize input + warm JIT at full width
    var spark = session(32)
    (0 until waves).foreach(w => FixtureGen.pagesParquet(spark, fx, w, pagesDir))
    val warmStore = new SnapshotStore(TempDirs.cleanupOnExit(
      Files.createTempDirectory("probewarm").toString))
    WaveEngine.run(spark, warmStore,
      w => FixtureGen.pagesParquet(spark, fx, w, pagesDir),
      FixtureGen.hosts(spark, fx), FixtureGen.robots(spark, fx), 1, cc)
    spark.stop()

    (if (sys.env.contains("PROBE_ONCE")) Seq(nLo) else Seq(nLo, nHi, nLo, nHi)).foreach { n =>
      spark = session(n)
      val probe = new Probe
      spark.sparkContext.addSparkListener(probe)
      val store = new SnapshotStore(TempDirs.cleanupOnExit(
        Files.createTempDirectory("probestore").toString))
      val t0 = System.nanoTime()
      val res = WaveEngine.run(spark, store,
        w => FixtureGen.pagesParquet(spark, fx, w, pagesDir),
        FixtureGen.hosts(spark, fx), FixtureGen.robots(spark, fx), waves, cc)
      val sec = (System.nanoTime() - t0) / 1e9
      val urls = res.map(r => r.inserted + r.deduped).sum
      Thread.sleep(500) // let listener drain
      println(f"== local[$n] wall=$sec%.2fs urls=$urls ups=${urls / sec}%.0f")
      println(probe.report())
      spark.stop()
    }
  }
}
