package graft.streaming

import graft.crawl.{CrawlConfig, FixtureGen, FrontierStore, HostConfig, Page, WaveEngine}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Continuous-ingest crawl: the batch wave engine driven by Structured
  * Streaming. Each arriving micro-batch of page snapshots becomes one
  * WAVE (`readStream` → `foreachBatch` → `WaveEngine.runWave`), so the
  * politeness scheduler, seen filter, checkpointing and metrics are the
  * SAME code the batch job runs — the stream only supplies the input
  * cadence.
  *
  * Exactly-once: the wave id IS the micro-batch id. When a failed batch
  * replays, `runWave` sees the wave already committed in the
  * [[FrontierStore]] manifest and returns the stored result instead of
  * recomputing — the engine's snapshot-resume path doubles as the
  * streaming idempotence guard (plus Spark's own checkpointLocation for
  * source offsets).
  */
object CrawlStream {

  def start(
      spark: SparkSession,
      store: FrontierStore,
      pages: Dataset[Page],          // streaming Dataset (isStreaming)
      hosts: Dataset[HostConfig],
      robots: Dataset[graft.crawl.RobotsRow],
      cfg: CrawlConfig,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(pages.isStreaming, "pages must be a streaming Dataset")
    pages.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Page], batchId: Long) =>
        WaveEngine.runWave(spark, store, batch, hosts, robots,
          batchId.toInt, cfg)
        ()
      }
      .start()
  }
}
