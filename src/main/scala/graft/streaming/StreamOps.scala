package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Dataset}

/** Structured Streaming surfaces of the engine — the same operators the
  * batch wave pipeline uses, expressed over unbounded inputs
  * (`readStream` → transform → `writeStream`). The reference is batch-
  * wave oriented (SURVEY.md §2.9: no watermarks/event-time processing),
  * so these are the engine's forward-looking continuous-ingest mode:
  * a frontier fed by a stream of discovered URLs instead of per-wave
  * snapshots. All transforms below work identically on batch frames
  * (tested via MemoryStream in StreamingSpec).
  */
object StreamOps {

  /** Watermarked event-time windowed counts — the continuous analog of
    * the per-wave metrics roll-up (A4). Late rows beyond the watermark
    * are dropped instead of recomputing a closed window. */
  def windowedEventCounts(events: DataFrame, window_ : String = "10 minutes",
                          watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(38,4)")).cast("double").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  /** Streaming URL-seen dedup: watermarked `dropDuplicates` on the
    * canonical url — the unbounded-input analog of the Bloom/Cuckoo +
    * anti-join batch path (state store bounded by the watermark). */
  def streamingSeenFilter(urls: DataFrame, watermark: String = "1 hour"): DataFrame =
    urls.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("url")

  final case class HostEvent(host: String, url: String, ts: Timestamp)
  final case class HostBudget(inWindow: Int, windowStart: Long)
  final case class Admission(host: String, url: String, ts: Timestamp,
                             admitted: Boolean, queue_pos: Int)

  /** Continuous per-host politeness admission — the streaming form of
    * the wave engine's scheduler: `groupByKey(host) +
    * flatMapGroupsWithState` carrying a per-host token-bucket (at most
    * `maxPerWindow` admissions per `windowMs` of event time). The state
    * value is tiny and per-host, exactly the north rule's keyed-state
    * shape. (Production: add an event-time timeout to evict idle hosts;
    * omitted here because a processing-time timeout keeps scheduling
    * empty batches, so the test harness's processAllAvailable never
    * quiesces.) */
  def politenessAdmission(events: Dataset[HostEvent], maxPerWindow: Int,
                          windowMs: Long): Dataset[Admission] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.host)
      .flatMapGroupsWithState[HostBudget, Admission](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (host: String, rows: Iterator[HostEvent], state: GroupState[HostBudget]) =>
          var st = state.getOption.getOrElse(HostBudget(0, Long.MinValue))
          val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.url)).map { e =>
            val t = e.ts.getTime
            if (t >= st.windowStart + windowMs) st = HostBudget(0, t)
            val admitted = st.inWindow < maxPerWindow
            if (admitted) st = st.copy(inWindow = st.inWindow + 1)
            Admission(host, e.url, e.ts, admitted, st.inWindow)
          }
          state.update(st)
          out.iterator
      }
  }
}
