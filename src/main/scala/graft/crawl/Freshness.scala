package graft.crawl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-rate-driven recrawl scheduling — the freshness policy of
  * Cho & Garcia-Molina (VLDB'00/TODS'03): estimate each host's content
  * change rate from observed change events and derive when it is next
  * due. The reference recrawls on a fixed TTL
  * (`CrawlConfig.recrawlAfterWaves`, modeling its manual re-enable
  * cycle); at 10^10-URL scale a uniform TTL either hammers static
  * hosts or goes stale on fast ones, so the scheduler needs a per-host
  * estimate.
  *
  * The estimator is the deterministic integer form: with n observed
  * changes at timestamps t_1..t_n (epoch microseconds), the mean
  * inter-change interval is (t_n - t_1) div (n - 1) and the host is
  * next due at t_n + interval. Hosts observed only once carry NULL
  * interval/due (no rate evidence — callers fall back to the TTL).
  * All-integer, so a SQL oracle replays it bit-for-bit.
  *
  * Scale shape: ONE hash exchange — count/min/max are map-side
  * partial aggregates, so 10^12 change events reduce to one slim
  * (host, 4×long) row per host before the shuffle; the derived
  * columns are a pure projection on the aggregate output. No window,
  * no join, no driver collection.
  */
object Freshness {

  /** Per-host recrawl schedule from a change-event log.
    *
    * @param changes one row per observed content change
    * @param hostKey grouping column (host id or name)
    * @param ts      event timestamp column (TimestampType)
    * @return (host_id, n_changes, first_us, last_us, interval_us,
    *         next_due_us) ordered by host_id; interval/due NULL when
    *         n_changes == 1
    */
  def recrawlSchedule(changes: DataFrame, hostKey: Column, ts: Column): DataFrame =
    changes
      // parquet written without isAdjustedToUTC reads as TIMESTAMP_NTZ;
      // the cast makes it LTZ under the session zone (all graft sessions
      // pin UTC), matching a SQL oracle's naive-as-UTC epoch_us()
      .select(hostKey.as("host_id"),
        unix_micros(ts.cast("timestamp")).as("us"))
      .groupBy("host_id")
      .agg(count(lit(1)).as("n_changes"),
        min("us").as("first_us"), max("us").as("last_us"))
      .withColumn("interval_us",
        when(col("n_changes") > 1,
          expr("(last_us - first_us) div (n_changes - 1)")))
      .withColumn("next_due_us", col("last_us") + col("interval_us"))
      .orderBy("host_id")
}
