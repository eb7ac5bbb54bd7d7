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

  /** Cross-crawl content drift — the DIRECT change evidence a recrawl
    * policy wants when two snapshots of the page table exist (this
    * crawl vs the previous one), complementing [[recrawlSchedule]]'s
    * event-log estimate: per host, how many urls came back
    * byte-identical, changed, appeared, or vanished, plus an integer
    * change rate in per-mille. This is the Cho & Garcia-Molina change
    *-frequency input computed from observation pairs rather than a
    * change log — the form a Common-Crawl-style pipeline actually has
    * (two dated dumps), no instrumented change feed required.
    *
    * Scale shape: both sides enter as slim (host, url, digest)
    * projections — digests are computed in the snapshot scans, so page
    * BODIES never ride the join; the full-outer join shuffles on url
    * once, and the per-host roll-up is a map-side-combinable aggregate
    * over (host, 2×16-byte digest) rows. No window, no driver
    * collection; skew is bounded because the join key is the unique
    * url, never the host.
    *
    * `change_permille` = 1000·changed div (changed+unchanged) over the
    * urls observed in BOTH snapshots; NULL when no url overlaps (a
    * brand-new or fully-vanished host has no rate evidence — callers
    * fall back to the TTL, same contract as [[recrawlSchedule]]).
    *
    * @param prev earlier snapshot: (host, url, digest)
    * @param curr later snapshot: same columns
    */
  def contentDrift(prev: DataFrame, curr: DataFrame): DataFrame = {
    val a = prev.select(col("host").as("host_a"), col("url"),
      col("digest").as("dig_a"))
    val b = curr.select(col("host").as("host_b"), col("url"),
      col("digest").as("dig_b"))
    val both = col("dig_a").isNotNull && col("dig_b").isNotNull
    a.join(b, Seq("url"), "full_outer")
      .select(coalesce(col("host_a"), col("host_b")).as("host"),
        col("dig_a"), col("dig_b"))
      .groupBy("host")
      .agg(
        sum(when(both && col("dig_a") === col("dig_b"), 1L)
          .otherwise(0L)).as("n_unchanged"),
        sum(when(both && col("dig_a") =!= col("dig_b"), 1L)
          .otherwise(0L)).as("n_changed"),
        sum(when(col("dig_a").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("dig_b").isNull, 1L).otherwise(0L)).as("n_gone"))
      .withColumn("change_permille",
        when(col("n_changed") + col("n_unchanged") > 0,
          expr("1000 * n_changed div (n_changed + n_unchanged)")))
      .orderBy("host")
  }

  /** Turn [[contentDrift]] output into a recrawl schedule consumable by
    * [[applySchedule]]: interval inversely proportional to the observed
    * change rate, clamped to [1×, 8×] the base interval —
    * `interval_us = base·1000 div max(change_permille, 125)`, so a host
    * whose every overlapping url changed recrawls at the base cadence
    * and a fully-static host waits 8× as long. All-integer (a SQL
    * oracle replays it bit-for-bit); hosts with NULL rate evidence keep
    * NULL interval/due, which [[applySchedule]] treats as due-now (the
    * TTL fallback). Pure projection + rename — no shuffle.
    */
  def driftSchedule(drift: DataFrame, nowUs: Long,
                    baseIntervalUs: Long): DataFrame =
    drift
      .withColumn("interval_us",
        when(col("change_permille").isNotNull,
          expr(s"${baseIntervalUs * 1000L} div greatest(change_permille, 125)")))
      .withColumn("next_due_us", lit(nowUs) + col("interval_us"))
      .withColumnRenamed("host", "host_id")

  /** Gate a wave's host dimension on the recrawl schedule — the bridge
    * from the offline [[recrawlSchedule]] job to the engine: a host
    * whose `next_due_us` lies in the future is flipped `enabled=false`
    * for this wave (the engine's disabled-host semantics carry its
    * state forward untouched — pinned by WaveEdgeSpec); hosts that are
    * due, have no rate evidence (NULL next-due), or are absent from the
    * schedule crawl normally (the TTL fallback the scaladoc above
    * promises). A host already disabled in the config stays disabled —
    * the schedule only ever removes work, never re-enables.
    *
    * Scale shape: the schedule side is slim (host, long) — one hash
    * join against the host dimension, broadcastable whenever the seed
    * list is; column order and types are preserved so the result stays
    * encodable as the engine's host-config row.
    *
    * @param hosts    host-config table; must carry `host` and a boolean
    *                 `enabled` column
    * @param schedule [[recrawlSchedule]] output whose `host_id` values
    *                 match `hosts.host`
    * @param nowUs    the wave's logical clock, epoch microseconds
    */
  def applySchedule(hosts: DataFrame, schedule: DataFrame,
                    nowUs: Long): DataFrame = {
    val due = schedule.select(col("host_id").cast("string").as("fr_host"),
      col("next_due_us").as("fr_due"))
    val cols = hosts.columns.map {
      case "enabled" =>
        (col("enabled") &&
          (col("fr_due").isNull || col("fr_due") <= lit(nowUs)))
          .as("enabled")
      case c => hosts(c)
    }
    hosts.join(due, hosts("host") === due("fr_host"), "left")
      .select(cols.toIndexedSeq: _*)
  }
}
