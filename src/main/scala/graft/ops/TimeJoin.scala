package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) joins — the event-attribution primitive
  * ("for each event, the latest dimension row at or before it") that
  * Spark has no native operator for. The naive encoding — an
  * inequality theta-join plus a per-row argmax — plans as a range join
  * that explodes to O(|L|·|R|) per key; this implementation is the
  * union+running-window form: one hash shuffle on the key, a
  * partition-local sort, zero row amplification.
  */
object TimeJoin {

  /** For every `left` row, attach the `payload` of the `right` row
    * with the greatest `rightTs <= leftTs` for the same `key` (null
    * when no such row exists) — DuckDB/kdb `ASOF LEFT JOIN` semantics,
    * equality inclusive.
    *
    * Mechanics: right rows ride as (key, ts, payload) tagged 0, left
    * rows tagged 1, unioned by name; a running `last(payload,
    * ignoreNulls)` window ordered by (ts, tag) fills each left row
    * with the most recent right payload (tag orders right BEFORE left
    * at equal ts, making the match inclusive). Determinism requires
    * the right side be unique per (key, ts) — pre-aggregate it (e.g.
    * max of the payload) before calling, as q53 does; a null payload
    * VALUE on a right row is indistinguishable from "no row" and is
    * skipped by ignoreNulls. A null KEY never matches (right rows with
    * a null key are dropped before the union) — ASOF's equality
    * predicate semantics, where null = null is not a match; Spark's
    * window would otherwise group the null keys together and fill
    * them against each other.
    *
    * Scale shape: ONE exchange, hash-partitioned on the key, sized by
    * |L|+|R| — the window is partition-local and streaming (running
    * frame, no full-partition buffering); the right side contributes
    * only its 3 projected columns. Hot keys cost a bigger local sort,
    * never a pair explosion. */
  def asofLookup(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 payload: String): DataFrame = {
    val r = right.select(col(key), col(rightTs).as(leftTs), col(payload))
      .where(col(key).isNotNull) // null keys never match under ASOF
      .withColumn("__tag", lit(0))
    val l = left.withColumn("__tag", lit(1))
    val w = Window.partitionBy(key)
      .orderBy(col(leftTs).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .drop("__tag")
  }
}
