package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distinct-cardinality sketching for crawl-scale analytics.
  *
  * At a 10^10-URL frontier, "how many distinct URLs/users/hosts does
  * each group hold" is a planning input (per-host budget splits, bucket
  * sizing for the seen-filter sketches, frontier growth monitoring),
  * and an exact `COUNT(DISTINCT ...)` shuffles every distinct value.
  * The KMV (k-minimum-values) sketch bounds the state to k hashes per
  * group: partial aggregates are k-element sorted arrays that merge
  * associatively, so the shuffle moves O(k) longs per group per map
  * task instead of the distinct-value stream — the same
  * partial-agg shape as `approx_count_distinct`, but with a
  * DETERMINISTIC integer hash both engines can replay, so the estimate
  * itself sits under the DuckDB oracle gate (HLL implementations
  * differ across engines; a k-min set over a shared hash cannot).
  *
  * Estimator (Bar-Yossef et al. 2002): with the k smallest distinct
  * hash values of a group in [0, 2³¹), `est = (k−1)·2³¹ div kth_min`
  * when the group reached k values, else the exact count seen.
  */
object Sketches {

  /** LCG constants (glibc rand); modulus 2³¹ — small enough that
    * `key·A + C` stays below 2⁶³ for keys < 2³¹ in BOTH engines
    * (DuckDB errors on int64 overflow rather than wrapping, so the
    * replayable subset is the non-overflowing one). Callers with wider
    * or non-numeric keys must pre-fold (e.g. leading-8-hex-digit md5,
    * < 2³², still safe) before hashing. */
  private val LcgA = 1103515245L
  private val LcgC = 12345L
  private[ops] val M31 = 2147483648L // 2^31

  /** Deterministic 31-bit hash of a non-negative integer key. The same
    * expression `(key * 1103515245 + 12345) % 2147483648` replays
    * verbatim in DuckDB (both operands non-negative, so Java pmod and
    * DuckDB `%` agree). */
  def kmvHash(key: Column): Column =
    pmod(key.cast("long") * lit(LcgA) + lit(LcgC), lit(M31))

  /** One group's finished sketch: how many of the k slots filled, the
    * k-th smallest hash, and the cardinality estimate. */
  final case class Kmv(nMins: Int, kthMin: Long, est: Long)

  /** Bounded k-min-set aggregator over pre-hashed values (k ≥ 2).
    * Buffers are sorted, duplicate-free `Array[Long]` of length ≤ k —
    * O(k) memory per group per task regardless of group size, merged
    * associatively, so Spark plans it with map-side partial
    * aggregation (the scale property the window-over-distinct
    * formulation lacks). */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Kmv] {
    require(k >= 2, "k must be >= 2 (k=1 could divide by hash 0)")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: Long): Array[Long] =
      insert(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
      b.foldLeft(a)(insert)
    override def finish(buf: Array[Long]): Kmv = {
      val n = buf.length
      if (n == 0) Kmv(0, -1L, 0L)
      // full: kth smallest ≥ k−1 ≥ 1 (k distinct values in [0,2³¹)),
      // so the division is safe
      else if (n >= k) Kmv(n, buf.last, (k - 1).toLong * M31 / buf.last)
      else Kmv(n, buf.last, n.toLong)
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      Encoders.javaSerialization[Array[Long]]
    override def outputEncoder: Encoder[Kmv] = Encoders.product[Kmv]
    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      if (buf.length >= k && h >= buf(buf.length - 1)) buf // above the cut
      else if (java.util.Arrays.binarySearch(buf, h) >= 0) buf // already in
      else {
        val merged = new Array[Long](buf.length + 1)
        val at = -(java.util.Arrays.binarySearch(buf, h) + 1)
        System.arraycopy(buf, 0, merged, 0, at)
        merged(at) = h
        System.arraycopy(buf, at, merged, at + 1, buf.length - at)
        if (merged.length > k) merged.dropRight(1) else merged
      }
    }
  }

  /** Per-group distinct-cardinality estimate:
    * `(grp, n_mins, kth_min, distinct_est)`. One hash shuffle on `grp`
    * with bounded (≤ k longs) partial states — no distinct-value
    * stream ever moves. `key` must be a non-negative integer column
    * below 2³¹ (see [[kmvHash]]); `group` is stringified for a stable
    * cross-engine sort. */
  def kmvDistinct(df: DataFrame, group: Column, key: Column,
                  k: Int = 32): DataFrame = {
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.select(group.cast("string").as("grp"), kmvHash(key).as("h"))
      .groupBy("grp").agg(kmv(col("h")).as("kmv"))
      .select(col("grp"), col("kmv.nMins").as("n_mins"),
        col("kmv.kthMin").as("kth_min"), col("kmv.est").as("distinct_est"))
      .orderBy("grp")
  }
}
