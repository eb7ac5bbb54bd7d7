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
    * `folded·A + C` stays below 2⁶³ for folded keys < 2³¹ in BOTH
    * engines (DuckDB errors on int64 overflow rather than wrapping, so
    * the replayable subset is the non-overflowing one). Non-numeric
    * keys must be pre-folded numerically (e.g. leading-8-hex-digit
    * md5, < 2³², still safe) before hashing. */
  private val LcgA = 1103515245L
  private val LcgC = 12345L
  private[ops] val M31 = 2147483648L // 2^31

  /** Deterministic 31-bit hash of a non-negative integer key of ANY
    * long width: the key is first folded to [0, 2³¹) so the LCG
    * multiply can never overflow int64 — a wider id would silently
    * wrap in Spark's long math but ERROR in the DuckDB oracle (ADVICE
    * r4), so the fold is part of the hash, not a caller obligation.
    * The same expression
    * `((key % 2147483648) * 1103515245 + 12345) % 2147483648` replays
    * verbatim in DuckDB (all operands non-negative, so Java pmod and
    * DuckDB `%` agree; negative keys remain outside the contract —
    * the two engines' `%` signs differ there). */
  def kmvHash(key: Column): Column =
    pmod(pmod(key.cast("long"), lit(M31)) * lit(LcgA) + lit(LcgC), lit(M31))

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

  /** Misra–Gries summary aggregator: at most k counters. `reduce` is
    * the classic decrement-all step; `merge` adds counters then
    * subtracts the (k+1)-th largest count and drops non-positives
    * (Agarwal et al., "Mergeable Summaries", PODS 2012), which
    * preserves the MG guarantee across arbitrary merge trees: every
    * item with true count > n/(k+1) survives in the summary. The
    * SUMMARY's counter values are order-dependent — only the
    * superset property is relied on; [[heavyHitters]] re-counts
    * candidates exactly, so its OUTPUT is deterministic. */
  final class MgAgg(k: Int) extends Aggregator[String, Map[String, Long], String] {
    require(k >= 1)
    override def zero: Map[String, Long] = Map.empty
    override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
      m.get(x) match {
        case Some(c) => m.updated(x, c + 1L)
        case None if m.size < k => m.updated(x, 1L)
        // decrement all, drop zeros. A single call here is O(k) (the
        // map rebuild), but AMORTIZED over the stream it is O(1)/item:
        // this branch only fires with k live counters, and each firing
        // removes exactly k units of total stored count, while the
        // other two branches each add at most 1 unit — so over n items
        // it fires ≤ n/k times, O(k) each ⇒ O(n) total (the classic MG
        // mass argument; ADVICE r4 conjectured O(n·k) from "nearly
        // every non-candidate token decrements", but a full map of
        // count-1 candidates is emptied by ONE decrement and then
        // refills over k cheap inserts — the per-item cost constant is
        // the immutable-map rebuild, not an asymptotic blow-up;
        // measured in SketchesSpec's adversarial-stream timing pin).
        case None =>
          m.flatMap { case (i, c) => if (c > 1L) Some(i -> (c - 1L)) else None }
      }
    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (i, c)) =>
        m.updated(i, m.getOrElse(i, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (i, c) =>
          if (c - cut > 0L) Some(i -> (c - cut)) else None
        }
      }
    }
    // output is the candidate KEY SET, U+0001-joined (a separator no
    // canonicalized url/token contains — documented caller contract):
    // a plain string avoids any array-encoder dependency and the
    // summary is a single bounded row anyway
    override def finish(m: Map[String, Long]): String =
      m.keys.toArray.sorted.mkString("\u0001")
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.javaSerialization[Map[String, Long]]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Exact φ-frequent items (`count·1000 ≥ phi1000·n`) in two bounded
    * passes — the heavy-hitter shape that holds at a 10^10-row stream
    * where a plain groupBy would shuffle every distinct key:
    *
    *  1. a Misra–Gries summary with k = 4·⌈1000/phi1000⌉ counters per
    *     partial state (map-side merged, O(k) rows shuffled per map
    *     task) yields a CANDIDATE set that provably contains every
    *     φ-frequent item (k > 1000/phi1000 ⇒ n/(k+1) < φn);
    *  2. the ≤k candidates come back to the driver in ONE bounded
    *     1-row fetch (same accepted pattern as the ANN query vector)
    *     and ONLY those keys are counted exactly, as an `isin` filter
    *     the scan can push down — the second pass shuffles one
    *     (key, partial-count) row per candidate per map task.
    *
    * The MG internals are merge-order-dependent but only the superset
    * property is used; the exact second pass makes the output — items
    * and counts — deterministic and equal to the plain
    * `GROUP BY / HAVING` the DuckDB oracle runs. Keys must not
    * contain U+0001 (the summary separator) — no canonicalized url or
    * whitespace token does. Returns `(item, cnt)` sorted by
    * (cnt desc, item).
    *
    * Caller contract: `df`'s lineage must be replay-stable (parquet
    * scans, deterministic transforms — the oracle-wide assumption).
    * The two passes are separate evaluations; a sampling/streaming
    * source could shift frequencies between them, and the candidate
    * set is NOT cached here because it is corpus-cardinality input,
    * not the bounded summary. Note pass 1 runs EAGERLY when this
    * function is called (a bounded 1-row fetch) — merely planning the
    * returned DataFrame has already scanned the input once. */
  def heavyHitters(df: DataFrame, key: Column, phi1000: Long): DataFrame = {
    require(phi1000 >= 1L && phi1000 <= 1000L)
    val k = 4 * (1000L / phi1000 + 1L).toInt
    val mg = udaf(new MgAgg(k), Encoders.STRING)
    val keyed = df.select(key.cast("string").as("item"))
      .where(col("item").isNotNull)
    // pass 1: MG candidates + exact total in the same single-row agg
    // (one scan); the row is bounded (≤k keys) so the driver fetch is O(k)
    val row = keyed
      .agg(mg(col("item")).as("cand"), count(lit(1)).as("n")).head()
    val cands = row.getString(0).split('\u0001').filter(_.nonEmpty).toSeq
    val n = row.getLong(1)
    // pass 2: exact counts of the candidate set only
    keyed.where(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * 1000L >= lit(phi1000) * lit(n))
      .orderBy(col("cnt").desc, col("item"))
  }
}
