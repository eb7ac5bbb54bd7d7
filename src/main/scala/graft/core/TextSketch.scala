package graft.core

import graft.core.filters.BloomFilter
import java.util.Locale

/** Pure-Scala document sketches for near-duplicate detection at scale:
  * word shingles, MinHash signatures + LSH band hashes (Broder'97 /
  * Mining of Massive Datasets ch.3 — public algorithms), and 64-bit
  * SimHash (Charikar'02). Deterministic: fixed seeds, no RNG state.
  *
  * Used from Spark via deterministic JVM UDFs (one call per document —
  * the per-document sketch needs no distributed aggregation; only the
  * candidate-pair join is relational).
  */
object TextSketch {

  /** splitmix64 finalizer — cheap independent "permutations". */
  @inline private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  // explicit whitespace class (== Java \s) so the split is
  // engine-identical with the DuckDB RE2 oracle, which excludes \x0B
  // from its \s — see graft.ops.TextOps.WsClass
  private val Ws = "[ \\t\\n\\x0B\\f\\r]+"

  def tokens(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.toLowerCase(Locale.ROOT).split(Ws).filter(_.nonEmpty)

  /** Distinct hashes of word n-gram shingles. */
  def shingleHashes(text: String, n: Int): Array[Long] = {
    val ts = tokens(text)
    if (ts.length < n) return Array.empty
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + n <= ts.length) {
      var h = 0x51_7c_c1_b7_27_22_0a_95L
      var j = 0
      while (j < n) { h = mix64(h ^ BloomFilter.hash64(ts(i + j))); j += 1 }
      out.add(h)
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = it.next(); k += 1 }
    arr
  }

  /** MinHash signature: numPerms independent min-hashes of the
    * shingle set. Empty set → all Long.MaxValue. */
  def minhashSignature(shingles: Array[Long], numPerms: Int): Array[Long] = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h = shingles(i)
      var p = 0
      while (p < numPerms) {
        val v = mix64(h ^ (p.toLong * 0xc2b2ae3d27d4eb4fL))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /** LSH band hashes: one 64-bit hash per band of `rowsPerBand`
    * signature entries. Docs sharing ANY band hash are candidates. */
  def bandHashes(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    val bands = sig.length / rowsPerBand
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x27d4eb2f165667c5L + b
      var r = 0
      while (r < rowsPerBand) { h = mix64(h ^ sig(b * rowsPerBand + r)); r += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Exact Jaccard between two sorted distinct hash arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    var i = 0; var j = 0; var common = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { common += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    common.toDouble / (a.length + b.length - common)
  }

  /** 60-bit SimHash over token occurrences (repeats count, ±1 each;
    * a bit is set when its signed sum is strictly positive).
    *
    * The per-token hash is the leading 15 hex digits of md5(token) —
    * NOT an in-house mixer — precisely so an external SQL engine can
    * recompute the whole fingerprint from the raw text: q27's DuckDB
    * oracle rebuilds it token-for-token, bit-for-bit (integer math
    * only, no float drift possible). 60 bits because 15 hex digits is
    * the widest md5 slice that parses as a non-negative signed 64-bit
    * value on both sides. */
  def simhash60(text: String): Long = {
    val ts = tokens(text)
    if (ts.isEmpty) return 0L
    val md = java.security.MessageDigest.getInstance("MD5")
    val acc = new Array[Int](60)
    var i = 0
    while (i < ts.length) {
      md.reset()
      val d = md.digest(ts(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex digits = bytes 0..6 plus the high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h >>>= 4
      var bit = 0
      while (bit < 60) {
        if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** 15-bit bands of a 60-bit simhash for candidate bucketing: two
    * sketches within hamming distance 3 share at least one of the 4
    * bands (pigeonhole). Band id rides in the high bits so different
    * bands never collide. */
  def simhashBands(sim: Long): Array[Int] =
    Array.tabulate(4)(b => (((sim >>> (15 * b)) & 0x7fffL) | (b.toLong << 15)).toInt)
}
