package graft.core.filters

/** Mergeable Bloom filter over 64-bit element hashes.
  *
  * Design target (north rule): a *partitioned* URL-seen pre-filter — one
  * Bloom per host-hash bucket, built map-side with an Aggregator and
  * merged per bucket, probed before the exact anti-join so that at
  * 10^10-URL scale only probable-duplicates shuffle. False positives
  * are caught by the exact join; false negatives are impossible, so the
  * seen-set stays exact (matches the reference's UNIQUE-KEY dedup
  * semantics, /root/reference/Source/WebCrawler/DataLayer/
  * MySQLDataLayer.cs:190-199, without unique indexes on lake tables).
  *
  * Implementation: standard k-hash Bloom over a Long[] bit set, double
  * hashing h1 + i*h2 (Kirsch–Mitzenmacher), fixed seeds for
  * reproducibility across JVMs. Serializable raw to Array[Byte] so it
  * can ride in a Spark Aggregator buffer / broadcast.
  */
final class BloomFilter private (val numBits: Long, val numHashes: Int,
                                 private val words: Array[Long])
    extends Serializable {

  def put(hash64: Long): Unit = {
    var h1 = hash64
    var h2 = java.lang.Long.rotateLeft(hash64, 32) ^ 0x9e3779b97f4a7c15L
    h2 = h2 * 0xbf58476d1ce4e5b9L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63))
      i += 1
    }
  }

  def mightContain(hash64: Long): Boolean = {
    var h1 = hash64
    var h2 = java.lang.Long.rotateLeft(hash64, 32) ^ 0x9e3779b97f4a7c15L
    h2 = h2 * 0xbf58476d1ce4e5b9L
    var i = 0
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  def putString(s: String): Unit = put(BloomFilter.hash64(s))
  def mightContainString(s: String): Boolean = mightContain(BloomFilter.hash64(s))

  /** In-place union; both filters must share geometry. */
  def mergeInPlace(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes,
      s"bloom geometry mismatch: ($numBits,$numHashes) vs (${other.numBits},${other.numHashes})")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + words.length * 8)
    bb.putLong(numBits).putInt(numHashes).putInt(words.length)
    var i = 0
    while (i < words.length) { bb.putLong(words(i)); i += 1 }
    bb.array()
  }

  def bitCount: Long = { var s = 0L; var i = 0
    while (i < words.length) { s += java.lang.Long.bitCount(words(i)); i += 1 }; s }
}

object BloomFilter {
  /** Size for expected insertions at target false-positive rate. */
  def create(expectedItems: Long, fpp: Double = 0.01): BloomFilter = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val ln2 = math.log(2)
    var bits = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    bits = math.max(64L, (bits + 63) / 64 * 64)
    val k = math.max(1, math.round(bits.toDouble / expectedItems * ln2).toInt)
    new BloomFilter(bits, k, new Array[Long]((bits >>> 6).toInt))
  }

  def deserialize(bytes: Array[Byte]): BloomFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val numBits = bb.getLong
    val numHashes = bb.getInt
    val n = bb.getInt
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = bb.getLong; i += 1 }
    new BloomFilter(numBits, numHashes, words)
  }

  /** 64-bit string hash (xxHash-style avalanche over UTF-8 bytes with a
    * fixed seed) — stable across JVMs and Spark tasks. */
  def hash64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    hash64(bytes, 0x51_7c_c1_b7_27_22_0a_95L)
  }

  def hash64(bytes: Array[Byte], seed: Long): Long = {
    var h = seed ^ (bytes.length.toLong * 0xc2b2ae3d27d4eb4fL)
    var i = 0
    while (i + 8 <= bytes.length) {
      var k = 0L
      var j = 0
      while (j < 8) { k |= (bytes(i + j) & 0xffL) << (8 * j); j += 1 }
      k *= 0x87c37b91114253d5L
      k = java.lang.Long.rotateLeft(k, 31)
      k *= 0x4cf5ad432745937fL
      h ^= k
      h = java.lang.Long.rotateLeft(h, 27) * 5 + 0x52dce729
      i += 8
    }
    var k = 0L
    var j = 0
    while (i + j < bytes.length) { k |= (bytes(i + j) & 0xffL) << (8 * j); j += 1 }
    if (j > 0) {
      k *= 0x87c37b91114253d5L
      k = java.lang.Long.rotateLeft(k, 31)
      k *= 0x4cf5ad432745937fL
      h ^= k
    }
    h ^= bytes.length
    h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL
    h ^= (h >>> 33); h *= 0xc4ceb9fe1a85ec53L
    h ^= (h >>> 33)
    h
  }
}
