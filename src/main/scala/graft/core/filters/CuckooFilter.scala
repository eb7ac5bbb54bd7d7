package graft.core.filters

/** Cuckoo filter (Fan et al., CoNEXT'14 — public paper) with 4-slot
  * buckets and 16-bit fingerprints: supports insert, lookup AND delete,
  * which the Bloom stage can't. Role in the engine (north rule
  * "Bloom-then-Cuckoo"): both sketches are carried per-bucket state
  * merged incrementally at commit (crawl.SeenFilter); the Bloom is the
  * cheap append-only pre-filter, the Cuckoo is the deletable side that
  * evicts expired recrawl-TTL urls between waves without a rebuild
  * (CrawlConfig.recrawlAfterWaves).
  *
  * Deterministic: fixed hash seeds, no RNG — the eviction "random slot"
  * is derived from the fingerprint, so state bytes are reproducible.
  */
final class CuckooFilter private (
    val numBuckets: Int, // power of two
    private val table: Array[Short], // numBuckets * 4 slots
    private var count: Int,
) extends Serializable {

  import CuckooFilter._

  def size: Int = count

  private def bucketIndex(hash: Long): Int =
    (hash & (numBuckets - 1)).toInt

  private def altIndex(idx: Int, fp: Short): Int =
    (idx ^ bucketIndex((fp & 0xffffL) * 0xc4ceb9fe1a85ec53L)) & (numBuckets - 1)

  private def slotGet(b: Int, s: Int): Short = table(b * SlotsPerBucket + s)
  private def slotSet(b: Int, s: Int, v: Short): Unit = table(b * SlotsPerBucket + s) = v

  private def tryInsertAt(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotGet(b, s) == Empty) { slotSet(b, s, fp); count += 1; return true }
      s += 1
    }
    false
  }

  def insert(hash64: Long): Boolean = {
    val fp = fingerprint(hash64)
    val i1 = bucketIndex(hash64)
    val i2 = altIndex(i1, fp)
    if (tryInsertAt(i1, fp) || tryInsertAt(i2, fp)) return true
    // relocate: deterministic slot choice seeded by the fingerprint.
    // The kick path is recorded so a failed chain can be UNDONE: the
    // classic "drop the final victim" behavior silently removes a
    // PREVIOUSLY INSERTED fingerprint while the new item stays — the
    // caller then counts the new item as dropped (n_dropped) when the
    // actually-uncovered key is some arbitrary older URL. After
    // rollback the table is bit-identical to its pre-insert state and
    // the reported drop is the real uncovered item.
    var idx = if (((fp & 0xffff) & 1) == 0) i1 else i2
    var cur = fp
    var n = 0
    val pathIdx = new Array[Int](MaxKicks)
    val pathSlot = new Array[Int](MaxKicks)
    val pathPrev = new Array[Short](MaxKicks)
    while (n < MaxKicks) {
      val slot = ((cur & 0xffff) + n) % SlotsPerBucket
      val evicted = slotGet(idx, slot)
      pathIdx(n) = idx; pathSlot(n) = slot; pathPrev(n) = evicted
      slotSet(idx, slot, cur)
      cur = evicted
      idx = altIndex(idx, cur)
      if (tryInsertAt(idx, cur)) return true
      n += 1
    }
    // table too full — caller should have sized it; undo the chain and
    // report failure for THIS item
    var u = n - 1
    while (u >= 0) { slotSet(pathIdx(u), pathSlot(u), pathPrev(u)); u -= 1 }
    false
  }

  def contains(hash64: Long): Boolean = {
    val fp = fingerprint(hash64)
    val i1 = bucketIndex(hash64)
    if (bucketHas(i1, fp)) return true
    bucketHas(altIndex(i1, fp), fp)
  }

  private def bucketHas(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotGet(b, s) == fp) return true
      s += 1
    }
    false
  }

  def delete(hash64: Long): Boolean = {
    val fp = fingerprint(hash64)
    val i1 = bucketIndex(hash64)
    if (deleteFrom(i1, fp)) return true
    deleteFrom(altIndex(i1, fp), fp)
  }

  private def deleteFrom(b: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (slotGet(b, s) == fp) { slotSet(b, s, Empty); count -= 1; return true }
      s += 1
    }
    false
  }

  def insertString(s: String): Boolean = insert(BloomFilter.hash64(s))
  def containsString(s: String): Boolean = contains(BloomFilter.hash64(s))
  def deleteString(s: String): Boolean = delete(BloomFilter.hash64(s))

  def serialize(): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + table.length * 2)
    bb.putInt(numBuckets).putInt(count)
    var i = 0
    while (i < table.length) { bb.putShort(table(i)); i += 1 }
    bb.array()
  }
}

object CuckooFilter {
  val SlotsPerBucket = 4
  val MaxKicks = 500
  val Empty: Short = 0

  /** Fingerprint in [1, 0xffff] (0 is the empty marker). */
  private def fingerprint(hash64: Long): Short = {
    val f = ((hash64 >>> 48) ^ (hash64 >>> 32)) & 0xffff
    (if (f == 0) 0x5bd1 else f).toShort
  }

  /** Capacity for n items at ~95% load of 4-slot buckets. Bucket count
    * is computed in Long and CLAMPED at 2^28 (2^30 slots ≈ 2 GiB
    * table — the practical single-array JVM ceiling): Int arithmetic
    * used to wrap for expectedItems ≳1.1e9 into a negative/zero-length
    * table. Beyond the clamp a filter reports inserts as failed
    * (n_dropped — visible, not a crash); bigger seen-sets scale OUT
    * via more hostBuckets × salt sketch buckets, not one giant table. */
  def create(expectedItems: Int): CuckooFilter = {
    val needed = math.max(1L,
      math.ceil(expectedItems.toDouble / (SlotsPerBucket * 0.95)).toLong)
    val pow2 = java.lang.Long.highestOneBit(math.max(1L, needed - 1)) * 2L
    val buckets = math.min(pow2, 1L << 28).toInt
    new CuckooFilter(buckets, new Array[Short](buckets * SlotsPerBucket), 0)
  }

  def deserialize(bytes: Array[Byte]): CuckooFilter = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buckets = bb.getInt
    val count = bb.getInt
    val table = new Array[Short](buckets * SlotsPerBucket)
    var i = 0
    while (i < table.length) { table(i) = bb.getShort; i += 1 }
    new CuckooFilter(buckets, table, count)
  }
}
