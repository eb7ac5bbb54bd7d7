package graft.crawl

import graft.core.filters.{BloomFilter, CuckooFilter}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** Partitioned Bloom-then-Cuckoo URL-seen filter (north rule).
  *
  * Replaces the reference's `UNIQUE KEY url` insert-and-skip dedup
  * (/root/reference/Source/WebCrawler/DataLayer/MySQLDataLayer.cs:190-199,
  * Source/MySQLSchema.sql:14) for lake tables that have no unique
  * indexes, while keeping the seen-set EXACT:
  *
  *  - bucket key = salted host-hash: `(hash(host) % B) * S + hash(url) % S`
  *    — host-affine so a host's URLs live in S adjacent buckets (TTL
  *    eviction per host stays cheap), salted so a hot domain spreads over
  *    S buckets instead of one (north-rule skew handling);
  *  - **Bloom**: rebuilt per wave from the committed articles table with
  *    a map-side-combining typed [[Aggregator]] (partial filters merge
  *    by OR), broadcast to the probe side — at 10^10-URL scale only
  *    probable-duplicates ever shuffle;
  *  - **Cuckoo**: the *carried* per-bucket sketch state (supports delete
  *    → recrawl TTL eviction between waves without a rebuild), updated
  *    incrementally with each wave's inserts and committed in the
  *    snapshot;
  *  - probe: `definitely new` (both sketches say no — false negatives are
  *    impossible) skips the shuffle entirely; `maybe seen` falls back to
  *    an exact left-anti join against the committed URL set, so false
  *    positives cannot lose rows.
  */
object SeenFilter {

  /** Salted bucket id. B×S total buckets. */
  def bucket(host: String, url: String, hostBuckets: Int, salt: Int): Int = {
    val hb = math.floorMod(BloomFilter.hash64(host), hostBuckets.toLong).toInt
    val s = math.floorMod(BloomFilter.hash64(url), salt.toLong).toInt
    hb * salt + s
  }

  /** Typed aggregator building one Bloom filter per group (bucket) with
    * map-side partial aggregation — the Spark-idiomatic replacement for
    * collecting URLs to the driver. Fixed geometry so partials merge. */
  final class BloomAgg(expectedPerBucket: Long, fpp: Double)
      extends Aggregator[(Int, String), BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(math.max(64L, expectedPerBucket), fpp)
    override def reduce(b: BloomFilter, a: (Int, String)): BloomFilter = {
      b.putString(a._2); b
    }
    override def merge(b1: BloomFilter, b2: BloomFilter): BloomFilter =
      b1.mergeInPlace(b2)
    override def finish(r: BloomFilter): Array[Byte] = r.serialize()
    override def bufferEncoder: Encoder[BloomFilter] =
      Encoders.javaSerialization[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build per-bucket Bloom filters from (bucket, url) pairs. */
  def buildBlooms(pairs: Dataset[(Int, String)], expectedPerBucket: Long,
                  fpp: Double = 0.01): Map[Int, Array[Byte]] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val agg = new BloomAgg(expectedPerBucket, fpp)
    pairs.groupByKey(_._1).agg(agg.toColumn.name("bloom"))
      .collect().toMap
  }

  /** Merge a wave's newly inserted (bucket, url) pairs into the carried
    * per-bucket Cuckoo sketches. Old sketches ride in as a map (they are
    * per-bucket and bounded); output covers all buckets that have state. */
  def updateCuckoos(spark: SparkSession, inserted: Dataset[(Int, String)],
                    old: Map[Int, Array[Byte]], capacity: Int): Dataset[SeenSketch] = {
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(old)
    val touched = inserted.groupByKey(_._1).mapGroups { (b, urls) =>
      val cf = bc.value.get(b).map(CuckooFilter.deserialize)
        .getOrElse(CuckooFilter.create(capacity))
      var n = 0L
      urls.foreach { case (_, u) => cf.insertString(u); n += 1 }
      SeenSketch(b, cf.serialize(), cf.size.toLong)
    }.cache()
    val touchedBuckets = touched.select("bucket").as[Int].collect().toSet
    val untouched = old.view.filterKeys(!touchedBuckets.contains(_)).toSeq
      .map { case (b, bytes) => SeenSketch(b, bytes, CuckooFilter.deserialize(bytes).size.toLong) }
    touched.unionByName(spark.createDataset(untouched))
  }
}
