package graft.ops

import graft.core.filters.BloomFilter
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media ride as opaque `binary` columns + typed metadata, and
  * the decode / feature-extract / resize / frame-sample stages are
  * per-partition batched transforms so the Spark-side plumbing — schema,
  * partitioning, batch shape — is real and testable at scale.
  *
  * ==== STUB NOTICE ====
  * No image/audio codec libraries exist in this environment, so the
  * actual byte→pixels/samples decode is STUBBED with a deterministic
  * fake (hash-derived dimensions and features). Every stub call site is
  * marked `STUB:`. Swapping in a real codec changes ONLY the inside of
  * [[decodeStub]] — schemas, partitioning and batching stay identical.
  */
object Multimodal {

  /** Decoded-media metadata row. */
  final case class MediaInfo(
      doc_id: Long,
      kind: String,      // image | audio | video
      n_bytes: Long,
      width: Int,        // STUB: hash-derived (real: decoded header)
      height: Int,
      duration_ms: Long, // 0 for images
      content_hash: Long)

  /** STUB: deterministic fake decode — derives plausible dimensions
    * from a content hash instead of real codec output. */
  def decodeStub(docId: Long, kind: String, bytes: Array[Byte]): MediaInfo = {
    val h = BloomFilter.hash64(bytes, 0x6d656469L) // fixed seed
    val w = 64 + math.floorMod(h, 1857).toInt
    val ht = 64 + math.floorMod(h >>> 17, 1017).toInt
    val dur = if (kind == "image") 0L else 1000L + math.floorMod(h >>> 31, 600000L)
    MediaInfo(docId, kind, bytes.length.toLong, w, ht, dur, h)
  }

  /** Decode stage: (doc_id, kind, media) → MediaInfo, batched per
    * partition (one codec context per partition, not per row). */
  def decode(df: DataFrame): Dataset[MediaInfo] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("kind"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // STUB: a real impl would initialize the codec library here once
        rows.map { case (id, kind, bytes) => decodeStub(id, kind, bytes) }
      }
  }

  /** Feature-extraction stage: fixed-size Float vector per media row —
    * the embedding-model shape (batch per partition; vector column is
    * `array<float>` to match the embeddings table contract). */
  def features(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // STUB: deterministic pseudo-features from rolling content hash
          val fs = new Array[Float](dim)
          var h = BloomFilter.hash64(bytes, 0x66656174L)
          var i = 0
          while (i < dim) {
            h = h * 0x9e3779b97f4a7c15L + 1
            fs(i) = ((h >>> 40).toInt % 1000) / 1000.0f
            i += 1
          }
          (id, fs)
        }
      }.toDF("doc_id", "feature")
  }

  /** Deterministic frame sampling for video-kind rows: n byte-range
    * "frames" at evenly spaced offsets (STUB for real frame decode; the
    * explode shape — one row per frame — is the real contract). */
  def sampleFrames(df: DataFrame, n: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.where(col("kind") === "video")
      .select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val len = bytes.length
        (0 until n).iterator.map { k =>
          val off = if (n == 1) 0 else (k.toLong * (len - 1) / (n - 1)).toInt
          val end = math.min(len, off + 256)
          (id, k, java.util.Arrays.copyOfRange(bytes, off, end))
        }
      }.toDF("doc_id", "frame_no", "frame")
  }

  /** Size-balanced repartitioning for heavily skewed media sizes: range-
    * partition on byte length so one partition doesn't accumulate all
    * the 4K videos while another gets the thumbnails. */
  def balanceBySize(df: DataFrame, partitions: Int): DataFrame =
    df.withColumn("_sz", length(col("media")))
      .repartitionByRange(partitions, col("_sz"), col("doc_id"))
      .drop("_sz")
}
