package graft.ops

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

  /** Lowercase hex MD5 — the stub's hash base. MD5 (not our own mixer)
    * so an external SQL oracle (DuckDB `md5`) can recompute every
    * stub-derived field from the raw bytes and value-check the decode
    * query end-to-end. */
  private def md5Hex(md: java.security.MessageDigest, bytes: Array[Byte]): String = {
    md.reset()
    val d = md.digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      val v = d(i) & 0xff
      sb.append(Character.forDigit(v >>> 4, 16)).append(Character.forDigit(v & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** STUB: deterministic fake decode — derives plausible dimensions
    * from hex slices of md5(bytes) instead of real codec output (each
    * slice is 15 hex digits = 60 bits, so it parses as a non-negative
    * Long and as a SQL BIGINT identically). One md5 yields only 32 hex
    * digits, so the third slice [16,31) deliberately overlaps the
    * second [15,30) — duration therefore correlates with height across
    * rows. Fine here: the stub is a PLUMBING contract (schema, batch
    * shape, oracle parity — pinned in SparkEntrySpec), not a realism
    * model; don't use its fields for distribution tests. */
  def decodeStub(docId: Long, kind: String, bytes: Array[Byte],
                 md: java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")): MediaInfo = {
    val hex = md5Hex(md, bytes)
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
    val h3 = java.lang.Long.parseLong(hex.substring(16, 31), 16)
    val w = 64 + (h1 % 1857).toInt
    val ht = 64 + (h2 % 1017).toInt
    val dur = if (kind == "image") 0L else 1000L + h3 % 600000L
    MediaInfo(docId, kind, bytes.length.toLong, w, ht, dur, h1)
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
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, kind, bytes) => decodeStub(id, kind, bytes, md) }
      }
  }

  /** Feature-extraction stage: fixed-size Float vector per media row —
    * the embedding-model shape (batch per partition; vector column is
    * `array<float>` to match the embeddings table contract). */
  def features(df: DataFrame, dim: Int = 16): DataFrame = {
    require(dim <= 16, s"stub features support dim <= 16 (got $dim): " +
      "one md5 yields 16 two-hex-digit slices")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          // STUB: feature i = hex byte i of md5(bytes) / 256 — exactly
          // representable in binary floating point at any width, so an
          // external oracle recomputing in double matches bit-for-bit
          val hex = md5Hex(md, bytes)
          val fs = new Array[Float](dim)
          var i = 0
          while (i < dim) {
            fs(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16) / 256.0f
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
