package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media ride as opaque `binary` columns + typed metadata, and
  * the decode / feature-extract / frame-sample stages are per-partition
  * batched transforms so the Spark-side plumbing — schema, partitioning,
  * batch shape — holds at corpus scale.
  *
  * The decode stage is REAL header parsing ([[MediaHeaders]]): PNG IHDR
  * / JPEG SOFn dimensions, WAV and AVI durations — pure byte arithmetic,
  * no codec libraries, total over malformed input (bad blobs probe as
  * `unknown`, never throw). What remains deliberately shallow, and is
  * documented per method, is everything that genuinely needs a codec:
  * pixel decoding behind [[features]]' deterministic featurizer seam and
  * real frame extraction behind [[sampleFrames]]' byte-range sampler.
  */
object Multimodal {

  /** Decoded-media metadata row: `kind` is the caller's modality tag
    * (image | audio | video), `container` the PARSED format
    * (png | jpeg | wav | avi | unknown); width/height are 0 for audio
    * and unparseable blobs, duration_ms is 0 for images. */
  final case class MediaInfo(
      doc_id: Long,
      kind: String,
      container: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long)

  /** Decode stage: (doc_id, kind, media) → [[MediaInfo]] via real
    * container-header parsing, batched per partition (the shape under
    * which a full codec would initialize its context once per
    * partition, not per row). */
  def decode(df: DataFrame): Dataset[MediaInfo] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("kind"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          MediaHeaders.probe(bytes) match {
            case Some(p) => MediaInfo(id, kind, p.container,
              bytes.length.toLong, p.width, p.height, p.durationMs)
            case None => MediaInfo(id, kind, "unknown",
              bytes.length.toLong, 0, 0, 0L)
          }
        }
      }
  }

  /** Feature-extraction stage: fixed-size Float vector per media row —
    * the embedding-model SEAM. The default featurizer is a
    * deterministic byte fingerprint (md5 hex slices scaled to [0,1);
    * every value k/256 is an exact binary fraction, so an external SQL
    * oracle recomputing in double matches bit-for-bit); a real
    * embedding model binds by replacing only the per-row body — the
    * batch-per-partition shape, `array<float>` column contract
    * (matching the embeddings table) and partitioning stay identical.
    * No pixel/sample decode happens here: that needs a codec library
    * this environment does not ship. */
  def features(df: DataFrame, dim: Int = 16): DataFrame = {
    require(dim <= 16, s"default featurizer supports dim <= 16 (got $dim): " +
      "one md5 yields 16 two-hex-digit slices")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { case (id, bytes) =>
          md.reset()
          val d = md.digest(bytes)
          val fs = new Array[Float](dim)
          var i = 0
          while (i < dim) { fs(i) = (d(i) & 0xff) / 256.0f; i += 1 }
          (id, fs)
        }
      }.toDF("doc_id", "feature")
  }

  /** Deterministic frame sampling for video-kind rows: n byte-range
    * "frames" at evenly spaced offsets. Real frame extraction needs a
    * video codec; the explode shape — one row per frame, evenly spaced
    * over the payload — is the contract a codec-backed implementation
    * drops into. */
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

  /** Deterministic synthetic media table `(doc_id, kind, media)` over a
    * `doc_id` column — the q39 fixture: every blob is a REAL container
    * header ([[MediaHeaders]] synthesizers) whose probed fields are
    * exact arithmetic in doc_id, so the DuckDB oracle reconstructs the
    * whole decode output from the ids alone (the q72 CDX pattern):
    *
    *  - doc_id % 3 = 0 → image: PNG when doc_id % 6 = 0 else JPEG,
    *    width = 64 + doc_id % 1857, height = 64 + doc_id % 1017;
    *  - doc_id % 3 = 1 → audio: WAV, duration_ms = 1000 + (doc_id % 600)·100;
    *  - doc_id % 3 = 2 → video: AVI at 30 fps·µs (33333 µs/frame),
    *    frames = 30·(1 + doc_id % 300), image-formula dimensions.
    */
  def syntheticMedia(docIds: DataFrame): DataFrame = {
    val spark = docIds.sparkSession
    import spark.implicits._
    docIds.select(col("doc_id").cast("long")).as[Long]
      .mapPartitions(_.map { i =>
        val w = (64 + i % 1857).toInt
        val h = (64 + i % 1017).toInt
        (i % 3) match {
          case 0 =>
            val blob = if (i % 6 == 0) MediaHeaders.pngBytes(w, h)
                       else MediaHeaders.jpegBytes(w, h)
            (i, "image", blob)
          case 1 =>
            // byte_rate = rate·ch·2 is a multiple of 1000 for every
            // rate below, so the duration reconstructs exactly
            val rate = 8000 * (1 + (i % 5)).toInt
            val ch = (1 + (i / 5) % 2).toInt
            (i, "audio", MediaHeaders.wavBytes(rate, ch, 1000L + (i % 600) * 100L))
          case _ =>
            (i, "video", MediaHeaders.aviBytes(w, h, 33333L, 30L * (1 + i % 300)))
        }
      }).toDF("doc_id", "kind", "media")
  }
}
