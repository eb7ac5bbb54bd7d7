package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * All vector math is built from higher-order Catalyst functions
  * (`zip_with` + `aggregate`) in DOUBLE precision with left-to-right
  * summation, so results are bit-deterministic and reproducible by the
  * DuckDB oracle. No UDF in the hot path.
  */
object Similarity {

  /** Left-to-right double-precision dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k by cosine similarity to one query vector.
    * Output: (rank, vec_id) — ints only, exact to compare.
    *
    * Scale shape: one scan + a global top-k (TakeOrdered, no full
    * sort shuffle); the query vector rides as a literal/broadcast.
    */
  def bruteForceTopK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getSeq[Float](0)
    val qCol = typedLit(q)
    emb.where(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosine(col("embedding"), qCol).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("vec_id"))))
      .select(col("rank"), col("vec_id"))
      .orderBy("rank")
  }

  /** Random-hyperplane LSH bucket assignment (Charikar'02): `nBits`
    * fixed pseudo-random hyperplanes; bucket = sign-bit string. The
    * scale path for ANN: candidates = same bucket (or neighboring
    * buckets via multi-probe), searched brute-force within bucket.
    * Hyperplanes are seeded deterministically — no RNG state; `seed`
    * selects an independent hash table (OR-amplification across
    * tables, see Dedup.embeddingNearDupsLsh). seed=0 reproduces the
    * original single-table planes. */
  /** Deterministic "random" hyperplanes from splitmix64 → (-1, 1).
    * `private[graft]` so the oracle layer can emit the SAME constants
    * as SQL literals (the DuckDB oracle recomputes buckets verbatim). */
  private[graft] def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nBits) { b =>
      Array.tabulate(dim) { d =>
        var z = ((seed * 0xa24baed4963ee407L) ^ (b.toLong << 32 | d.toLong)) +
          0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        (z.toDouble / Long.MaxValue.toDouble)
      }
    }

  /** Local (driver-side) bucket of one vector — same math as the
    * column form below, left-to-right double summation. */
  private[ops] def bucketOf(v: Seq[Float], nBits: Int, seed: Long = 0L): Long = {
    val planes = hyperplanes(v.length, nBits, seed)
    planes.zipWithIndex.foldLeft(0L) { case (acc, (p, i)) =>
      var s = 0.0; var d = 0
      while (d < p.length) { s += v(d).toDouble * p(d); d += 1 }
      if (s >= 0) acc | (1L << i) else acc
    }
  }

  /** The bucket id of `embedding` as a COLUMN — a pure projection, so
    * callers attach buckets with `withColumn`/`select` on an existing
    * scan instead of joining a second scan of the vector table. */
  def bucketCol(dim: Int, nBits: Int, seed: Long = 0L): Column = {
    val planes = hyperplanes(dim, nBits, seed)
    planes.zipWithIndex
      .map { case (p, i) =>
        when(dot(col("embedding"), typedLit(p.toSeq)) >= 0, lit(1L << i))
          .otherwise(lit(0L))
      }
      .reduce(_ + _)
  }

  def lshBuckets(emb: DataFrame, dim: Int, nBits: Int,
                 seed: Long = 0L): DataFrame =
    emb.select(col("vec_id"), bucketCol(dim, nBits, seed).as("bucket"))

  /** ANN via LSH: top-k within the query's bucket (single-probe).
    * Recall < 1 by design; compare against bruteForceTopK in tests.
    * Two driver actions total — fetch the query vector (its bucket is
    * computed locally from the same hyperplanes), then the bucket-
    * filtered top-k over ONE scan (the bucket is a projection of the
    * embedding column, not a join). */
  def lshTopK(emb: DataFrame, dim: Int, nBits: Int,
              queryVecId: Long, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getSeq[Float](0)
    val qBucket = bucketOf(q, nBits)
    val withB = emb.withColumn("bucket", bucketCol(dim, nBits))
    withB.where(col("bucket") === qBucket && col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosine(col("embedding"), typedLit(q)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"))
      .orderBy("vec_id")
  }
}
