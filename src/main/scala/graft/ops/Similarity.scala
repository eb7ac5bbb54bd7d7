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

  // ---- IVF (inverted-file) ANN --------------------------------------
  // The other classic ANN scale path besides LSH: partition the vector
  // space by a small centroid codebook, store each vector under its
  // nearest centroid (the "inverted list"), and at query time search
  // only the nProbe lists nearest the query — a probe reads ~nProbe/k
  // of the store instead of all of it.
  //
  // The codebook is the table's first k vectors — a deterministic
  // "sampled centroids, no k-means refinement" IVF. Refinement changes
  // recall, not the plumbing, and an iterative k-means mean is
  // aggregation-order-dependent (its float sums differ run-to-run and
  // engine-to-engine), which would make the operator impossible to
  // value-check externally. With fixed centroids, every stage — the
  // assignment included — is pure double-precision column math the SQL
  // oracle reproduces verbatim.

  /** Left-to-right double cosine of two local vectors — same summation
    * order as the Catalyst [[cosine]] column, so driver-side codebook
    * decisions agree bit-for-bit with executor-side column math. */
  private[graft] def cosineOf(a: Seq[Float], b: Seq[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      d += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The deterministic IVF codebook: the table's FIRST `k` vectors by
    * id, fetched driver-side (k rows — the only collect on the path).
    * One definition shared by [[ivfTopK]] and
    * [[graft.ops.Dedup.semanticDedup]] so the "codebook = first k
    * vectors, sorted by id" contract both external oracles replicate
    * lives in exactly one place. No k-means refinement on purpose:
    * iterative float centroid sums are aggregation-order-dependent,
    * which would make the assignment impossible to value-check. */
  private[graft] def collectCodebook(emb: DataFrame, k: Int): Seq[(Long, Seq[Float])] =
    emb.where(col("vec_id") < k)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .sortBy(_._1)
      .toSeq

  /** Nearest-centroid id of `embedding` as a pure COLUMN over a small
    * codebook: argmax cosine, ties to the lowest centroid id — a
    * `greatest` over (cos, -cid) structs, no join and no shuffle, so
    * assignment stays inside the one table scan. */
  def ivfClusterCol(codebook: Seq[(Long, Seq[Float])]): Column = {
    require(codebook.nonEmpty, "empty IVF codebook")
    val best = greatest(codebook.map { case (cid, ce) =>
      struct(cosine(col("embedding"), typedLit(ce)).as("cos"),
        lit(-cid).as("negcid"))
    }: _*)
    (lit(0L) - best.getField("negcid")).as("cluster")
  }

  /** ANN via IVF probe: assign every vector to its nearest of the
    * first-`k` centroid codebook, search the `nProbe` lists nearest
    * the query brute-force, return top-`topK` ids.
    *
    * Scale shape: the codebook (k rows) and the query vector are the
    * ONLY driver-side fetches; assignment is a projection on the
    * single scan; the probe is a pushable `cluster IN (...)` filter +
    * TakeOrdered. In production the assigned table is written out
    * bucketed by `cluster`, making the probe a partition-pruned read. */
  def ivfTopK(emb: DataFrame, k: Int, nProbe: Int,
              queryVecId: Long, topK: Int): DataFrame = {
    val codebook = collectCodebook(emb, k)
    val q = emb.where(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getSeq[Float](0)
    val probes = codebook
      .map { case (cid, ce) => (cid, cosineOf(q, ce)) }
      .sortBy { case (cid, c) => (-c, cid) }
      .take(nProbe).map(_._1)
    emb.withColumn("cluster", ivfClusterCol(codebook))
      .where(col("cluster").isin(probes: _*) && col("vec_id") =!= queryVecId)
      .select(col("vec_id"), cosine(col("embedding"), typedLit(q)).as("cos"))
      .orderBy(col("cos").desc, col("vec_id").asc)
      .limit(topK)
      .select(col("vec_id"))
      .orderBy("vec_id")
  }
}
