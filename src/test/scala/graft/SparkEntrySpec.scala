package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val dir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run non-empty on sf0.001") {
    val empties = SparkEntry.queries.flatMap { case (name, fn) =>
      val n = fn(spark, dir).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("q22 ann topk returns exactly k ranked rows") {
    val rows = SparkEntry.queries("q22_ann_topk")(spark, dir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
  }

  test("q27 simhash pairs respect the hamming bound") {
    val rows = SparkEntry.queries("q27_simhash")(spark, dir).collect()
    assert(rows.forall(_.getAs[Int]("dist") <= 3))
  }

  test("q26 minhash candidates verify against exact jaccard >= 0.5") {
    import graft.core.TextSketch
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = SparkEntry.queries("q26_minhash_lsh")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = TextSketch.shingleHashes(docs(r.getAs[Long]("doc_a")), 3)
      val b = TextSketch.shingleHashes(docs(r.getAs[Long]("doc_b")), 3)
      assert(TextSketch.jaccard(a, b) >= 0.5)
    }
  }

  test("q20 exact dedup row count equals distinct normalized texts") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val distinctTexts = docs
      .select(lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("t"))
      .distinct().count()
    val dedup = SparkEntry.queries("q20_exact_dedup")(spark, dir).count()
    assert(dedup == distinctTexts)
  }
}
