package graft.crawl

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S11 — cross-database table copy, the Spark re-expression of the
  * reference's instance-to-instance copy tooling
  * (/root/reference/Source/WebCrawler.WPF/ViewModels/ManageViewModel.cs
  * crosscopy command; MySQLDataLayer bulk read/insert paths).
  *
  * Written entirely against Spark's own JDBC surface
  * (`DataFrameReader.jdbc` / `DataFrameWriter.jdbc`). RUNTIME-VERIFIED
  * in this sandbox against embedded Derby (which ships with Spark):
  * CrossStoreCopySpec drives both the full range-partitioned copy and
  * the incremental watermark path end-to-end across two in-memory
  * databases. Production targets (MySQL/Postgres) only need their
  * driver jar on the executor classpath — the code path is identical.
  *
  * Scale shape: the read is RANGE-PARTITIONED on a numeric key so the
  * source table streams through `numPartitions` parallel cursors
  * instead of one; the write batches per partition. No driver-side
  * materialization at any size.
  */
object CrossStoreCopy {

  final case class JdbcEndpoint(
      url: String,                 // jdbc:mysql://host/db, jdbc:postgresql://…
      user: String,
      password: String,
      driver: Option[String] = None) {
    def props: Properties = {
      val p = new Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      driver.foreach(p.setProperty("driver", _))
      p
    }
  }

  /** Parallel partitioned read of one source table. `keyColumn` must be
    * numeric-ish (the reference tables key on AUTO_INCREMENT ids). */
  def readTable(spark: SparkSession, src: JdbcEndpoint, table: String,
      keyColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(src.url, table, keyColumn,
      lowerBound, upperBound, numPartitions, src.props)

  /** Copy a table across instances. `mode` Append mirrors the
    * reference's insert-ignore semantics when the destination carries
    * the same UNIQUE keys (duplicate rows fail the batch there — use
    * [[copyTableIncremental]] to pre-filter). */
  def copyTable(spark: SparkSession, src: JdbcEndpoint, dst: JdbcEndpoint,
      table: String, keyColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, mode: SaveMode = SaveMode.Append): Unit =
    readTable(spark, src, table, keyColumn, lowerBound, upperBound, numPartitions)
      .write.mode(mode).jdbc(dst.url, table, dst.props)

  /** Incremental copy: only source rows whose key exceeds the
    * destination's max — one scalar query against the destination, then
    * a bounded partitioned read. The watermark predicate is pushed into
    * the source query itself via a `dbtable` subquery: Spark's JDBC
    * lowerBound/upperBound only set partition STRIDES — the first and
    * last partitions get open-ended predicates and would re-read (and
    * re-append) every pre-watermark row. The reference's incremental
    * copy walks pages of 50 rows (PAGER_PAGE_SIZE); this moves the
    * split planning into Spark's JDBC partitioning instead. */
  def copyTableIncremental(spark: SparkSession, src: JdbcEndpoint,
      dst: JdbcEndpoint, table: String, keyColumn: String,
      numPartitions: Int): Unit = {
    val maxDf = spark.read.jdbc(dst.url,
      s"(SELECT COALESCE(MAX($keyColumn), 0) AS mx FROM $table) t", dst.props)
    def asLong(row: org.apache.spark.sql.Row): Long =
      row.get(0) match { case n: Number => n.longValue; case _ => 0L }
    val watermark = asLong(maxDf.head())
    val srcMaxDf = spark.read.jdbc(src.url,
      s"(SELECT COALESCE(MAX($keyColumn), 0) AS mx FROM $table) t", src.props)
    val srcMax = asLong(srcMaxDf.head())
    if (srcMax > watermark) {
      val delta =
        s"(SELECT * FROM $table WHERE $keyColumn > $watermark) ${table}_delta"
      readTable(spark, src, delta, keyColumn,
        watermark + 1, srcMax, numPartitions)
        .write.mode(SaveMode.Append).jdbc(dst.url, table, dst.props)
    }
  }
}
