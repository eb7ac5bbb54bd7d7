package graft.crawl

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** RUNTIME exercise of the S11 cross-store copy seam. Round-2 verdict
  * flagged CrossStoreCopy as compile-time-only ("has never executed —
  * no JDBC driver jars in the sandbox"); Spark in fact ships Derby
  * (its Hive-metastore engine), so the seam runs here end-to-end
  * against two embedded in-memory Derby databases: real JDBC reads
  * with range partitioning, real JDBC writes, and the incremental
  * watermark path — including the review's headline scenario (the
  * pre-watermark rows must NOT be re-read/re-appended).
  *
  * Identifier note: Derby folds unquoted identifiers to UPPERCASE and
  * Spark's JDBC writer quotes column names verbatim, so the fixture
  * uses uppercase names throughout to stay consistent across the
  * unquoted SQL in copyTableIncremental and the quoted DDL Spark
  * emits when it creates the destination table.
  */
class CrossStoreCopySpec extends AnyFunSuite {

  System.setProperty("derby.stream.error.field", "java.lang.System.err")

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private def ep(url: String) =
    CrossStoreCopy.JdbcEndpoint(url, "app", "", Some(Driver))

  private def withConn[T](url: String)(f: java.sql.Connection => T): T = {
    val c = java.sql.DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def seedSrc(url: String, ids: Range): Unit = withConn(url) { c =>
    val st = c.createStatement()
    try st.execute(
      "CREATE TABLE HOSTS (ID BIGINT PRIMARY KEY, HOST VARCHAR(64), RNK INT)")
    catch { case _: java.sql.SQLException => () } // already exists
    val ps = c.prepareStatement("INSERT INTO HOSTS VALUES (?, ?, ?)")
    ids.foreach { i =>
      ps.setLong(1, i.toLong); ps.setString(2, s"h$i.example.com")
      ps.setInt(3, i % 7); ps.addBatch()
    }
    ps.executeBatch(); ()
  }

  private def dstIds(url: String): Seq[Long] =
    spark.read.jdbc(url, "HOSTS", ep(url).props)
      .select("ID").collect().map(_.getLong(0)).toSeq

  test("copyTable: range-partitioned JDBC read, full row parity at the destination") {
    val src = "jdbc:derby:memory:xsrc1;create=true"
    val dst = "jdbc:derby:memory:xdst1;create=true"
    seedSrc(src, 1 to 97)
    withConn(dst)(_ => ()) // create the destination database
    val read = CrossStoreCopy.readTable(spark, ep(src), "HOSTS", "ID", 1, 97, 4)
    assert(read.rdd.getNumPartitions == 4,
      "the source must stream through 4 parallel cursors")
    CrossStoreCopy.copyTable(spark, ep(src), ep(dst), "HOSTS", "ID", 1, 97, 4)
    val ids = dstIds(dst)
    assert(ids.sorted == (1L to 97L), s"got ${ids.length} rows")
  }

  test("copyTableIncremental: only post-watermark rows move; idempotent re-run") {
    val src = "jdbc:derby:memory:xsrc2;create=true"
    val dst = "jdbc:derby:memory:xdst2;create=true"
    seedSrc(src, 1 to 50)
    withConn(dst)(_ => ())
    CrossStoreCopy.copyTable(spark, ep(src), ep(dst), "HOSTS", "ID", 1, 50, 4)
    assert(dstIds(dst).length == 50)
    // new rows land at the source; the incremental pass must append
    // EXACTLY the delta — re-appending pre-watermark rows (the Spark
    // JDBC bounds-only-stride trap) would show up as duplicates here
    seedSrc(src, 51 to 120)
    CrossStoreCopy.copyTableIncremental(spark, ep(src), ep(dst), "HOSTS", "ID", 4)
    val ids = dstIds(dst)
    assert(ids.length == 120, s"expected exactly the 70-row delta, got ${ids.length}")
    assert(ids.sorted == (1L to 120L))
    // nothing new at the source → a re-run must be a no-op
    CrossStoreCopy.copyTableIncremental(spark, ep(src), ep(dst), "HOSTS", "ID", 4)
    assert(dstIds(dst).length == 120, "idempotence: no-op when src has nothing new")
  }
}
