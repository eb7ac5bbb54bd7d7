package graft

import java.io.File

/** Best-effort lifecycle for bench/fixture scratch directories.
  *
  * The bench fixtures are multi-GB parquet trees under java.io.tmpdir;
  * runs that die mid-flight (timeouts, kills, crashes) used to leave
  * them behind forever — measured: 75 GB of stale fixture data, enough
  * to fail later benchmark writes with ENOSPC. Every scratch dir is
  * therefore (a) registered for recursive delete at JVM exit, and
  * (b) swept at the NEXT run's startup if an earlier crash leaked it
  * (age-gated so a concurrently-running job's dirs are never touched).
  */
object TempDirs {

  /** Scratch-dir name prefixes owned by this library's mains/tests. */
  private val prefixes = Seq(
    "benchpages", "benchstore", "warmpages",
    "probepages", "probestore", "probewarm",
    "entrypages", "entrycrawl", "planpages", "benchlocal")

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) {
      val cs = f.listFiles()
      if (cs != null) cs.foreach(deleteRec)
    }
    f.delete(); ()
  }

  /** Register `dir` for recursive deletion at JVM exit; returns it. */
  def cleanupOnExit(dir: String): String = {
    Runtime.getRuntime.addShutdownHook(new Thread(new Runnable {
      def run(): Unit =
        try deleteRec(new File(dir)) catch { case _: Throwable => () }
    }))
    dir
  }

  /** Delete leaked scratch dirs from PRIOR crashed runs: any dir under
    * java.io.tmpdir with an owned prefix not modified for `maxAgeMs`
    * (default 1 h — far longer than any live run goes without writing). */
  def sweepStale(maxAgeMs: Long = 3600L * 1000): Unit = {
    val tmp = new File(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val fs = tmp.listFiles()
    if (fs != null) fs.foreach { f =>
      if (f.isDirectory && prefixes.exists(f.getName.startsWith) &&
          f.lastModified < cutoff)
        try deleteRec(f) catch { case _: Throwable => () }
    }
  }
}
