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

  private val OwnerMarker = ".owner-pid"

  /** Register `dir` for recursive deletion at JVM exit; returns it.
    * Also drops a pid liveness marker inside the dir: fixture dirs are
    * write-once-read-many, so their mtime freezes at generation time —
    * an age gate alone would let a later concurrent run reap a LIVE
    * run's input mid-flight. sweepStale only reclaims marked dirs whose
    * owning JVM is gone. */
  def cleanupOnExit(dir: String): String = {
    try {
      new File(dir).mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, OwnerMarker),
        ProcessHandle.current().pid().toString)
    } catch { case _: Throwable => () }
    Runtime.getRuntime.addShutdownHook(new Thread(new Runnable {
      def run(): Unit =
        try deleteRec(new File(dir)) catch { case _: Throwable => () }
    }))
    dir
  }

  private def ownerPid(f: File): Option[Long] =
    try {
      val m = new File(f, OwnerMarker)
      if (m.isFile)
        Some(java.nio.file.Files.readString(m.toPath).trim.toLong)
      else None
    } catch { case _: Throwable => None }

  /** Delete leaked scratch dirs from PRIOR dead runs: any dir under
    * java.io.tmpdir with an owned prefix whose recorded owner process
    * is gone (immediate reclaim — no waiting), or, for unmarked dirs
    * (older layouts), not modified for `maxAgeMs`. A dir whose owner
    * pid is still alive is NEVER touched, regardless of age. */
  def sweepStale(maxAgeMs: Long = 3600L * 1000): Unit = {
    val tmp = new File(System.getProperty("java.io.tmpdir"))
    val cutoff = System.currentTimeMillis() - maxAgeMs
    val fs = tmp.listFiles()
    if (fs != null) fs.foreach { f =>
      if (f.isDirectory && prefixes.exists(f.getName.startsWith)) {
        val pid = ownerPid(f)
        val alive = pid.exists(p => ProcessHandle.of(p).isPresent)
        val reclaim =
          if (alive) false
          else if (pid.isDefined) true       // owner dead: reclaim now
          else f.lastModified < cutoff        // unmarked: age gate
        if (reclaim)
          try deleteRec(f) catch { case _: Throwable => () }
      }
    }
  }
}
