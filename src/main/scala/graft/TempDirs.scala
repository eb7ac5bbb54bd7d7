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
    * owning JVM is gone. The marker records the owner's START TIME next
    * to the pid so a pid later RECYCLED to an unrelated long-lived
    * process doesn't keep the leak alive forever (pid alone can't tell
    * "my owner" from "whoever got its number next"). */
  def cleanupOnExit(dir: String): String = {
    try {
      new File(dir).mkdirs()
      val ph = ProcessHandle.current()
      val start = {
        val s = ph.info().startInstant()
        if (s.isPresent) s.get.toEpochMilli.toString else "?"
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, OwnerMarker), s"${ph.pid()} $start")
    } catch { case _: Throwable => () }
    Runtime.getRuntime.addShutdownHook(new Thread(new Runnable {
      def run(): Unit =
        try deleteRec(new File(dir)) catch { case _: Throwable => () }
    }))
    dir
  }

  /** Parsed marker: (pid, recorded start-epoch-ms if stamped). Older
    * one-field markers parse as (pid, None). */
  private def ownerInfo(f: File): Option[(Long, Option[Long])] =
    try {
      val m = new File(f, OwnerMarker)
      if (!m.isFile) None
      else {
        val parts = java.nio.file.Files.readString(m.toPath).trim
          .split("\\s+")
        Some((parts(0).toLong,
          if (parts.length > 1) parts(1).toLongOption else None))
      }
    } catch { case _: Throwable => None }

  /** True iff the marker's pid refers to the SAME process that wrote
    * it: the pid must be present AND (when both sides have a start
    * stamp) the start times must agree — a recycled pid with a
    * different start time is not the owner. Unknowable start times
    * resolve to "alive" (conservative: never reap a live run). */
  private def ownerAlive(pid: Long, recordedStart: Option[Long]): Boolean = {
    val oh = ProcessHandle.of(pid)
    if (!oh.isPresent) false
    else recordedStart match {
      case Some(rec) =>
        val s = oh.get.info().startInstant()
        if (s.isPresent) s.get.toEpochMilli == rec else true
      case None => true
    }
  }

  /** Delete leaked scratch dirs from PRIOR dead runs: any dir under
    * java.io.tmpdir with an owned prefix whose recorded owner process
    * is gone — including a pid RECYCLED to a process with a different
    * start time — (immediate reclaim), or, for unmarked dirs (older
    * layouts), not modified for `maxAgeMs`. A marked dir whose owner
    * looks alive is still reclaimed past `markedMaxAgeMs` (default 7
    * days) — the backstop for markers written without a start stamp on
    * JVMs that can't report one; no bench run lives that long. */
  def sweepStale(maxAgeMs: Long = 3600L * 1000,
                 markedMaxAgeMs: Long = 7L * 86400 * 1000): Unit = {
    val tmp = new File(System.getProperty("java.io.tmpdir"))
    val now = System.currentTimeMillis()
    val cutoff = now - maxAgeMs
    val markedCutoff = now - markedMaxAgeMs
    val fs = tmp.listFiles()
    if (fs != null) fs.foreach { f =>
      if (f.isDirectory && prefixes.exists(f.getName.startsWith)) {
        val info = ownerInfo(f)
        val reclaim = info match {
          case Some((pid, start)) =>
            !ownerAlive(pid, start) || f.lastModified < markedCutoff
          case None => f.lastModified < cutoff // unmarked: age gate
        }
        if (reclaim)
          try deleteRec(f) catch { case _: Throwable => () }
      }
    }
  }
}
