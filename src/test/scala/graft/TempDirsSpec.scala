package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pins the scratch-dir sweep's ownership rules — in particular the
  * pid-RECYCLE case: a marker pid that now belongs to an unrelated
  * process (different start time) must not keep the leak alive. */
class TempDirsSpec extends AnyFunSuite {

  private def mk(name: String, marker: Option[String]): File = {
    val d = new File(System.getProperty("java.io.tmpdir"), name)
    d.mkdirs()
    marker.foreach(m =>
      Files.writeString(new File(d, ".owner-pid").toPath, m))
    d
  }

  test("sweepStale: live owner kept; recycled pid and dead pid reclaimed") {
    val me = ProcessHandle.current()
    val myStart = me.info().startInstant()
    assume(myStart.isPresent, "JVM can't report its start time here")
    val n = System.nanoTime()
    val live = mk(s"benchpages-tds-live-$n",
      Some(s"${me.pid()} ${myStart.get.toEpochMilli}"))
    // same (live) pid, wrong start time = the recycle signature
    val recycled = mk(s"benchpages-tds-rec-$n", Some(s"${me.pid()} 12345"))
    val dead = mk(s"benchpages-tds-dead-$n", Some("999999999 12345"))
    try {
      TempDirs.sweepStale()
      assert(live.isDirectory, "live owner's dir must never be reclaimed")
      assert(!recycled.exists,
        "recycled-pid dir (start-time mismatch) must be reclaimed")
      assert(!dead.exists, "dead-pid dir must be reclaimed")
    } finally {
      Seq(live, recycled, dead).foreach { d =>
        new File(d, ".owner-pid").delete(); d.delete()
      }
    }
  }

  test("sweepStale: verified live owner survives ANY marked-age gate") {
    val me = ProcessHandle.current()
    val myStart = me.info().startInstant()
    assume(myStart.isPresent, "JVM can't report its start time here")
    val n = System.nanoTime()
    val d = mk(s"benchpages-tds-vlive-$n",
      Some(s"${me.pid()} ${myStart.get.toEpochMilli}"))
    try {
      d.setLastModified(System.currentTimeMillis() - 60000)
      // a start-stamp match is proof of ownership — the age backstop is
      // only for unverifiable markers and must never reap a proven owner
      TempDirs.sweepStale(markedMaxAgeMs = 10)
      assert(d.isDirectory,
        "provably-live owner's dir reclaimed by the age backstop")
    } finally {
      new File(d, ".owner-pid").delete(); d.delete()
    }
  }

  test("sweepStale: stampless marker falls back to the long marked-age gate") {
    val me = ProcessHandle.current()
    val n = System.nanoTime()
    // old marker layout: pid only, no start stamp — owner LOOKS alive
    val d = mk(s"benchpages-tds-old-$n", Some(s"${me.pid()}"))
    try {
      d.setLastModified(System.currentTimeMillis() - 60000)
      TempDirs.sweepStale() // default 7-day marked gate: kept
      assert(d.isDirectory)
      TempDirs.sweepStale(markedMaxAgeMs = 5000) // past the gate: reclaimed
      assert(!d.exists)
    } finally {
      new File(d, ".owner-pid").delete(); d.delete()
    }
  }
}
