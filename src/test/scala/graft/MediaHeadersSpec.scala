package graft

import graft.ops.MediaHeaders
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level pins for the container-header parsers — independent of
  * the synthesizers where it matters: the hand-built fixtures below
  * lay out headers from the published specs (PNG RFC 2083, ITU T.81,
  * RIFF/WAVE, AVI avih), so a synthesizer/parser bug pair that
  * round-trips by accident still fails here. */
class MediaHeadersSpec extends AnyFunSuite {

  // ---- round trips over the synthesizers ----------------------------
  test("png round-trip and fixed length") {
    val b = MediaHeaders.pngBytes(1920, 1080)
    assert(b.length == MediaHeaders.PngLen)
    assert(MediaHeaders.probe(b).contains(
      MediaHeaders.Probe("png", 1920, 1080, 0L)))
  }

  test("jpeg round-trip and fixed length") {
    val b = MediaHeaders.jpegBytes(640, 481)
    assert(b.length == MediaHeaders.JpegLen)
    assert(MediaHeaders.probe(b).contains(
      MediaHeaders.Probe("jpeg", 640, 481, 0L)))
  }

  test("wav round-trip: duration from declared data size / byte rate") {
    val b = MediaHeaders.wavBytes(16000, 2, 2500L) // byteRate 64000
    assert(b.length == MediaHeaders.WavLen)
    assert(MediaHeaders.probe(b).contains(
      MediaHeaders.Probe("wav", 0, 0, 2500L)))
  }

  test("avi round-trip: duration = frames x usPerFrame / 1000") {
    val b = MediaHeaders.aviBytes(1280, 720, 33333L, 9000L)
    assert(b.length == MediaHeaders.AviLen)
    assert(MediaHeaders.probe(b).contains(
      MediaHeaders.Probe("avi", 1280, 720, 9000L * 33333L / 1000L)))
  }

  // ---- hand-built golden fixtures (spec-derived, not synthesizer) ---
  test("png: width/height are big-endian int32 at offsets 16/20") {
    val b = new Array[Byte](32)
    Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
      .zipWithIndex.foreach { case (v, i) => b(i) = v.toByte }
    b(11) = 13 // IHDR length
    "IHDR".zipWithIndex.foreach { case (c, i) => b(12 + i) = c.toByte }
    // width 0x00010203 = 66051, height 0x00000102 = 258
    b(17) = 1; b(18) = 2; b(19) = 3
    b(22) = 1; b(23) = 2
    val p = MediaHeaders.pngProbe(b).get
    assert(p.width == 66051 && p.height == 258)
  }

  test("jpeg: walker skips unknown segments and fill bytes to reach SOF2") {
    // SOI, DQT (5-byte payload), fill byte, SOF2 (progressive, 1 comp)
    val b = Array[Int](
      0xff, 0xd8,
      0xff, 0xdb, 0x00, 0x07, 1, 2, 3, 4, 5, // DQT len 7 = 2 + 5
      0xff, // fill byte before next marker
      0xff, 0xc2, 0x00, 0x0b, 8, 0x01, 0x00, 0x02, 0x80, 1, 0x11, 0,
      0xff, 0xd9).map(_.toByte)
    val p = MediaHeaders.jpegProbe(b).get
    assert(p.width == 0x280 && p.height == 0x100)
  }

  test("jpeg: DHT (C4) is not a frame header; SOS before SOF fails closed") {
    val dht = Array[Int](0xff, 0xd8,
      0xff, 0xc4, 0x00, 0x04, 0, 0, // DHT — must be skipped, not parsed
      0xff, 0xc0, 0x00, 0x0b, 8, 0x00, 0x10, 0x00, 0x20, 1, 0x11, 0)
      .map(_.toByte)
    assert(MediaHeaders.jpegProbe(dht).get.width == 0x20)
    val sosFirst = Array[Int](0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0, 9, 9)
      .map(_.toByte)
    assert(MediaHeaders.jpegProbe(sosFirst).isEmpty)
  }

  test("wav: little-endian fmt/data walk with an odd-size padded chunk") {
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def t(s: String) = s.getBytes("US-ASCII")
    // an odd-length LIST chunk before fmt: the walk must pad to even
    val body = t("WAVE") ++
      t("LIST") ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++ // 3 + pad
      t("fmt ") ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++
      t("data") ++ le32(48000) // declared 3 s, payload absent
    val b = t("RIFF") ++ le32(4L + body.length) ++ body
    assert(MediaHeaders.wavProbe(b).contains(
      MediaHeaders.Probe("wav", 0, 0, 3000L)))
  }

  test("malformed inputs fail closed, never throw") {
    assert(MediaHeaders.probe(Array.emptyByteArray).isEmpty)
    assert(MediaHeaders.probe("plain text, not media".getBytes).isEmpty)
    // truncated mid-header
    assert(MediaHeaders.probe(
      MediaHeaders.pngBytes(10, 10).take(15)).isEmpty)
    assert(MediaHeaders.probe(
      MediaHeaders.jpegBytes(10, 10).take(9)).isEmpty)
    // RIFF with a near-2^32 declared chunk size must terminate
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val evil = "RIFF".getBytes ++ le32(0xfffffff0L) ++ "WAVE".getBytes ++
      "junk".getBytes ++ le32(0xfffffff0L) ++ new Array[Byte](16)
    assert(MediaHeaders.wavProbe(evil).isEmpty)
    // hostile 32-bit maxima: AVI duration product would wrap Long, PNG
    // dims would wrap Int — both must fail closed, never go negative
    val evilAvi = MediaHeaders.aviBytes(1, 1, 0xffffffffL, 0xffffffffL)
    assert(MediaHeaders.aviProbe(evilAvi).isEmpty)
    val evilPng = MediaHeaders.pngBytes(1, 1)
    evilPng(16) = 0x80.toByte // width 0x80000001 > 2^31-1
    assert(MediaHeaders.pngProbe(evilPng).isEmpty)
  }

  test("probe dispatch: each container routes to its parser") {
    assert(MediaHeaders.probe(MediaHeaders.pngBytes(1, 1)).get.container == "png")
    assert(MediaHeaders.probe(MediaHeaders.jpegBytes(1, 1)).get.container == "jpeg")
    assert(MediaHeaders.probe(MediaHeaders.wavBytes(8000, 1, 1000L)).get.container == "wav")
    assert(MediaHeaders.probe(MediaHeaders.aviBytes(1, 1, 1000L, 1L)).get.container == "avi")
  }
}
