package graft.ops

/** Real container-header parsing for the multimodal pipeline — pure
  * byte arithmetic over the four classic container layouts, no codec
  * libraries (r4 verdict item: the decode stage must stop reporting
  * hash-derived fake dimensions):
  *
  *  - PNG: 8-byte signature, then the mandatory first IHDR chunk —
  *    width/height are big-endian int32 at byte offsets 16/20
  *    (PNG spec / RFC 2083 §4.1.1);
  *  - JPEG/JFIF: SOI then a marker-segment walk (each segment carries a
  *    big-endian length that includes its own 2 length bytes) until a
  *    SOFn frame header, whose payload is [precision, height:be16,
  *    width:be16, ...] (ITU T.81 §B.2.2). The walk skips APPn/COM/DQT/
  *    DHT and tolerates fill bytes (0xFF padding before a marker);
  *  - WAV: little-endian RIFF chunk walk to `fmt ` (channels, sample
  *    rate, byte rate) and `data` (payload size);
  *    duration_ms = data_size · 1000 / byte_rate;
  *  - AVI: RIFF walk to LIST/hdrl's `avih` main header —
  *    dwMicroSecPerFrame at +0, dwTotalFrames at +16, dwWidth/dwHeight
  *    at +32/+36 (all little-endian);
  *    duration_ms = frames · µs_per_frame / 1000.
  *
  * Every parser is TOTAL (None on any malformed/short input, never a
  * throw — at corpus scale bad blobs are data) and reads ONLY declared
  * header fields, so a truncated payload (the common state of archived
  * media, and of the test fixtures synthesized below) still probes
  * correctly — the ffprobe-style metadata contract.
  *
  * The `*Bytes` synthesizers build deterministic fixture blobs whose
  * header fields are exact functions of the requested values; they are
  * header-true / payload-truncated (documented per synthesizer) so a
  * 500-row fixture stays a few KB. An external SQL oracle can therefore
  * reconstruct every probed field arithmetically (the q72 CDX
  * precedent) and value-check the parsers end-to-end.
  */
object MediaHeaders {

  /** One probed blob: container id (`png|jpeg|wav|avi`), pixel
    * dimensions (0 for audio), playback duration (0 for images). */
  final case class Probe(container: String, width: Int, height: Int,
                         durationMs: Long)

  // ---- byte readers (all bounds-checked by callers) -----------------
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) | (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && (0 until s.length).forall(k => b(i + k) == s.charAt(k).toByte)

  /** Probe any supported container; None if no signature matches. */
  def probe(bytes: Array[Byte]): Option[Probe] =
    pngProbe(bytes).orElse(jpegProbe(bytes))
      .orElse(wavProbe(bytes)).orElse(aviProbe(bytes))

  // ---- PNG ----------------------------------------------------------
  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def pngProbe(b: Array[Byte]): Option[Probe] =
    if (b.length >= 24 && (0 until 8).forall(i => b(i) == PngSig(i)) &&
        be32(b, 8) == 13L && tag(b, 12, "IHDR")) {
      val w = be32(b, 16); val h = be32(b, 20)
      // the PNG spec caps dimensions at 2³¹−1 — a larger declared value
      // is malformed and must fail closed, not wrap Int negative
      if (w > Int.MaxValue || h > Int.MaxValue) None
      else Some(Probe("png", w.toInt, h.toInt, 0L))
    } else None

  // ---- JPEG ---------------------------------------------------------
  def jpegProbe(b: Array[Byte]): Option[Probe] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return None // lost marker sync
      val m = u8(b, i + 1)
      if (m == 0xff) i += 1 // fill byte
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // bare markers
      else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
      else {
        if (i + 3 >= b.length) return None
        val segLen = be16(b, i + 2)
        if (segLen < 2) return None
        // SOFn frame headers: C0-CF minus the non-frame C4 (DHT),
        // C8 (JPG extension), CC (DAC)
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 8 >= b.length) return None
          return Some(Probe("jpeg", be16(b, i + 7), be16(b, i + 5), 0L))
        }
        i += 2 + segLen
      }
    }
    None
  }

  // ---- WAV ----------------------------------------------------------
  def wavProbe(b: Array[Byte]): Option[Probe] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return None
    var i = 12
    var byteRate = 0L
    var dataLen = -1L
    while (i + 8 <= b.length && (byteRate == 0L || dataLen < 0L)) {
      val sz = le32(b, i + 4)
      if (tag(b, i, "fmt ") && i + 8 + 16 <= b.length)
        byteRate = le32(b, i + 16)
      if (tag(b, i, "data")) dataLen = sz // declared size; payload may be truncated
      // chunks are word-aligned; a data chunk's payload may extend past
      // the physical buffer (truncated blob) — the walk just ends there.
      // Long step math: a near-2³² declared size must end the walk, not
      // wrap Int and loop.
      val next = i.toLong + 8L + sz + (sz & 1L)
      if (next > b.length.toLong) i = b.length else i = next.toInt
    }
    if (byteRate > 0L && dataLen >= 0L)
      Some(Probe("wav", 0, 0, dataLen * 1000L / byteRate))
    else None
  }

  // ---- AVI ----------------------------------------------------------
  def aviProbe(b: Array[Byte]): Option[Probe] = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "AVI ")) return None
    var i = 12
    while (i + 12 <= b.length) {
      val sz = le32(b, i + 4)
      if (tag(b, i, "LIST") && tag(b, i + 8, "hdrl")) {
        // walk inside the hdrl list for the avih main header
        var j = i + 12
        val end = math.min(b.length.toLong, i + 8 + sz).toInt
        while (j + 8 <= end) {
          val csz = le32(b, j + 4)
          if (tag(b, j, "avih") && j + 8 + 40 <= b.length) {
            val usPerFrame = le32(b, j + 8)
            val frames = le32(b, j + 8 + 16)
            val w = le32(b, j + 8 + 32); val h = le32(b, j + 8 + 36)
            // hostile 32-bit maxima would wrap the duration product
            // (2³²·2³² > 2⁶³) or the Int dims — malformed fails closed
            if (w > Int.MaxValue || h > Int.MaxValue ||
                (frames > 0 && usPerFrame > Long.MaxValue / frames))
              return None
            return Some(Probe("avi", w.toInt, h.toInt,
              frames * usPerFrame / 1000L))
          }
          val jn = j.toLong + 8L + csz + (csz & 1L)
          if (jn > end.toLong) j = end else j = jn.toInt
        }
        return None // hdrl without avih is malformed
      }
      val next = i.toLong + 8L + sz + (sz & 1L)
      if (next > b.length.toLong) i = b.length else i = next.toInt
    }
    None
  }

  // ---- fixture synthesizers (header-true, payload-truncated) --------

  /** Deterministic filler bytes (never 0xFF, so a JPEG entropy segment
    * can't alias a marker). */
  private def filler(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed * 6364136223846793005L + 1442695040888963407L
    var i = 0
    while (i < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      out(i) = ((x >>> 33) & 0x7f).toByte
      i += 1
    }
    out
  }

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new java.util.zip.CRC32
    parts.foreach(c.update)
    c.getValue
  }

  private def beBytes32(v: Long): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def beBytes16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def leBytes32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def leBytes16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Physical blob sizes per container — constants the SQL oracle
    * reuses; pinned against the synthesizers in MediaHeadersSpec. */
  val PngLen = 89
  val JpegLen = 104
  val WavLen = 76
  val AviLen = 100

  /** 89-byte PNG: real signature + valid IHDR (8-bit RGB) with true
    * CRCs; the IDAT payload is 32 filler bytes (not a valid zlib
    * stream — header-true, payload-truncated). */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = ascii(typ)
      beBytes32(data.length.toLong) ++ t ++ data ++ beBytes32(crc32(t, data))
    }
    val ihdr = beBytes32(w.toLong) ++ beBytes32(h.toLong) ++
      Array[Byte](8, 2, 0, 0, 0)
    val out = PngSig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", filler(32, w.toLong * 31 + h)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(out.length == PngLen); out
  }

  /** 104-byte JPEG: SOI, APP0/JFIF, a COM segment (so the probe walk
    * must skip real segments), SOF0 (3 components), SOS, 32 entropy
    * filler bytes, EOI. The entropy bytes are not a valid scan —
    * header-true, payload-truncated. */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    require(w <= 0xffff && h <= 0xffff, "JPEG dims are 16-bit")
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ beBytes16(16) ++
      ascii("JFIF") ++ Array[Byte](0, 1, 1, 0) ++
      beBytes16(1) ++ beBytes16(1) ++ Array[Byte](0, 0)
    val com = {
      val c = ascii("graft-fixture")
      Array[Byte](0xff.toByte, 0xfe.toByte) ++ beBytes16(2 + c.length) ++ c
    }
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ beBytes16(17) ++
      Array[Byte](8) ++ beBytes16(h) ++ beBytes16(w) ++ Array[Byte](3) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val sos = Array[Byte](0xff.toByte, 0xda.toByte) ++ beBytes16(12) ++
      Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)
    val out = Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ com ++ sof0 ++
      sos ++ filler(32, w.toLong * 131 + h) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    assert(out.length == JpegLen); out
  }

  /** 76-byte WAV: real RIFF/fmt headers (PCM 16-bit) and a `data`
    * chunk whose DECLARED size encodes the duration exactly
    * (data = byte_rate · duration_ms / 1000, which the caller must
    * make exact); the physical payload is 32 filler bytes —
    * header-true, payload-truncated. */
  def wavBytes(sampleRate: Int, channels: Int, durMs: Long): Array[Byte] = {
    val byteRate = sampleRate.toLong * channels * 2
    require(byteRate * durMs % 1000 == 0,
      s"inexact duration: byteRate=$byteRate durMs=$durMs")
    val dataLen = byteRate * durMs / 1000
    val fmt = ascii("fmt ") ++ leBytes32(16) ++ leBytes16(1) ++
      leBytes16(channels) ++ leBytes32(sampleRate.toLong) ++
      leBytes32(byteRate) ++ leBytes16(channels * 2) ++ leBytes16(16)
    val out = ascii("RIFF") ++ leBytes32(36 + dataLen) ++ ascii("WAVE") ++
      fmt ++ ascii("data") ++ leBytes32(dataLen) ++ filler(32, dataLen)
    assert(out.length == WavLen); out
  }

  /** 100-byte AVI: real RIFF/LIST-hdrl/avih main header (µs-per-frame,
    * total frames, dimensions) and an empty `movi` list — header-true,
    * payload-truncated. */
  def aviBytes(w: Int, h: Int, usPerFrame: Long, frames: Long): Array[Byte] = {
    val avih = leBytes32(usPerFrame) ++ leBytes32(0) ++ leBytes32(0) ++
      leBytes32(0x10) ++ leBytes32(frames) ++ leBytes32(0) ++
      leBytes32(1) ++ leBytes32(0) ++ leBytes32(w.toLong) ++
      leBytes32(h.toLong) ++ new Array[Byte](16)
    val hdrl = ascii("LIST") ++ leBytes32(4 + 8 + avih.length) ++
      ascii("hdrl") ++ ascii("avih") ++ leBytes32(avih.length.toLong) ++ avih
    val movi = ascii("LIST") ++ leBytes32(4) ++ ascii("movi")
    val body = ascii("AVI ") ++ hdrl ++ movi
    val out = ascii("RIFF") ++ leBytes32(body.length.toLong) ++ body
    assert(out.length == AviLen); out
  }
}
