package graft.kernel

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater}

/** Real (header-level) media container codec — pure JVM, no external libs.
  *
  * Writes and parses genuine PNG / JPEG (JFIF) / WAV (RIFF PCM) byte
  * streams: correct magic numbers, segment/chunk framing, big/little-endian
  * dimension fields, and (for PNG) real CRC32 chunk checksums. This replaces
  * the multimodal decode STUB for metadata extraction: the Spark pipeline
  * decodes width/height/frame facts from actual container bytes, so the
  * decode step is oracle-checkable instead of hash-derived fiction. Pixel
  * payload decoding (IDAT inflate, JPEG entropy decode, PCM resample) is
  * out of scope — no codec libraries ship in this container — but the
  * container parsing below is the real on-disk format per the public specs
  * (PNG: RFC 2083; JFIF: ITU T.871; WAV: RIFF/WAVE PCM).
  */
object MediaCodec {

  final case class MediaMeta(
      kind: String, width: Int, height: Int, frames: Int, sampleRate: Int)

  // ------------------------------------------------------------- synthesis

  /** Deterministic media payload for a doc id: kind cycles png/jpeg/wav and
    * dimensions follow pure-arithmetic formulas so a SQL oracle can verify
    * the parsed facts independently (SparkEntry q34). */
  def synthesize(docId: Long): Array[Byte] = (docId % 3) match {
    case 0 => encodePng(pngWidth(docId), pngHeight(docId))
    case 1 => encodeJpeg(pngWidth(docId), pngHeight(docId))
    case _ => encodeWav(wavSampleRate(docId), wavSamples(docId))
  }

  def pngWidth(docId: Long): Int = (16 + (docId * 7) % 240).toInt
  def pngHeight(docId: Long): Int = (16 + (docId * 13) % 240).toInt
  def wavSampleRate(docId: Long): Int = (8000 + (docId % 5) * 2000).toInt
  def wavSamples(docId: Long): Int = (32 + docId % 64).toInt

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)
  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG: signature + IHDR (8-bit RGB) + IEND, with real CRC32s. 45 bytes. */
  def encodePng(width: Int, height: Int): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes(StandardCharsets.US_ASCII)
      val crc = new CRC32
      crc.update(t); crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(width) ++ be32(height) ++
      Array[Byte](8 /*bit depth*/, 2 /*color: truecolor*/, 0, 0, 0)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IEND", Array.empty[Byte])
  }

  /** JPEG/JFIF: SOI + APP0(JFIF) + SOF0 (baseline, 3 components) + EOI.
    * 41 bytes. */
  def encodeJpeg(width: Int, height: Int): Array[Byte] = {
    val soi = Array(0xFF, 0xD8).map(_.toByte)
    val app0 = Array(0xFF, 0xE0).map(_.toByte) ++ be16(16) ++
      ("JFIF".getBytes(StandardCharsets.US_ASCII) :+ 0.toByte) ++
      Array[Byte](1, 1 /*version*/, 0 /*units*/) ++
      be16(1) ++ be16(1) ++ Array[Byte](0, 0)
    val sofData = Array[Byte](8 /*precision*/) ++ be16(height) ++ be16(width) ++
      Array[Byte](3 /*components*/, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1)
    val sof0 = Array(0xFF, 0xC0).map(_.toByte) ++ be16(2 + sofData.length) ++ sofData
    val eoi = Array(0xFF, 0xD9).map(_.toByte)
    soi ++ app0 ++ sof0 ++ eoi
  }

  /** WAV: RIFF/WAVE with a PCM fmt chunk (mono, 16-bit) and a data chunk of
    * `samples` deterministic 16-bit samples. 44 + 2·samples bytes. */
  def encodeWav(sampleRate: Int, samples: Int): Array[Byte] = {
    val dataBytes = samples * 2
    val data = Array.tabulate(dataBytes)(i => (Hashing.mix(i.toLong) & 0xFF).toByte)
    val byteRate = sampleRate * 2
    "RIFF".getBytes(StandardCharsets.US_ASCII) ++ le32(36 + dataBytes) ++
      "WAVE".getBytes(StandardCharsets.US_ASCII) ++
      "fmt ".getBytes(StandardCharsets.US_ASCII) ++ le32(16) ++
      le16(1 /*PCM*/) ++ le16(1 /*mono*/) ++ le32(sampleRate) ++
      le32(byteRate) ++ le16(2 /*block align*/) ++ le16(16 /*bits*/) ++
      "data".getBytes(StandardCharsets.US_ASCII) ++ le32(dataBytes) ++ data
  }

  /** Decode the PCM sample stream of a parsed WAV payload (16-bit LE,
    * first channel) — real signal data for feature extraction. Empty for
    * non-WAV or malformed payloads. */
  def wavPcmSamples(bytes: Array[Byte]): Array[Int] = {
    if (bytes == null || bytes.length < 12 ||
      !bytes.take(4).sameElements("RIFF".getBytes(StandardCharsets.US_ASCII)))
      return Array.empty
    var o = 12
    while (o + 8 <= bytes.length) {
      val id = new String(bytes.slice(o, o + 4), StandardCharsets.US_ASCII)
      val len = rdLe32(bytes, o + 4)
      if (len < 0 || len > bytes.length) return Array.empty // malformed length
      if (id == "data") {
        val end = math.min(o + 8 + len, bytes.length)
        val n = math.max(0, (end - (o + 8)) / 2)
        return Array.tabulate(n) { k =>
          val v = rdLe16(bytes, o + 8 + 2 * k)
          if (v >= 0x8000) v - 0x10000 else v
        }
      }
      o += 8 + len + (len & 1)
    }
    Array.empty
  }

  /** Real audio features over decoded PCM: RMS (exact integer
    * sum-of-squares → one correctly-rounded sqrt/division, so any engine
    * reproduces the double bit-for-bit), zero-crossing count, and duration
    * in ms. */
  final case class AudioFeatures(
      nSamples: Int, rms: Double, zeroCrossings: Int, durationMs: Int)

  def audioFeatures(samples: Array[Int], sampleRate: Int): AudioFeatures = {
    val n = samples.length
    if (n == 0 || sampleRate <= 0) return AudioFeatures(0, 0.0, 0, 0)
    var ss = 0L
    var zc = 0
    var k = 0
    while (k < n) {
      ss += samples(k).toLong * samples(k)
      if (k > 0 && ((samples(k) >= 0) != (samples(k - 1) >= 0))) zc += 1
      k += 1
    }
    AudioFeatures(n, math.sqrt(ss.toDouble / n), zc,
      (n.toLong * 1000 / sampleRate).toInt) // Long math: n·1000 overflows
      // Int past ~2.1M samples (~49 s at 44.1 kHz)
  }

  // -------------------------------------------------------------- rendering

  /** Fixed 5×7 bitmap font for glyph ink: 7 row bitmasks per glyph, bit 4 =
    * leftmost column. Lowercase maps to uppercase; unknown characters render
    * blank. Enough for an OCR engine downstream to read the raster. */
  private val GlyphBlank = Array(0, 0, 0, 0, 0, 0, 0)
  private val Glyphs: Map[Char, Array[Int]] = Map(
    'A' -> Array(0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    'B' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    'C' -> Array(0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    'D' -> Array(0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    'E' -> Array(0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    'F' -> Array(0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    'G' -> Array(0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    'H' -> Array(0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    'I' -> Array(0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    'J' -> Array(0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    'K' -> Array(0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    'L' -> Array(0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    'M' -> Array(0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    'N' -> Array(0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    'O' -> Array(0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    'P' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    'Q' -> Array(0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    'R' -> Array(0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    'S' -> Array(0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    'T' -> Array(0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    'U' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    'V' -> Array(0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    'W' -> Array(0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    'X' -> Array(0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    'Y' -> Array(0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    'Z' -> Array(0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    '0' -> Array(0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    '1' -> Array(0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    '2' -> Array(0x0E, 0x11, 0x01, 0x06, 0x08, 0x10, 0x1F),
    '3' -> Array(0x1F, 0x01, 0x02, 0x06, 0x01, 0x11, 0x0E),
    '4' -> Array(0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    '5' -> Array(0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    '6' -> Array(0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    '7' -> Array(0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    '8' -> Array(0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    '9' -> Array(0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    '.' -> Array(0x00, 0x00, 0x00, 0x00, 0x00, 0x0C, 0x0C),
    ',' -> Array(0x00, 0x00, 0x00, 0x00, 0x0C, 0x04, 0x08),
    ':' -> Array(0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x0C, 0x00),
    ';' -> Array(0x00, 0x0C, 0x0C, 0x00, 0x0C, 0x04, 0x08),
    '!' -> Array(0x04, 0x04, 0x04, 0x04, 0x04, 0x00, 0x04),
    '?' -> Array(0x0E, 0x11, 0x01, 0x02, 0x04, 0x00, 0x04),
    '-' -> Array(0x00, 0x00, 0x00, 0x1F, 0x00, 0x00, 0x00),
    '(' -> Array(0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ')' -> Array(0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    '\'' -> Array(0x04, 0x04, 0x08, 0x00, 0x00, 0x00, 0x00),
    '"' -> Array(0x0A, 0x0A, 0x00, 0x00, 0x00, 0x00, 0x00),
    '/' -> Array(0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10))

  private def glyphRows(c: Char): Array[Int] =
    Glyphs.getOrElse(Character.toUpperCase(c), GlyphBlank)

  /** Plot one glyph's ink with its cell's top-left raster corner at
    * (x0, y0), pixel blocks `scale` wide/tall, clipped to the page: a
    * block straddling an edge keeps its ON-PAGE pixels; a block fully
    * outside paints nothing (Td positions may legally sit off-page). */
  private def drawGlyph(g: Array[Int], x0: Double, y0: Double, scale: Double,
      width: Int, height: Int)(plot: (Int, Int) => Unit): Unit = {
    var r = 0
    while (r < 7) {
      val bits = g(r)
      if (bits != 0) {
        var c = 0
        while (c < 5) {
          if ((bits & (1 << (4 - c))) != 0) {
            val bx0 = x0 + c * scale; val bx1 = x0 + (c + 1) * scale
            val by0 = y0 + r * scale; val by1 = y0 + (r + 1) * scale
            if (bx1 > 0 && by1 > 0 && bx0 < width && by0 < height) {
              val px0 = math.max(0, bx0.toInt)
              val px1 = math.min(width, math.max(px0 + 1, bx1.toInt))
              val py0 = math.max(0, by0.toInt)
              val py1 = math.min(height, math.max(py0 + 1, by1.toInt))
              var py = py0
              while (py < py1) {
                var px = px0
                while (px < px1) { plot(px, py); px += 1 }
                py += 1
              }
            }
          }
          c += 1
        }
      }
      r += 1
    }
  }

  /** Rasterize POSITIONED text runs (x, y, text) — PDF user space,
    * baseline-left origin, y up, points — at `scale` (dpi/72) onto a
    * `width`×`height` raster whose top edge is PDF y = pageHeightPts.
    * This is the Td/Tm-exact S5 ink path: each run's glyph cells start at
    * the run's own content-stream position (7-unit glyph height above the
    * baseline, 6-unit advance per char — the same cell geometry as the
    * line-grid fallback), so a two-column page renders as two ink columns
    * instead of a left-aligned grid. Work is bounded by the pixel count:
    * runs and chars outside the page clip. */
  private def drawRuns(runs: Seq[(Double, Double, String)],
      pageHeightPts: Double, scale: Double,
      width: Int, height: Int)(plot: (Int, Int) => Unit): Unit = {
    runs.foreach { case (rx, ry, text) =>
      // glyph cell top in raster coords: baseline y + 7 font units up
      val y0 = (pageHeightPts - ry - 7.0) * scale
      if (y0 + 7 * scale >= 0 && y0 < height) {
        val maxChars = math.max(0,
          math.ceil((width / scale - rx) / 6.0).toInt)
        var ci = 0
        while (ci < text.length && ci < maxChars) {
          val g = glyphRows(text.charAt(ci))
          drawGlyph(g, (rx + ci * 6.0) * scale, y0, scale, width, height)(plot)
          ci += 1
        }
      }
    }
  }

  /** Rasterize `lines` with the 5×7 font at `scale` (dpi/72), invoking
    * `plot(x, y)` for every ink pixel inside the page. Char cell 6×9 font
    * units, 4-unit margins; lines/chars overflowing the page are clipped —
    * work is bounded by the pixel count, not the text length. */
  private def drawText(lines: Seq[String], scale: Double,
      width: Int, height: Int)(plot: (Int, Int) => Unit): Unit = {
    val cellW = 6 * scale
    val cellH = 9 * scale
    val margin = 4 * scale
    var li = 0
    while (li < lines.length) {
      val y0 = margin + li * cellH
      if (y0 + 7 * scale >= height) return // below the page: clip the rest
      val line = lines(li)
      val maxChars = math.max(0, ((width - 2 * margin) / cellW).toInt)
      var ci = 0
      while (ci < line.length && ci < maxChars) {
        val g = glyphRows(line.charAt(ci))
        drawGlyph(g, margin + ci * cellW, y0, scale, width, height)(plot)
        ci += 1
      }
      li += 1
    }
  }

  /** Render a page raster as a COMPLETE, decodable PNG: IHDR + IDAT
    * (deflated scanlines: filter byte 0 + RGB per pixel) + IEND, real
    * CRC32s throughout. Any PNG reader decodes it. `lines` are drawn as
    * black 5×7-font glyph ink at `scale` (= dpi/72), so ink coverage
    * tracks the text layer and the payload is OCR-consumable; byte size
    * grows with the pixel count, so DPI-size monotonicity holds like a
    * real rasterizer's output. */
  def renderPng(width: Int, height: Int, lines: Seq[String] = Seq.empty,
      scale: Double = 1.0,
      runs: Seq[(Double, Double, String)] = Seq.empty): Array[Byte] = {
    val w = math.max(1, width)
    val h = math.max(1, height)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes(StandardCharsets.US_ASCII)
      val crc = new CRC32
      crc.update(t); crc.update(data)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }
    val ihdr = be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0)
    val rowLen = 1 + 3 * w
    val scanlines = new Array[Byte](rowLen * h)
    var r = 0
    while (r < h) {
      var i = rowLen * r + 1 // scanlines(rowLen*r) = 0: filter None
      val end = rowLen * (r + 1)
      while (i < end) { scanlines(i) = 0xFF.toByte; i += 1 }
      r += 1
    }
    val ink = (x: Int, y: Int) => {
      val base = rowLen * y + 1 + 3 * x
      scanlines(base) = 0; scanlines(base + 1) = 0; scanlines(base + 2) = 0
    }
    if (runs.nonEmpty) drawRuns(runs, h / scale, scale, w, h)(ink)
    else drawText(lines, scale, w, h)(ink)
    val idat = deflateZlib(scanlines)
    PngSig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Render a page raster as a COMPLETE, decodable baseline JPEG: JFIF
    * APP0 + DQT + SOF0 (1 grayscale component) + two minimal canonical
    * Huffman tables (DC: {cat0→'0', cat6→'10'}; AC: {EOB→'0'}) + SOS + a
    * real entropy-coded segment. Glyph ink is carried at 8×8-block
    * granularity: blocks touched by text render DARK (DC 0) and blank
    * blocks WHITE (DC +40); per-block DC differences are therefore
    * 0 / ±40 — cat0 or cat6, both in the table. Each block costs bits, so
    * byte size grows with the block count — DPI-size monotonicity again. */
  def renderJpeg(width: Int, height: Int, lines: Seq[String] = Seq.empty,
      scale: Double = 1.0,
      runs: Seq[(Double, Double, String)] = Seq.empty): Array[Byte] = {
    val w = math.max(1, width)
    val h = math.max(1, height)
    val out = new ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = payload.length + 2
      out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
      out.write(payload, 0, payload.length)
    }
    out.write(0xFF); out.write(0xD8) // SOI
    seg(0xE0, "JFIF".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ Array[Byte](0, 0))
    seg(0xDB, Array[Byte](0) ++ Array.fill[Byte](64)(16)) // DQT, all 16s
    seg(0xC0, Array[Byte](8) ++ be16(h) ++ be16(w) ++
      Array[Byte](1, 1, 0x11, 0)) // SOF0: 1 component, no subsampling
    // DHT DC (class 0, id 0): canonical lengths [1,1]: '0'→cat0, '10'→cat6
    seg(0xC4, Array[Byte](0x00, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      Array[Byte](0, 6))
    // DHT AC (class 1, id 0): single code '0' → run/size 0/0 (EOB)
    seg(0xC4, Array[Byte](0x10, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) ++
      Array[Byte](0))
    seg(0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS
    // entropy-coded data with byte stuffing
    var cur = 0
    var nbits = 0
    val ent = new ByteArrayOutputStream()
    def putBits(value: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((value >>> k) & 1)
        nbits += 1
        if (nbits == 8) {
          ent.write(cur)
          if (cur == 0xFF) ent.write(0x00) // stuffing
          cur = 0; nbits = 0
        }
        k -= 1
      }
    }
    val blocksW = (w + 7) / 8
    val blocksH = (h + 7) / 8
    val dark = new Array[Boolean](blocksW * blocksH)
    val ink = (x: Int, y: Int) => dark((y / 8) * blocksW + (x / 8)) = true
    if (runs.nonEmpty) drawRuns(runs, h / scale, scale, w, h)(ink)
    else drawText(lines, scale, w, h)(ink)
    // per block: DC difference to the target level (white 40, ink 0) —
    // diff ∈ {0, ±40}: cat0 code '0', or cat6 code '10' + 6 magnitude bits
    // (negative values in one's-complement style: v + 2^6 − 1)
    var pred = 0
    var b = 0
    while (b < blocksW * blocksH) {
      val target = if (dark(b)) 0 else 40
      val diff = target - pred
      if (diff == 0) putBits(0, 1)
      else { putBits(0x2, 2); putBits(if (diff > 0) diff else diff + 63, 6) }
      pred = target
      putBits(0, 1) // AC EOB
      b += 1
    }
    if (nbits > 0) { // pad final byte with 1s
      cur = (cur << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      ent.write(cur)
      if (cur == 0xFF) ent.write(0x00)
    }
    out.write(ent.toByteArray)
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  private def deflateZlib(data: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(1024)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  // --------------------------------------------------------------- parsing

  /** Intrinsic pixel dimensions from an embedded image payload's OWN
    * header: JPEG SOFn (ITU T.81 §B.2.2 — any non-differential/differential
    * frame marker C0–CF except C4/C8/CC), PNG IHDR (RFC 2083 §4.1.1), or a
    * PDF-embedded JBIG2 stream's page-information segment (ITU T.88
    * §7.4.8 — PDF JBIG2Decode payloads carry raw segment headers, no file
    * header). Used to cross-check an image XObject's /Width /Height dict
    * entries against the payload it actually carries — a malformed scanned
    * PDF is caught BEFORE its bytes are reused down the OCR path.
    * CCITTFax payloads are raw G4 bitstreams with no self-describing
    * dimensions, so they cannot be cross-checked. None = unrecognized or
    * truncated (never throws). */
  def embeddedImageDims(b: Array[Byte]): Option[(Int, Int, String)] = {
    if (b == null || b.length < 12) return None
    if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) {
      // JPEG: walk marker segments to the first frame header
      var i = 2
      while (i + 3 < b.length && (b(i) & 0xFF) == 0xFF) {
        val marker = b(i + 1) & 0xFF
        if (marker == 0xFF) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD8)) i += 2
        else if (marker == 0xD9) return None // EOI before any SOF
        else {
          if (i + 3 >= b.length) return None
          val len = rdBe16(b, i + 2)
          if (len < 2) return None
          if (marker >= 0xC0 && marker <= 0xCF &&
            marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
            if (i + 8 >= b.length) return None
            return Some((rdBe16(b, i + 7), rdBe16(b, i + 5), "jpeg"))
          }
          i += 2 + len
        }
      }
      None
    } else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G') {
      if (b.length < 24) None
      else Some((rdBe32(b, 16), rdBe32(b, 20), "png"))
    } else jbig2PageDims(b)
  }

  /** Decoded grayscale raster: the luminance plane resampled to the
    * frame's full width×height, row-major, values 0–255. */
  final case class DecodedGray(width: Int, height: Int, pixels: Array[Int])

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // idctCos(x)(u) = c(u)/2 · cos((2x+1)uπ/16) — the separable 1-D basis
  private val idctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16)
  }

  /** Baseline-JPEG decode to PIXELS (ITU T.81 §F.2: SOF0/SOF1, 8-bit,
    * Huffman, interleaved scan, DRI/RSTn honored, 0xFF00 stuffing).
    * Returns the LUMINANCE plane at full frame resolution — the page/ink
    * statistics consumer never needs chroma, so Cb/Cr blocks are
    * entropy-PARSED (the bit stream must advance through them) but never
    * dequantized or IDCT'd: a 4:2:0 three-component decode costs barely
    * more than grayscale. Progressive (SOF2+), arithmetic, 12-bit,
    * hierarchical and any structural inconsistency return None — this is
    * a probe, it must never throw on crawl bytes. */
  def decodeJpeg(b: Array[Byte]): Option[DecodedGray] = {
    if (b == null || b.length < 4 ||
      (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    try decodeJpegUnsafe(b)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Canonical Huffman table in the standard mincode/maxcode/valptr
    * decode form (T.81 §F.2.2.3). */
  private final class HuffTable(counts: Array[Int], syms: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    def symbol(len: Int, code: Int): Int = syms(valPtr(len) + code - minCode(len))
  }

  private def decodeJpegUnsafe(b: Array[Byte]): Option[DecodedGray] = {
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var restartInterval = 0
    // frame state
    var w = 0; var h = 0; var nComp = 0
    var compH: Array[Int] = null; var compV: Array[Int] = null
    var compQ: Array[Int] = null; var compId: Array[Int] = null

    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return None
      val marker = b(i + 1) & 0xFF
      if (marker == 0xFF) { i += 1 } // fill byte
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else if (marker == 0xD9) return None // EOI before SOS
      else {
        val len = rdBe16(b, i + 2)
        if (len < 2 || i + 2 + len > b.length) return None
        val p0 = i + 4
        marker match {
          case 0xDB => // DQT: repeated (pq<<4|tq, 64 entries)
            var p = p0
            while (p < i + 2 + len) {
              val pq = (b(p) & 0xFF) >> 4; val tq = b(p) & 0x0F
              if (tq > 3) return None
              val t = new Array[Int](64)
              var k = 0
              if (pq == 0) { while (k < 64) { t(k) = b(p + 1 + k) & 0xFF; k += 1 }; p += 65 }
              else { while (k < 64) { t(k) = rdBe16(b, p + 1 + 2 * k); k += 1 }; p += 129 }
              quant(tq) = t
            }
          case 0xC4 => // DHT: repeated (tc<<4|th, 16 counts, symbols)
            var p = p0
            while (p < i + 2 + len) {
              val tc = (b(p) & 0xFF) >> 4; val th = b(p) & 0x0F
              if (tc > 1 || th > 3) return None
              val counts = Array.tabulate(16)(k => b(p + 1 + k) & 0xFF)
              val n = counts.sum
              val syms = Array.tabulate(n)(k => b(p + 17 + k) & 0xFF)
              val tab = new HuffTable(counts, syms)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              p += 17 + n
            }
          case 0xC0 | 0xC1 => // baseline / extended-sequential Huffman
            if ((b(p0) & 0xFF) != 8) return None // 12-bit: unsupported
            h = rdBe16(b, p0 + 1); w = rdBe16(b, p0 + 3)
            nComp = b(p0 + 5) & 0xFF
            if (w == 0 || h == 0 || nComp == 0 || nComp > 4) return None
            compId = new Array[Int](nComp)
            compH = new Array[Int](nComp); compV = new Array[Int](nComp)
            compQ = new Array[Int](nComp)
            var c = 0
            while (c < nComp) {
              compId(c) = b(p0 + 6 + 3 * c) & 0xFF
              val hv = b(p0 + 7 + 3 * c) & 0xFF
              compH(c) = hv >> 4; compV(c) = hv & 0x0F
              if (compH(c) < 1 || compH(c) > 4 || compV(c) < 1 || compV(c) > 4)
                return None
              compQ(c) = b(p0 + 8 + 3 * c) & 0xFF
              c += 1
            }
          case m if m >= 0xC2 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC =>
            return None // progressive/arithmetic/lossless/hierarchical
          case 0xDD =>
            restartInterval = rdBe16(b, p0)
          case 0xDA => // SOS: decode the scan and return
            if (compH == null) return None
            val ns = b(p0) & 0xFF
            if (ns != nComp) return None // non-interleaved multi-scan: out of scope
            val scanDc = new Array[Int](nComp); val scanAc = new Array[Int](nComp)
            var s = 0
            while (s < ns) {
              val cs = b(p0 + 1 + 2 * s) & 0xFF
              val c = compId.indexOf(cs)
              if (c < 0) return None
              scanDc(c) = (b(p0 + 2 + 2 * s) & 0xFF) >> 4
              scanAc(c) = b(p0 + 2 + 2 * s) & 0x0F
              s += 1
            }
            return decodeScan(b, i + 2 + len, w, h, nComp, compH, compV,
              compQ, quant, dcTabs, acTabs, scanDc, scanAc, restartInterval)
          case _ => () // APPn / COM / others: skip
        }
        i += 2 + len
      }
    }
    None
  }

  /** Entropy-decode the interleaved scan starting at `start`; returns the
    * full-resolution luminance plane. */
  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
      nComp: Int, compH: Array[Int], compV: Array[Int], compQ: Array[Int],
      quant: Array[Array[Int]], dcTabs: Array[HuffTable],
      acTabs: Array[HuffTable], scanDc: Array[Int], scanAc: Array[Int],
      restartInterval: Int): Option[DecodedGray] = {
    val hMax = compH.max; val vMax = compV.max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // luminance plane at its native sampling resolution, MCU-padded
    val yW = mcusX * compH(0) * 8
    val yH = mcusY * compV(0) * 8
    if (yW.toLong * yH > (1L << 26)) return None // absurd dims (a 600dpi A3 is ~50M px): bail before allocating
    val yPlane = new Array[Int](yW * yH)

    // bit reader over the entropy segment (FF00 unstuffing; FF + RSTn is
    // consumed only via expectRestart at MCU boundaries)
    var pos = start
    var bits = 0; var nBits = 0
    def nextBit(): Int = {
      if (nBits == 0) {
        if (pos >= b.length) throw new IllegalStateException("eof")
        var v = b(pos) & 0xFF; pos += 1
        if (v == 0xFF) {
          val m = if (pos < b.length) b(pos) & 0xFF else -1
          if (m == 0x00) pos += 1
          else throw new IllegalStateException(s"marker $m in scan")
          v = 0xFF
        }
        bits = v; nBits = 8
      }
      nBits -= 1
      (bits >> nBits) & 1
    }
    def decodeSym(t: HuffTable): Int = {
      var code = nextBit()
      var l = 1
      while (code > t.maxCode(l)) {
        if (l >= 16) throw new IllegalStateException("bad code")
        code = (code << 1) | nextBit()
        l += 1
      }
      t.symbol(l, code)
    }
    def receiveExtend(s: Int): Int = {
      if (s == 0) return 0
      var v = 0
      var k = 0
      while (k < s) { v = (v << 1) | nextBit(); k += 1 }
      if (v < (1 << (s - 1))) v - (1 << s) + 1 else v
    }
    def expectRestart(n: Int): Unit = {
      nBits = 0 // byte-align
      if (pos + 1 >= b.length || (b(pos) & 0xFF) != 0xFF ||
        (b(pos + 1) & 0xFF) != 0xD0 + (n & 7))
        throw new IllegalStateException("missing RST")
      pos += 2
    }

    val preds = new Array[Int](nComp)
    val coefs = new Array[Int](64)
    val blockPx = Array.ofDim[Double](8, 8)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rstIdx = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        expectRestart(rstIdx); rstIdx = (rstIdx + 1) & 7
        java.util.Arrays.fill(preds, 0)
      }
      val mx = mcu % mcusX; val my = mcu / mcusX
      var c = 0
      while (c < nComp) {
        val dcT = dcTabs(scanDc(c)); val acT = acTabs(scanAc(c))
        if (dcT == null || acT == null) return None
        val qt = quant(compQ(c))
        if (qt == null) return None
        var v = 0
        while (v < compV(c)) {
          var u = 0
          while (u < compH(c)) {
            // ---- one 8×8 block: DC + AC coefficient parse
            java.util.Arrays.fill(coefs, 0)
            val t = decodeSym(dcT)
            preds(c) += receiveExtend(t)
            coefs(0) = preds(c) * qt(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = decodeSym(acT)
              val r = rs >> 4; val ssss = rs & 0x0F
              if (ssss == 0) {
                if (r == 15) k += 16 else eob = true
              } else {
                k += r
                if (k > 63) throw new IllegalStateException("AC overrun")
                coefs(Zigzag(k)) = receiveExtend(ssss) * qt(k)
                k += 1
              }
            }
            if (c == 0) {
              // ---- dequantized luminance block → IDCT → plane
              var x = 0
              while (x < 8) {
                var y = 0
                while (y < 8) {
                  var sum = 0.0
                  var uu = 0
                  while (uu < 8) {
                    var vv = 0
                    val cx = idctCos(x)(uu)
                    while (vv < 8) {
                      val f = coefs(uu * 8 + vv)
                      if (f != 0) sum += cx * idctCos(y)(vv) * f
                      vv += 1
                    }
                    uu += 1
                  }
                  blockPx(x)(y) = sum
                  y += 1
                }
                x += 1
              }
              val bx0 = (mx * compH(0) + u) * 8
              val by0 = (my * compV(0) + v) * 8
              var yy = 0
              while (yy < 8) {
                var xx = 0
                while (xx < 8) {
                  val p = math.max(0, math.min(255,
                    math.round(blockPx(yy)(xx) + 128).toInt))
                  yPlane((by0 + yy) * yW + bx0 + xx) = p
                  xx += 1
                }
                yy += 1
              }
            }
            u += 1
          }
          v += 1
        }
        c += 1
      }
      mcu += 1
    }

    // nearest-sample the (possibly subsampled, MCU-padded) Y plane onto
    // the frame's WxH grid
    val out = new Array[Int](w * h)
    val sx = compH(0).toDouble / hMax
    val sy = compV(0).toDouble / vMax
    var yy = 0
    while (yy < h) {
      val py = math.min(yH - 1, (yy * sy).toInt)
      var xx = 0
      while (xx < w) {
        out(yy * w + xx) = yPlane(py * yW + math.min(yW - 1, (xx * sx).toInt))
        xx += 1
      }
      yy += 1
    }
    Some(DecodedGray(w, h, out))
  }

  /** PNG decode to grayscale pixels (RFC 2083): 8-bit depth, color types
    * 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), all five
    * scanline filters (None/Sub/Up/Average/Paeth), non-interlaced.
    * Color → luminance via the integer Rec.601 weights
    * (299·R + 587·G + 114·B + 500) / 1000 — deterministic, no floats.
    * 16-bit depth, Adam7 interlace and structural inconsistencies return
    * None — like [[decodeJpeg]], a probe over crawl bytes never throws. */
  def decodePng(b: Array[Byte]): Option[DecodedGray] = {
    if (b == null || b.length < 8 || (b(0) & 0xFF) != 0x89 ||
      b(1) != 'P' || b(2) != 'N' || b(3) != 'G') return None
    try decodePngUnsafe(b)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodePngUnsafe(b: Array[Byte]): Option[DecodedGray] = {
    var o = 8
    var w = 0; var h = 0; var depth = 0; var colorType = -1
    var palette: Array[Int] = null // packed 0xRRGGBB
    val idat = new ByteArrayOutputStream()
    var done = false
    while (!done && o + 8 <= b.length) {
      val len = rdBe32(b, o)
      if (len < 0 || o + 12 + len > b.length) return None
      val typ = new String(b, o + 4, 4, StandardCharsets.US_ASCII)
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = rdBe32(b, o + 8); h = rdBe32(b, o + 12)
          depth = b(o + 16) & 0xFF; colorType = b(o + 17) & 0xFF
          val interlace = b(o + 20) & 0xFF
          if (w <= 0 || h <= 0 || depth != 8 || interlace != 0) return None
          if (colorType != 0 && colorType != 2 && colorType != 3 &&
            colorType != 4 && colorType != 6) return None
          if (w.toLong * h > (1L << 26)) return None // same cap as decodeJpeg
        case "PLTE" =>
          if (len % 3 != 0) return None
          palette = Array.tabulate(len / 3)(k =>
            ((b(o + 8 + 3 * k) & 0xFF) << 16) |
              ((b(o + 9 + 3 * k) & 0xFF) << 8) | (b(o + 10 + 3 * k) & 0xFF))
        case "IDAT" => idat.write(b, o + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped; CRCs not verified
      }
      o += 12 + len
    }
    if (colorType < 0 || idat.size() == 0) return None
    if (colorType == 3 && palette == null) return None
    val ch = colorType match {
      case 0 | 3 => 1
      case 4 => 2
      case 2 => 3
      case 6 => 4
    }
    val rowLen = 1 + ch * w
    val raw = new Array[Byte](rowLen * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    while (!inf.finished() && off < raw.length) {
      val n = inf.inflate(raw, off, raw.length - off)
      if (n == 0 && !inf.finished()) { inf.end(); return None } // truncated
      off += n
    }
    inf.end()
    if (off != raw.length) return None

    // defilter in place (RFC 2083 §6): a = left, b = up, c = up-left —
    // all on the RECONSTRUCTED bytes, at bpp (= ch) offsets
    var y = 0
    while (y < h) {
      val rs = y * rowLen
      val ft = raw(rs) & 0xFF
      if (ft > 4) return None
      var i = 1
      while (i <= ch * w) {
        val x = raw(rs + i) & 0xFF
        val a = if (i > ch) raw(rs + i - ch) & 0xFF else 0
        val up = if (y > 0) raw(rs - rowLen + i) & 0xFF else 0
        val c = if (y > 0 && i > ch) raw(rs - rowLen + i - ch) & 0xFF else 0
        val recon = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + up
          case 3 => x + ((a + up) >> 1)
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up)
            val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c)
        }
        raw(rs + i) = (recon & 0xFF).toByte
        i += 1
      }
      y += 1
    }

    val out = new Array[Int](w * h)
    var yy = 0
    while (yy < h) {
      val rs = yy * rowLen + 1
      var xx = 0
      while (xx < w) {
        val p = rs + ch * xx
        out(yy * w + xx) = colorType match {
          case 0 | 4 => raw(p) & 0xFF
          case 3 =>
            val idx = raw(p) & 0xFF
            if (idx >= palette.length) return None
            val rgb = palette(idx)
            (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
              114 * (rgb & 0xFF) + 500) / 1000
          case _ =>
            (299 * (raw(p) & 0xFF) + 587 * (raw(p + 1) & 0xFF) +
              114 * (raw(p + 2) & 0xFF) + 500) / 1000
        }
        xx += 1
      }
      yy += 1
    }
    Some(DecodedGray(w, h, out))
  }

  /** Dispatch on the payload's magic: baseline JPEG or PNG → grayscale
    * pixels; anything else → None. The one entry point pixel-content
    * probes should use. */
  def decodeImage(b: Array[Byte]): Option[DecodedGray] = {
    if (b == null || b.length < 8) None
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) decodeJpeg(b)
    else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P') decodePng(b)
    // PDF-embedded JBIG2 has no magic; Jbig2.decode structurally sniffs
    // the segment stream and rejects arbitrary binaries
    else Jbig2.decode(b)
  }

  /** Walk raw JBIG2 segment headers (number(4) flags(1) referred-segment
    * spec, page association, data length(4)) to the page-information
    * segment (type 48) and read its region width/height. Bounded walk;
    * any structural inconsistency → None. */
  private def jbig2PageDims(b: Array[Byte]): Option[(Int, Int, String)] = {
    var i = 0
    var guard = 0
    while (i + 11 < b.length && guard < 64) {
      guard += 1
      // the very first segment of a plausible JBIG2 stream has a small
      // number and a known type — reject arbitrary binaries early
      if (guard == 1 && ((rdBe32(b, 0) & 0xFFFF0000) != 0 ||
        (b(4) & 0x3F) > 53)) return None
      // header arithmetic shared with Jbig2.decodeUnsafe (one
      // implementation of the refSize/long-form/page-assoc walk);
      // requireData = false: dims must be readable from a truncated or
      // dataLen-overdeclared stream too — the PdfParse cross-check
      // flags mismatched dims on payloads too broken to decode
      val hdr = Jbig2.segmentHeader(b, i, requireData = false)
      if (hdr == null) return None
      val j = hdr(1)
      if (hdr(0) == 48) {
        if (j + 8 > b.length) return None
        return Some((rdBe32(b, j), rdBe32(b, j + 4), "jbig2"))
      }
      i = j + hdr(2)
    }
    None
  }

  private def rdBe32(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
      ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
  private def rdBe16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def rdLe32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def rdLe16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)

  /** Detect the container by magic bytes and extract metadata. Unknown or
    * truncated payloads parse as kind="unknown" (the pipeline's error-row
    * channel, never an exception). */
  def parse(bytes: Array[Byte]): MediaMeta = {
    if (bytes == null || bytes.length < 12) return MediaMeta("unknown", 0, 0, 0, 0)
    if (bytes.take(8).sameElements(PngSig)) parsePng(bytes)
    else if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) parseJpeg(bytes)
    else if (bytes.take(4).sameElements("RIFF".getBytes(StandardCharsets.US_ASCII)) &&
      bytes.slice(8, 12).sameElements("WAVE".getBytes(StandardCharsets.US_ASCII)))
      parseWav(bytes)
    else MediaMeta("unknown", 0, 0, 0, 0)
  }

  private def parsePng(b: Array[Byte]): MediaMeta = {
    // walk chunks from offset 8 until IHDR (must be first per spec, but walk
    // defensively). Chunk lengths are attacker-controlled: a negative or
    // oversized length must parse as unknown, never loop or throw.
    var o = 8
    while (o + 8 <= b.length) {
      val len = rdBe32(b, o)
      if (len < 0 || len > b.length) return MediaMeta("unknown", 0, 0, 0, 0)
      val typ = new String(b.slice(o + 4, o + 8), StandardCharsets.US_ASCII)
      if (typ == "IHDR" && o + 8 + 8 <= b.length)
        return MediaMeta("image/png", rdBe32(b, o + 8), rdBe32(b, o + 12), 1, 0)
      o += 12 + len
    }
    MediaMeta("unknown", 0, 0, 0, 0)
  }

  private def parseJpeg(b: Array[Byte]): MediaMeta = {
    var o = 2
    while (o + 1 < b.length && (b(o) & 0xFF) == 0xFF) {
      // ITU T.81 §B.1.1.2: any number of 0xFF fill bytes may precede a marker
      var mk = o + 1
      while (mk < b.length && (b(mk) & 0xFF) == 0xFF) mk += 1
      if (mk >= b.length) return MediaMeta("unknown", 0, 0, 0, 0)
      val marker = b(mk) & 0xFF
      if (marker == 0xD9) return MediaMeta("unknown", 0, 0, 0, 0) // EOI before SOF
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        o = mk + 1 // standalone markers carry no length
      } else {
        if (mk + 3 > b.length) return MediaMeta("unknown", 0, 0, 0, 0)
        val len = rdBe16(b, mk + 1)
        if (len < 2) return MediaMeta("unknown", 0, 0, 0, 0)
        if (marker >= 0xC0 && marker <= 0xC3 && mk + 8 <= b.length)
          return MediaMeta("image/jpeg", rdBe16(b, mk + 6), rdBe16(b, mk + 4), 1, 0)
        o = mk + 1 + len
      }
    }
    MediaMeta("unknown", 0, 0, 0, 0)
  }

  private def parseWav(b: Array[Byte]): MediaMeta = {
    var o = 12
    var sampleRate = 0
    var channels = 1
    var bits = 16
    var dataLen = -1
    while (o + 8 <= b.length) {
      val id = new String(b.slice(o, o + 4), StandardCharsets.US_ASCII)
      val len = rdLe32(b, o + 4)
      if (len < 0 || len > b.length) return MediaMeta("unknown", 0, 0, 0, 0)
      if (id == "fmt " && o + 24 <= b.length) {
        channels = math.max(1, rdLe16(b, o + 10))
        sampleRate = rdLe32(b, o + 12)
        bits = math.max(8, rdLe16(b, o + 22))
      } else if (id == "data") {
        dataLen = len
      }
      o += 8 + len + (len & 1) // RIFF chunks are word-aligned
    }
    if (sampleRate <= 0 || dataLen < 0) return MediaMeta("unknown", 0, 0, 0, 0)
    val frames = dataLen / (channels * (bits / 8))
    MediaMeta("audio/wav", 0, 0, frames, sampleRate)
  }
}
