package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** MediaCodec: real container bytes in, parsed metadata out. */
class MediaCodecSpec extends AnyFunSuite {

  test("PNG round trip: real signature, IHDR dims, CRC32, IEND") {
    val b = MediaCodec.encodePng(640, 480)
    assert(b.length == 45)
    // real PNG magic
    assert((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
    val m = MediaCodec.parse(b)
    assert(m.kind == "image/png" && m.width == 640 && m.height == 480 &&
      m.frames == 1)
    // IHDR CRC is a real CRC32 over type+data
    val crc = new java.util.zip.CRC32
    crc.update(b, 12, 4 + 13)
    val stored = ((b(29) & 0xFFL) << 24) | ((b(30) & 0xFFL) << 16) |
      ((b(31) & 0xFFL) << 8) | (b(32) & 0xFFL)
    assert(stored == (crc.getValue & 0xFFFFFFFFL))
  }

  test("JPEG round trip: SOI/APP0/SOF0 walk finds dimensions") {
    val b = MediaCodec.encodeJpeg(1024, 3)
    assert(b.length == 41)
    assert((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8)
    val m = MediaCodec.parse(b)
    assert(m.kind == "image/jpeg" && m.width == 1024 && m.height == 3)
  }

  test("WAV round trip: RIFF chunk walk computes frames from data/fmt") {
    val b = MediaCodec.encodeWav(16000, 75)
    assert(b.length == 44 + 150)
    val m = MediaCodec.parse(b)
    assert(m.kind == "audio/wav" && m.sampleRate == 16000 && m.frames == 75)
  }

  test("WAV PCM decode + audio features: real 16-bit LE samples round-trip") {
    // hand-built PCM: a square wave ±1000 → known RMS and crossings
    val samples = Array.tabulate(40)(k => if (k % 4 < 2) 1000 else -1000)
    val dataBytes = samples.flatMap(s =>
      Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte))
    val wav =
      "RIFF".getBytes("US-ASCII") ++
        Array[Byte]((36 + 80).toByte, 0, 0, 0) ++
        "WAVE".getBytes("US-ASCII") ++ "fmt ".getBytes("US-ASCII") ++
        Array[Byte](16, 0, 0, 0, 1, 0, 1, 0) ++
        Array[Byte](0x40, 0x1F, 0, 0) ++ // 8000 Hz
        Array[Byte]((0x80 & 0xFF).toByte, 0x3E, 0, 0, 2, 0, 16, 0) ++
        "data".getBytes("US-ASCII") ++ Array[Byte](80, 0, 0, 0) ++ dataBytes
    val pcm = MediaCodec.wavPcmSamples(wav)
    assert(pcm.toSeq == samples.toSeq)
    val f = MediaCodec.audioFeatures(pcm, 8000)
    assert(f.nSamples == 40)
    assert(f.rms == 1000.0) // constant magnitude → RMS exact
    assert(f.zeroCrossings == 19) // sign flips every 2 samples over 40
    assert(f.durationMs == 40 * 1000 / 8000)
    // synthesized payloads decode too
    val synth = MediaCodec.encodeWav(16000, 50)
    assert(MediaCodec.wavPcmSamples(synth).length == 50)
    assert(MediaCodec.wavPcmSamples(Array.fill(20)(1.toByte)).isEmpty)
  }

  // ------------------------------------------------------------ glyph ink

  /** Fully decode one of our PNGs (chunk walk, IDAT inflate, filter-0
    * defilter) and count black pixels — an independent reader's view. */
  private def pngInkPixels(png: Array[Byte]): Int = {
    def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
        ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
    var o = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    while (o + 8 <= png.length) {
      val len = be32(png, o)
      val typ = new String(png.slice(o + 4, o + 8), "US-ASCII")
      if (typ == "IHDR") { w = be32(png, o + 8); h = be32(png, o + 12) }
      if (typ == "IDAT") idat.write(png, o + 8, len)
      o += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val rowLen = 1 + 3 * w
    val raw = new Array[Byte](rowLen * h)
    var off = 0
    while (!inf.finished() && off < raw.length)
      off += inf.inflate(raw, off, raw.length - off)
    inf.end()
    assert(off == raw.length, "IDAT must decode to full scanlines")
    var ink = 0
    for (r <- 0 until h) {
      assert(raw(r * rowLen) == 0) // filter type None
      for (c <- 0 until w)
        if (raw(r * rowLen + 1 + 3 * c) == 0) ink += 1
    }
    ink
  }

  test("PNG glyph ink: decoded rasters are non-uniform and pixel-exact") {
    assert(pngInkPixels(MediaCodec.renderPng(100, 100)) == 0) // blank page
    // 'A' in the 5×7 font has exactly 18 set bits → 18 ink pixels at scale 1
    assert(pngInkPixels(MediaCodec.renderPng(100, 100, Seq("A"))) == 18)
    // lowercase maps to the same glyph; unknown chars render blank
    assert(pngInkPixels(MediaCodec.renderPng(100, 100, Seq("a"))) == 18)
    assert(pngInkPixels(MediaCodec.renderPng(100, 100, Seq("é"))) == 0)
  }

  test("PNG glyph ink: coverage correlates with text length and dpi scale") {
    val short = pngInkPixels(MediaCodec.renderPng(612, 792, Seq("short line")))
    val long = pngInkPixels(MediaCodec.renderPng(612, 792,
      (1 to 20).map(_ => "a much longer body of page text per line")))
    assert(short > 0 && long > short * 5)
    // doubling the scale (2× dpi) roughly quadruples ink pixel area
    val s1 = pngInkPixels(MediaCodec.renderPng(612, 792, Seq("INK AT SCALE")))
    val s2 = pngInkPixels(MediaCodec.renderPng(1224, 1584, Seq("INK AT SCALE"), 2.0))
    assert(s2 > s1 * 2, s"scale-2 ink $s2 vs scale-1 $s1")
    // clipping bounds work, not text length: a line far wider than the
    // page inks no more than the page width can hold
    val clipped = pngInkPixels(MediaCodec.renderPng(60, 60, Seq("X" * 10000)))
    assert(clipped <= 60 * 60)
  }

  test("JPEG glyph ink: text pages entropy-code dark blocks (bigger " +
    "payload, same parsed dims)") {
    val blank = MediaCodec.renderJpeg(128, 64)
    val inked = MediaCodec.renderJpeg(128, 64, Seq("HELLO WORLD"))
    val m = MediaCodec.parse(inked)
    assert(m.kind == "image/jpeg" && m.width == 128 && m.height == 64)
    assert(inked.length > blank.length,
      s"ink must add entropy bits: ${inked.length} vs ${blank.length}")
  }

  test("S5 probe-level ink: a text page renders non-uniform, ink tracks " +
    "text_length, blank for empty pages") {
    val probe = new PdfProbe(ProbeConfig(includeImages = true, imageDpi = 72))
    def inkOf(text: String): Int = {
      val page = PdfPage(612, 792, text, None, Vector.empty)
      val b64 = probe.getPageImageSmart(0, page, PageType.Text)
      pngInkPixels(java.util.Base64.getDecoder.decode(b64))
    }
    assert(inkOf("") == 0)
    val one = inkOf("one line of text")
    val many = inkOf((1 to 15).map(_ => "line of body text here").mkString("\n"))
    assert(one > 0 && many > one * 3)
  }

  /** All ink pixel coordinates of one of our PNGs (independent decode). */
  private def pngInkCoords(png: Array[Byte]): Set[(Int, Int)] = {
    def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
        ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
    var o = 8
    var w = 0; var h = 0
    val idat = new java.io.ByteArrayOutputStream()
    while (o + 8 <= png.length) {
      val len = be32(png, o)
      val typ = new String(png.slice(o + 4, o + 8), "US-ASCII")
      if (typ == "IHDR") { w = be32(png, o + 8); h = be32(png, o + 12) }
      if (typ == "IDAT") idat.write(png, o + 8, len)
      o += 12 + len
    }
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val rowLen = 1 + 3 * w
    val raw = new Array[Byte](rowLen * h)
    var off = 0
    while (!inf.finished() && off < raw.length)
      off += inf.inflate(raw, off, raw.length - off)
    inf.end()
    (for {
      r <- 0 until h
      c <- 0 until w
      if raw(r * rowLen + 1 + 3 * c) == 0
    } yield (c, r)).toSet
  }

  test("Td-exact ink: positioned runs place glyphs at their content-stream " +
    "coordinates — a two-column fixture renders two ink columns") {
    // two columns on a 612×792 page: left margin x=72, right column x=306,
    // both at baseline y=700 (PDF y up → raster rows near 792-707=85)
    val runs = Seq((72.0, 700.0, "LEFT"), (306.0, 700.0, "RIGHT"))
    val ink = pngInkCoords(MediaCodec.renderPng(612, 792, Seq.empty, 1.0, runs))
    assert(ink.nonEmpty)
    val xs = ink.map(_._1); val ys = ink.map(_._2)
    // left column ink spans [72, 72+4·6+5); right spans [306, 306+5·6+5)
    assert(xs.min >= 72 && xs.min < 78, s"left column start ${xs.min}")
    assert(xs.max >= 306 && xs.max < 306 + 35, s"right column end ${xs.max}")
    // the gutter between the columns carries NO ink
    assert(!xs.exists(x => x >= 72 + 24 && x < 306), "gutter must be blank")
    // vertical placement: glyph rows sit at raster y = 792-(700+7)..+7
    assert(ys.min == 85 && ys.max <= 92, s"rows ${ys.min}..${ys.max}")

    // shifting a run's Td x by +100 shifts its ink bounding box by exactly
    // +100·scale; doubling dpi doubles the offset in pixels
    def boxAt(x: Double, scale: Double): (Int, Int) = {
      val px = pngInkCoords(MediaCodec.renderPng((612 * scale).toInt,
        (792 * scale).toInt, Seq.empty, scale, Seq((x, 400.0, "M")))).map(_._1)
      (px.min, px.max)
    }
    val (l1, _) = boxAt(100.0, 1.0)
    val (l2, _) = boxAt(200.0, 1.0)
    assert(l2 - l1 == 100, s"Td +100 must shift ink +100px, got ${l2 - l1}")
    val (l3, _) = boxAt(100.0, 2.0)
    val (l4, _) = boxAt(200.0, 2.0)
    assert(l4 - l3 == 200, s"at 2x dpi Td +100 must shift +200px")
  }

  test("Td-exact ink end-to-end: a real two-column PDF parsed in accuracy " +
    "mode renders its S5 raster with two ink columns at the Td positions") {
    val content = "BT /F1 12 Tf 72 700 Td (LEFTCOL) Tj ET\n" +
      "BT /F1 12 Tf 306 700 Td (RIGHTCOL) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
      "/Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length ${content.length} >>\nstream\n$content\nendstream\nendobj\n" +
      "%%EOF\n").getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val doc = PdfParse.parse(pdf, needAlt = true)
    assert(doc.pages(0).posRuns.map(r => (r._1, r._2)).toSet ==
      Set((72.0, 700.0), (306.0, 700.0)), doc.pages(0).posRuns.toString)
    val probe = new PdfProbe(ProbeConfig(includeImages = true, imageDpi = 72))
    val b64 = probe.getPageImageSmart(0, doc.pages(0), PageType.Text)
    val ink = pngInkCoords(java.util.Base64.getDecoder.decode(b64))
    val xs = ink.map(_._1)
    assert(xs.min >= 72 && xs.min < 78, s"left column start ${xs.min}")
    assert(xs.max >= 306, s"right column present, max x ${xs.max}")
    assert(!xs.exists(x => x >= 72 + 45 && x < 306), "gutter must be blank")
  }

  test("malformed payloads parse as unknown, never throw") {
    assert(MediaCodec.parse(null).kind == "unknown")
    assert(MediaCodec.parse(Array.empty[Byte]).kind == "unknown")
    assert(MediaCodec.parse(Array.fill(32)(0x42.toByte)).kind == "unknown")
    // truncated PNG: signature only
    assert(MediaCodec.parse(MediaCodec.encodePng(5, 5).take(10)).kind == "unknown")
    // JPEG with EOI before any SOF
    assert(MediaCodec.parse(
      Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte) ++ Array.fill(10)(0.toByte))
      .kind == "unknown")
  }

  test("hostile chunk lengths never hang or throw (negative / oversized)") {
    // PNG with a chunk length of 0xFFFFFFF4 (-12): o += 12 + len would
    // advance by 0 and spin forever without the sanity check
    val badPng = MediaCodec.encodePng(5, 5).clone()
    badPng(8) = 0xFF.toByte; badPng(9) = 0xFF.toByte
    badPng(10) = 0xFF.toByte; badPng(11) = 0xF4.toByte
    assert(MediaCodec.parse(badPng).kind == "unknown")
    // WAV with a negative fmt-chunk length
    val badWav = MediaCodec.encodeWav(8000, 4).clone()
    badWav(16) = 0xF8.toByte; badWav(17) = 0xFF.toByte
    badWav(18) = 0xFF.toByte; badWav(19) = 0xFF.toByte
    assert(MediaCodec.parse(badWav).kind == "unknown")
    assert(MediaCodec.wavPcmSamples(badWav).isEmpty)
  }

  test("JPEG fill bytes before markers are legal (ITU T.81 B.1.1.2)") {
    val b = MediaCodec.encodeJpeg(320, 200)
    // inject extra 0xFF fill bytes before the APP0 marker
    val filled = b.take(2) ++ Array(0xFF.toByte, 0xFF.toByte) ++ b.drop(2)
    val m = MediaCodec.parse(filled)
    assert(m.kind == "image/jpeg" && m.width == 320 && m.height == 200)
  }

  test("audio duration uses Long math (no Int overflow past ~2.1M samples)") {
    val samples = Array.fill(2200000)(100) // 49.9 s at 44.1 kHz
    val f = MediaCodec.audioFeatures(samples, 44100)
    assert(f.durationMs == 2200000L * 1000 / 44100)
    assert(f.durationMs > 0)
  }

  test("synthesize: formulas match the parsed facts for all three kinds") {
    for (id <- 0L until 30L) {
      val b = MediaCodec.synthesize(id)
      val m = MediaCodec.parse(b)
      (id % 3) match {
        case 0 =>
          assert(m.kind == "image/png")
          assert(m.width == MediaCodec.pngWidth(id))
          assert(m.height == MediaCodec.pngHeight(id))
        case 1 =>
          assert(m.kind == "image/jpeg")
          assert(m.width == MediaCodec.pngWidth(id))
          assert(m.height == MediaCodec.pngHeight(id))
        case _ =>
          assert(m.kind == "audio/wav")
          assert(m.sampleRate == MediaCodec.wavSampleRate(id))
          assert(m.frames == MediaCodec.wavSamples(id))
      }
    }
  }

  test("embeddedImageDims: JPEG SOF, PNG IHDR and JBIG2 page-info headers " +
    "parse; CCITT-like raw bitstreams and junk yield None") {
    assert(MediaCodec.embeddedImageDims(MediaCodec.renderJpeg(320, 200))
      .contains((320, 200, "jpeg")))
    assert(MediaCodec.embeddedImageDims(MediaCodec.encodeJpeg(1700, 2200))
      .contains((1700, 2200, "jpeg")))
    assert(MediaCodec.embeddedImageDims(MediaCodec.encodePng(64, 48))
      .contains((64, 48, "png")))
    // handcrafted PDF-embedded JBIG2 stream: one page-information segment
    // (type 48), 1-byte page association, 19-byte data = w, h, xres,
    // yres, flags, striping
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val jb = be32(1) ++ Array(0x30.toByte, 0x00.toByte, 0x01.toByte) ++
      be32(19) ++ be32(640) ++ be32(480) ++ be32(0) ++ be32(0) ++
      Array(0x00.toByte) ++ Array(0x00.toByte, 0x00.toByte)
    assert(MediaCodec.embeddedImageDims(jb).contains((640, 480, "jbig2")))
    // a preceding non-page segment is walked over (symbol dictionary,
    // type 0, empty data)
    val sym = be32(0) ++ Array(0x00.toByte, 0x00.toByte, 0x01.toByte) ++ be32(0)
    assert(MediaCodec.embeddedImageDims(sym ++ jb).contains((640, 480, "jbig2")))
    // junk / truncated payloads never throw
    assert(MediaCodec.embeddedImageDims("raw ccitt g4 bitstream bytes".getBytes)
      .isEmpty)
    assert(MediaCodec.embeddedImageDims(Array[Byte](0xFF.toByte, 0xD8.toByte))
      .isEmpty)
    assert(MediaCodec.embeddedImageDims(null).isEmpty)
    assert(MediaCodec.embeddedImageDims(
      MediaCodec.encodeJpeg(100, 100).take(6)).isEmpty)
  }

  // ------------------------------------------------- baseline JPEG DECODE

  test("decodeJpeg roundtrip on renderJpeg: exact DC-only pixel values " +
    "(white blocks 208 = 40·16/8+128, ink blocks 128), block-uniform, " +
    "dims exact for non-multiple-of-8 frames") {
    // blank page: every block DC 40 → every pixel exactly 208
    val blank = MediaCodec.decodeJpeg(MediaCodec.renderJpeg(100, 52)).get
    assert(blank.width == 100 && blank.height == 52)
    assert(blank.pixels.forall(_ == 208), blank.pixels.distinct.toSeq)
    // text page: pixels land on exactly the two DC levels, ink present,
    // and every 8x8 block is uniform (the encoder is block-granular)
    val d = MediaCodec.decodeJpeg(
      MediaCodec.renderJpeg(128, 96, lines = Seq("Hello decode", "world"),
        scale = 2.0)).get
    assert(d.width == 128 && d.height == 96)
    assert(d.pixels.forall(p => p == 128 || p == 208))
    assert(d.pixels.count(_ == 128) > 0, "expected glyph ink")
    for (by <- 0 until 96 / 8; bx <- 0 until 128 / 8) {
      val vals = for (y <- 0 until 8; x <- 0 until 8)
        yield d.pixels((by * 8 + y) * 128 + bx * 8 + x)
      assert(vals.distinct.size == 1, s"block ($bx,$by) not uniform")
    }
    // ink grows with text, matching the entropy-size monotonicity
    val more = MediaCodec.decodeJpeg(
      MediaCodec.renderJpeg(128, 96,
        lines = Seq("Hello decode", "world", "third line", "and a fourth"),
        scale = 2.0)).get
    assert(more.pixels.count(_ == 128) > d.pixels.count(_ == 128))
  }

  /** Test-local minimal JPEG writer (the encoder's table trick: DC codes
    * '0'→cat0 '10'→cat6, AC '0'→EOB) for layouts renderJpeg never emits. */
  private class MiniJpeg {
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Byte]): Unit = {
      out.write(0xFF); out.write(marker)
      val len = payload.length + 2
      out.write((len >>> 8) & 0xFF); out.write(len & 0xFF)
      out.write(payload, 0, payload.length)
    }
    def be16(v: Int) = Array((v >>> 8).toByte, v.toByte)
    var cur = 0; var n = 0
    def putBits(value: Int, bits: Int): Unit = {
      var k = bits - 1
      while (k >= 0) {
        cur = (cur << 1) | ((value >>> k) & 1); n += 1
        if (n == 8) { out.write(cur); if (cur == 0xFF) out.write(0); cur = 0; n = 0 }
        k -= 1
      }
    }
    def flushBits(): Unit = if (n > 0) {
      cur = (cur << (8 - n)) | ((1 << (8 - n)) - 1)
      out.write(cur); if (cur == 0xFF) out.write(0); cur = 0; n = 0
    }
    /** DC-only block: diff ∈ {0, ±40} + AC EOB. */
    def block(diff: Int): Unit = {
      if (diff == 0) putBits(0, 1)
      else { putBits(2, 2); putBits(if (diff > 0) diff else diff + 63, 6) }
      putBits(0, 1)
    }
    def header(w: Int, h: Int, comps: Array[(Int, Int, Int)]): Unit = {
      out.write(0xFF); out.write(0xD8)
      seg(0xDB, Array[Byte](0) ++ Array.fill[Byte](64)(16))
      seg(0xC0, Array[Byte](8) ++ be16(h) ++ be16(w) ++
        Array(comps.length.toByte) ++
        comps.flatMap { case (id, hv, tq) =>
          Array(id.toByte, hv.toByte, tq.toByte) })
      seg(0xC4, Array[Byte](0x00, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0) ++ Array[Byte](0, 6))
      seg(0xC4, Array[Byte](0x10, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0) ++ Array[Byte](0))
    }
    def sos(comps: Array[Int]): Unit =
      seg(0xDA, Array(comps.length.toByte) ++
        comps.flatMap(id => Array(id.toByte, 0x00.toByte)) ++
        Array[Byte](0, 63, 0))
    def eoi(): Array[Byte] = {
      flushBits(); out.write(0xFF); out.write(0xD9); out.toByteArray
    }
  }

  test("decodeJpeg 4:2:0 three-component: chroma blocks are entropy-parsed " +
    "(stream stays aligned) and the Y quadrants land where the MCU's " +
    "2x2 block order puts them") {
    val j = new MiniJpeg
    j.header(16, 16, Array((1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)))
    j.sos(Array(1, 2, 3))
    // one MCU: 4 Y blocks (TL 0, TR +40, BL back to 0, BR +40) + Cb + Cr
    j.block(0); j.block(40); j.block(-40); j.block(40)
    j.block(0) // Cb
    j.block(0) // Cr
    val d = MediaCodec.decodeJpeg(j.eoi()).get
    assert(d.width == 16 && d.height == 16)
    def px(x: Int, y: Int) = d.pixels(y * 16 + x)
    assert(px(3, 3) == 128 && px(12, 3) == 208 &&
      px(3, 12) == 128 && px(12, 12) == 208,
      (0 until 16).map(y => (0 until 16).map(x => px(x, y)).mkString(","))
        .mkString("\n"))
  }

  test("decodeJpeg honors DRI/RSTn: predictors reset at each restart " +
    "marker and the reader re-aligns to the byte boundary") {
    val j = new MiniJpeg
    j.header(8, 24, Array((1, 0x11, 0)))
    j.seg(0xDD, Array[Byte](0, 1)) // DRI: restart every MCU
    j.sos(Array(1))
    j.block(0); j.flushBits(); j.out.write(0xFF); j.out.write(0xD0)
    j.block(40); j.flushBits(); j.out.write(0xFF); j.out.write(0xD1)
    j.block(0) // pred was RESET: diff 0 → level 0, not 40
    val d = MediaCodec.decodeJpeg(j.eoi()).get
    assert(d.width == 8 && d.height == 24)
    assert((0 until 8).forall(y => d.pixels(y * 8) == 128))
    assert((8 until 16).forall(y => d.pixels(y * 8) == 208))
    assert((16 until 24).forall(y => d.pixels(y * 8) == 128))
  }

  // --------------------------------------------------------- PNG DECODE

  /** Test-local PNG writer with explicit scanline bytes (filter bytes
    * included) for layouts renderPng never emits. */
  private def buildPng(ihdr: Array[Byte], scan: Array[Byte],
      plte: Option[Array[Byte]] = None): Array[Byte] = {
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
        (v >>> 8).toByte, v.toByte)
      be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
    }
    val d = new java.util.zip.Deflater()
    d.setInput(scan); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", ihdr) ++
      plte.map(chunk("PLTE", _)).getOrElse(Array.empty[Byte]) ++
      chunk("IDAT", out.toByteArray) ++ chunk("IEND", Array.empty[Byte])
  }
  private def ihdrOf(w: Int, h: Int, depth: Int, ct: Int,
      interlace: Int = 0): Array[Byte] = {
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    be32(w) ++ be32(h) ++ Array[Byte](depth.toByte, ct.toByte, 0, 0,
      interlace.toByte)
  }

  test("decodePng roundtrip on renderPng: dims exact, ink pixels decode " +
    "to luminance 0 and background to 255, counts agree with the " +
    "independent filter-0 reader") {
    val png = MediaCodec.renderPng(120, 80, lines = Seq("Ink here", "more"),
      scale = 2.0)
    val d = MediaCodec.decodePng(png).get
    assert(d.width == 120 && d.height == 80)
    assert(d.pixels.forall(p => p == 0 || p == 255))
    assert(d.pixels.count(_ == 0) == pngInkPixels(png))
    assert(d.pixels.count(_ == 0) > 0)
    // decodeImage dispatches both containers by magic
    assert(MediaCodec.decodeImage(png).get.width == 120)
    assert(MediaCodec.decodeImage(
      MediaCodec.renderJpeg(64, 64)).get.width == 64)
    assert(MediaCodec.decodeImage("neither".getBytes).isEmpty)
  }

  test("decodePng defilters all five scanline filters (RFC 2083 §6) to " +
    "the exact reference pixels") {
    // grayscale 4x5, one row per filter type; recon rows are
    // 10..40 / 15..45 / 20..50 / 30..60 / 35..65
    val scan = Array[Byte](
      0, 10, 20, 30, 40, // None
      1, 15, 10, 10, 10, // Sub
      2, 5, 5, 5, 5, // Up
      3, 20, 10, 10, 10, // Average
      4, 5, 5, 5, 5) // Paeth
    val d = MediaCodec.decodePng(buildPng(ihdrOf(4, 5, 8, 0), scan)).get
    assert(d.pixels.toSeq == Seq(
      10, 20, 30, 40, 15, 25, 35, 45, 20, 30, 40, 50,
      30, 40, 50, 60, 35, 45, 55, 65))
  }

  test("decodePng color types: palette and RGBA reduce to integer " +
    "Rec.601 luminance; rejects 16-bit, interlaced and truncated input") {
    val pal = buildPng(ihdrOf(2, 1, 8, 3), Array[Byte](0, 0, 1),
      plte = Some(Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0)))
    // red (299*255+500)/1000 = 76; green (587*255+500)/1000 = 150
    assert(MediaCodec.decodePng(pal).get.pixels.toSeq == Seq(76, 150))
    val rgba = buildPng(ihdrOf(1, 1, 8, 6), Array[Byte](0, 10, 20, 30,
      255.toByte))
    // (299*10 + 587*20 + 114*30 + 500)/1000 = 18
    assert(MediaCodec.decodePng(rgba).get.pixels.toSeq == Seq(18))
    assert(MediaCodec.decodePng(
      buildPng(ihdrOf(2, 1, 16, 0), Array[Byte](0, 0, 1, 0, 2))).isEmpty)
    assert(MediaCodec.decodePng(
      buildPng(ihdrOf(4, 5, 8, 0, interlace = 1),
        Array.fill[Byte](25)(0))).isEmpty)
    val ok = MediaCodec.renderPng(64, 64, lines = Seq("x"))
    assert(MediaCodec.decodePng(ok.dropRight(30)).isEmpty)
    assert(MediaCodec.decodePng(null).isEmpty)
  }

  test("decoder fuzz (seeded): byte-flipped real containers and random " +
    "junk never throw and never allocate absurdly — decode is a probe " +
    "over crawl bytes") {
    val rng = new java.util.SplittableRandom(0xF0221L)
    val bases = Seq(
      MediaCodec.renderJpeg(96, 64, lines = Seq("fuzz me", "again")),
      MediaCodec.renderPng(96, 64, lines = Seq("fuzz me", "again")))
    var decoded = 0
    for (it <- 0 until 400) {
      val b = bases(it % 2).clone()
      val flips = 1 + rng.nextInt(6)
      for (_ <- 0 until flips)
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
      if (MediaCodec.decodeImage(b).isDefined) decoded += 1 // must not throw
      val junk = Array.fill[Byte](rng.nextInt(120))(rng.nextInt(256).toByte)
      assert(MediaCodec.decodeImage(junk).isEmpty ||
        junk.length >= 8) // junk without a real magic can never decode
    }
    // sanity: some mutations miss critical bytes and still decode — the
    // fuzz exercised BOTH outcomes, not just early rejects
    assert(decoded > 0 && decoded < 400, s"decoded=$decoded")
  }

  test("decodeJpeg rejects what it cannot decode — never throws: " +
    "header-only JPEGs, progressive frames, truncated entropy, junk") {
    // encodeJpeg emits SOI+APP0+SOF0+EOI (no scan) → structurally valid
    // metadata, not decodable
    assert(MediaCodec.decodeJpeg(MediaCodec.encodeJpeg(64, 64)).isEmpty)
    // progressive SOF2
    val p = new MiniJpeg
    p.out.write(0xFF); p.out.write(0xD8)
    p.seg(0xC2, Array[Byte](8, 0, 16, 0, 16, 1, 1, 0x11, 0))
    assert(MediaCodec.decodeJpeg(p.eoi()).isEmpty)
    // truncated entropy segment
    val full = MediaCodec.renderJpeg(64, 64, lines = Seq("abc"))
    assert(MediaCodec.decodeJpeg(full.dropRight(8)).isEmpty)
    assert(MediaCodec.decodeJpeg("not a jpeg at all".getBytes).isEmpty)
    assert(MediaCodec.decodeJpeg(null).isEmpty)
    assert(MediaCodec.decodeJpeg(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
  }
}
