package graft.kernel

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import org.scalatest.funsuite.AnyFunSuite

/** CCITT G4 codec spec. The load-bearing tests cross-check BOTH codec
  * directions against the JDK's ImageIO TIFF plugin — an independent
  * CCITT T.6 implementation that shares no tables or code with
  * CcittG4.scala — so a wrong entry in the T.4 Huffman tables (which a
  * pure encode→decode round-trip can never catch: both sides would share
  * the error) fails loudly here.
  */
class CcittG4Spec extends AnyFunSuite {

  /** Deterministic text-page-like bilevel pattern: light background with
    * dark "ink" rows of varying run structure (splitmix-derived). */
  private def pattern(width: Int, height: Int, seed: Long): (Int, Int) => Boolean = {
    (x: Int, y: Int) => {
      val h = Hashing.mix(seed + y * 7919L + x / 11)
      // ink about 20% of cells, in horizontal dashes (run-shaped)
      (h & 0xFF) < 52 && (x % 11) < 7
    }
  }

  private def raster(width: Int, height: Int, f: (Int, Int) => Boolean): Array[Boolean] = {
    val out = new Array[Boolean](width * height)
    for (y <- 0 until height; x <- 0 until width) out(y * width + x) = f(x, y)
    out
  }

  // --------------------------------------------------- ImageIO helpers

  /** Compress a bilevel raster with ImageIO's TIFF CCITT T.6 writer and
    * return (tiffBytes, stripBytes, photometric). */
  private def imageioCompress(width: Int, height: Int,
      black: (Int, Int) => Boolean): (Array[Byte], Array[Byte], Int) = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_BINARY)
    val r = img.getRaster
    for (y <- 0 until height; x <- 0 until width)
      r.setSample(x, y, 0, if (black(x, y)) 0 else 1) // 0=black in TYPE_BYTE_BINARY
    val wr = ImageIO.getImageWritersByFormatName("TIFF").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("CCITT T.6")
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new IIOImage(img, null, null), p)
    ios.flush(); wr.dispose()
    val tiff = bos.toByteArray
    val (strip, photometric) = tiffStrip(tiff)
    (tiff, strip, photometric)
  }

  /** Minimal TIFF IFD walk: returns the single G4 strip + photometric. */
  private def tiffStrip(b: Array[Byte]): (Array[Byte], Int) = {
    val le = b(0) == 'I'
    def u16(o: Int): Int =
      if (le) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
      else ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
    def u32(o: Int): Int =
      if (le) (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
        ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
      else ((b(o) & 0xFF) << 24) | ((b(o + 1) & 0xFF) << 16) |
        ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
    val ifd = u32(4)
    val n = u16(ifd)
    var offsets: Array[Int] = Array.empty
    var counts: Array[Int] = Array.empty
    var photometric = 0
    var compression = -1
    for (i <- 0 until n) {
      val e = ifd + 2 + i * 12
      val tag = u16(e)
      val typ = u16(e + 2)
      val cnt = u32(e + 4)
      def value(j: Int): Int = {
        val sz = if (typ == 3) 2 else 4
        val base = if (cnt * sz <= 4) e + 8 else u32(e + 8)
        if (typ == 3) u16(base + j * 2) else u32(base + j * 4)
      }
      tag match {
        case 259 => compression = value(0)
        case 262 => photometric = value(0)
        case 273 => offsets = Array.tabulate(cnt)(value)
        case 279 => counts = Array.tabulate(cnt)(value)
        case _ =>
      }
    }
    assert(compression == 4, s"expected CCITT T.6 strip, got $compression")
    assert(offsets.length == 1, s"need a single strip, got ${offsets.length}")
    (java.util.Arrays.copyOfRange(b, offsets(0), offsets(0) + counts(0)),
      photometric)
  }

  /** Wrap a raw G4 stream in a minimal little-endian TIFF (WhiteIsZero)
    * so ImageIO can read it back. */
  private def wrapTiff(strip: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def le16(v: Int): Unit = { bos.write(v & 0xFF); bos.write((v >> 8) & 0xFF) }
    def le32(v: Int): Unit = { le16(v & 0xFFFF); le16((v >>> 16) & 0xFFFF) }
    bos.write('I'); bos.write('I'); le16(42); le32(8)
    val tags = Seq( // (tag, type, count, value) — SHORT=3, LONG=4
      (256, 4, 1, width), (257, 4, 1, height), (258, 3, 1, 1),
      (259, 3, 1, 4), (262, 3, 1, 0), (273, 4, 1, 0 /*patched*/),
      (277, 3, 1, 1), (278, 4, 1, height), (279, 4, 1, strip.length))
    val stripOff = 8 + 2 + tags.length * 12 + 4
    le16(tags.length)
    for ((tag, typ, cnt, v0) <- tags) {
      val v = if (tag == 273) stripOff else v0
      le16(tag); le16(typ); le32(cnt)
      if (typ == 3) { le16(v); le16(0) } else le32(v)
    }
    le32(0) // next IFD
    bos.write(strip)
    bos.toByteArray
  }

  // --------------------------------------------------------------- tests

  test("decoder reads ImageIO's independently-encoded T.6 strips " +
    "bit-exactly (table cross-check, multiple shapes)") {
    for ((w, h, seed) <- Seq((64, 32, 1L), (101, 47, 2L), (640, 96, 3L),
        (13, 90, 4L))) {
      val f = pattern(w, h, seed)
      val (_, strip, photometric) = imageioCompress(w, h, f)
      assert(photometric == 0, "ImageIO writes WhiteIsZero for CCITT")
      val dec = CcittG4.decode(strip, w, h)
      assert(dec.isDefined, s"decode failed for ${w}x$h")
      val d = dec.get
      val expect = raster(w, h, f)
      for (i <- 0 until w * h)
        assert((d.pixels(i) == 0) == expect(i),
          s"pixel $i mismatch at ${w}x$h seed $seed")
    }
  }

  test("ImageIO reads this encoder's streams bit-exactly " +
    "(encoder-side table cross-check)") {
    for ((w, h, seed) <- Seq((64, 32, 5L), (101, 47, 6L), (320, 64, 7L))) {
      val f = pattern(w, h, seed)
      val enc = CcittG4.encode(w, h, f)
      val img = ImageIO.read(new ByteArrayInputStream(wrapTiff(enc, w, h)))
      assert(img != null, "ImageIO could not read wrapped stream")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val isBlack = (img.getRGB(x, y) & 0xFF) < 128
        assert(isBlack == f(x, y), s"pixel ($x,$y) mismatch at ${w}x$h")
      }
    }
  }

  test("round-trip: edge rasters (all white, all black, single-pixel " +
    "checker columns, width not a byte multiple)") {
    val cases: Seq[(Int, Int, (Int, Int) => Boolean)] = Seq(
      (40, 12, (_, _) => false),
      (40, 12, (_, _) => true),
      (37, 9, (x, _) => x % 2 == 0),
      (33, 7, (x, y) => (x + y) % 2 == 0), // worst case: checkerboard
      (1, 5, (_, y) => y % 2 == 0),
      (61, 1, (x, _) => x > 30))
    for (((w, h, f), i) <- cases.zipWithIndex) {
      val enc = CcittG4.encode(w, h, f)
      val dec = CcittG4.decode(enc, w, h)
      assert(dec.isDefined, s"case $i decode failed")
      for (y <- 0 until h; x <- 0 until w)
        assert((dec.get.pixels(y * w + x) == 0) == f(x, y),
          s"case $i pixel ($x,$y)")
    }
  }

  test("round-trip: long runs exercise makeup + extended-makeup codes " +
    "(width 3000 > 2624 forces repeated 2560 makeups)") {
    val w = 3000; val h = 4
    val f = (x: Int, y: Int) => y == 1 || (y == 2 && x >= 2900)
    val enc = CcittG4.encode(w, h, f)
    val dec = CcittG4.decode(enc, w, h)
    assert(dec.isDefined)
    for (y <- 0 until h; x <- 0 until w)
      assert((dec.get.pixels(y * w + x) == 0) == f(x, y), s"pixel ($x,$y)")
  }

  test("malformed inputs: never throws, returns None on garbage, " +
    "truncation, and absurd dims") {
    val f = pattern(80, 40, 11L)
    val enc = CcittG4.encode(80, 40, f)
    assert(CcittG4.decode(null, 80, 40).isEmpty)
    assert(CcittG4.decode(Array.empty[Byte], 80, 40).isEmpty)
    assert(CcittG4.decode(enc, 0, 40).isEmpty)
    assert(CcittG4.decode(enc, 80, 1 << 20).isEmpty)
    assert(CcittG4.decode(enc.take(enc.length / 2), 80, 40).isEmpty)
    // wrong width: either decodes-as-something or None, but never throws
    CcittG4.decode(enc, 79, 40)
    CcittG4.decode(enc, 400, 40)
    // byte-flip fuzz (the MediaCodecSpec fuzz recipe)
    for (i <- enc.indices by 3; bit <- Seq(0x01, 0x80)) {
      val mut = enc.clone()
      mut(i) = (mut(i) ^ bit).toByte
      CcittG4.decode(mut, 80, 40).foreach { d =>
        assert(d.pixels.length == 80 * 40)
      }
    }
  }
}
