package graft.kernel

import graft.kernel.MediaCodec.DecodedGray

/** CCITT Group 4 (ITU-T Rec. T.6, "MMR") bilevel codec — pure JVM.
  *
  * This is the workhorse compression of real scanned-document PDFs
  * (`/Filter /CCITTFaxDecode` with `/K -1`): every row is coded 2-D
  * against the previous row via pass / vertical / horizontal modes, with
  * horizontal-mode run lengths in the T.4 modified-Huffman alphabet
  * (terminating codes 0–63, makeup codes 64–1728, shared extended makeups
  * 1792–2560). The bitstream carries NO dimensions — the PDF XObject dict
  * (`/Width /Height`, via a `/DecodeParms /Columns` that PDF writers keep
  * equal to /Width) supplies them, which is why `decode` takes them as
  * arguments and why `MediaCodec.embeddedImageDims` cannot cross-check
  * CCITT payloads.
  *
  * Encoder and decoder are independent implementations of the spec that
  * happen to share the code tables; CcittG4Spec therefore cross-checks
  * BOTH directions against the JDK's own ImageIO TIFF plugin (an
  * unrelated CCITT T.6 implementation): ImageIO-compressed strips must
  * decode here bit-exactly, and streams encoded here must read back
  * bit-exactly through ImageIO. Defaults match PDF's: MSB-first fill
  * order, no EncodedByteAlign, BlackIs1 semantics handled by the caller
  * (decode emits luminance: white=255, black=0).
  *
  * Reference behavior (satish860/ocr-detection `_detector.py:732-803`)
  * reads scanned-image geometry from the XObject dict only; decoding the
  * actual G4 payload is additive fidelity for the pixel-content probe
  * (PdfProbe.imagePixelContent), same contract as the JPEG/PNG decoders.
  */
object CcittG4 {

  // ------------------------------------------------------ MH code tables
  // (run, codeLen, codeBits) per ITU-T T.4 §4.1 Tables 2/3 (terminating +
  // makeup, per color) and Table 4 (extended makeups, shared).

  private val WhiteCodes: Array[(Int, Int, Int)] = Array(
    (0, 8, 0x35), (1, 6, 0x07), (2, 4, 0x7), (3, 4, 0x8), (4, 4, 0xB),
    (5, 4, 0xC), (6, 4, 0xE), (7, 4, 0xF), (8, 5, 0x13), (9, 5, 0x14),
    (10, 5, 0x07), (11, 5, 0x08), (12, 6, 0x08), (13, 6, 0x03),
    (14, 6, 0x34), (15, 6, 0x35), (16, 6, 0x2A), (17, 6, 0x2B),
    (18, 7, 0x27), (19, 7, 0x0C), (20, 7, 0x08), (21, 7, 0x17),
    (22, 7, 0x03), (23, 7, 0x04), (24, 7, 0x28), (25, 7, 0x2B),
    (26, 7, 0x13), (27, 7, 0x24), (28, 7, 0x18), (29, 8, 0x02),
    (30, 8, 0x03), (31, 8, 0x1A), (32, 8, 0x1B), (33, 8, 0x12),
    (34, 8, 0x13), (35, 8, 0x14), (36, 8, 0x15), (37, 8, 0x16),
    (38, 8, 0x17), (39, 8, 0x28), (40, 8, 0x29), (41, 8, 0x2A),
    (42, 8, 0x2B), (43, 8, 0x2C), (44, 8, 0x2D), (45, 8, 0x04),
    (46, 8, 0x05), (47, 8, 0x0A), (48, 8, 0x0B), (49, 8, 0x52),
    (50, 8, 0x53), (51, 8, 0x54), (52, 8, 0x55), (53, 8, 0x24),
    (54, 8, 0x25), (55, 8, 0x58), (56, 8, 0x59), (57, 8, 0x5A),
    (58, 8, 0x5B), (59, 8, 0x4A), (60, 8, 0x4B), (61, 8, 0x32),
    (62, 8, 0x33), (63, 8, 0x34),
    // makeup
    (64, 5, 0x1B), (128, 5, 0x12), (192, 6, 0x17), (256, 7, 0x37),
    (320, 8, 0x36), (384, 8, 0x37), (448, 8, 0x64), (512, 8, 0x65),
    (576, 8, 0x68), (640, 8, 0x67), (704, 9, 0xCC), (768, 9, 0xCD),
    (832, 9, 0xD2), (896, 9, 0xD3), (960, 9, 0xD4), (1024, 9, 0xD5),
    (1088, 9, 0xD6), (1152, 9, 0xD7), (1216, 9, 0xD8), (1280, 9, 0xD9),
    (1344, 9, 0xDA), (1408, 9, 0xDB), (1472, 9, 0x98), (1536, 9, 0x99),
    (1600, 9, 0x9A), (1664, 6, 0x18), (1728, 9, 0x9B))

  private val BlackCodes: Array[(Int, Int, Int)] = Array(
    (0, 10, 0x37), (1, 3, 0x2), (2, 2, 0x3), (3, 2, 0x2), (4, 3, 0x3),
    (5, 4, 0x3), (6, 4, 0x2), (7, 5, 0x3), (8, 6, 0x5), (9, 6, 0x4),
    (10, 7, 0x4), (11, 7, 0x5), (12, 7, 0x7), (13, 8, 0x04),
    (14, 8, 0x07), (15, 9, 0x18), (16, 10, 0x17), (17, 10, 0x18),
    (18, 10, 0x08), (19, 11, 0x67), (20, 11, 0x68), (21, 11, 0x6C),
    (22, 11, 0x37), (23, 11, 0x28), (24, 11, 0x17), (25, 11, 0x18),
    (26, 12, 0xCA), (27, 12, 0xCB), (28, 12, 0xCC), (29, 12, 0xCD),
    (30, 12, 0x68), (31, 12, 0x69), (32, 12, 0x6A), (33, 12, 0x6B),
    (34, 12, 0xD2), (35, 12, 0xD3), (36, 12, 0xD4), (37, 12, 0xD5),
    (38, 12, 0xD6), (39, 12, 0xD7), (40, 12, 0x6C), (41, 12, 0x6D),
    (42, 12, 0xDA), (43, 12, 0xDB), (44, 12, 0x54), (45, 12, 0x55),
    (46, 12, 0x56), (47, 12, 0x57), (48, 12, 0x64), (49, 12, 0x65),
    (50, 12, 0x52), (51, 12, 0x53), (52, 12, 0x24), (53, 12, 0x37),
    (54, 12, 0x38), (55, 12, 0x27), (56, 12, 0x28), (57, 12, 0x58),
    (58, 12, 0x59), (59, 12, 0x2B), (60, 12, 0x2C), (61, 12, 0x5A),
    (62, 12, 0x66), (63, 12, 0x67),
    // makeup
    (64, 10, 0x0F), (128, 12, 0xC8), (192, 12, 0xC9), (256, 12, 0x5B),
    (320, 12, 0x33), (384, 12, 0x34), (448, 12, 0x35), (512, 13, 0x6C),
    (576, 13, 0x6D), (640, 13, 0x4A), (704, 13, 0x4B), (768, 13, 0x4C),
    (832, 13, 0x4D), (896, 13, 0x72), (960, 13, 0x73), (1024, 13, 0x74),
    (1088, 13, 0x75), (1152, 13, 0x76), (1216, 13, 0x77), (1280, 13, 0x52),
    (1344, 13, 0x53), (1408, 13, 0x54), (1472, 13, 0x55), (1536, 13, 0x5A),
    (1600, 13, 0x5B), (1664, 13, 0x64), (1728, 13, 0x65))

  /** Extended makeups 1792–2560 (T.4 Table 4) — color-independent. */
  private val ExtCodes: Array[(Int, Int, Int)] = Array(
    (1792, 11, 0x08), (1856, 11, 0x0C), (1920, 11, 0x0D),
    (1984, 12, 0x12), (2048, 12, 0x13), (2112, 12, 0x14),
    (2176, 12, 0x15), (2240, 12, 0x16), (2304, 12, 0x17),
    (2368, 12, 0x1C), (2432, 12, 0x1D), (2496, 12, 0x1E),
    (2560, 12, 0x1F))

  // encode side: run → (len, bits), split terminating / makeup per color
  private def encTable(codes: Array[(Int, Int, Int)]): Map[Int, (Int, Int)] =
    (codes ++ ExtCodes).map { case (r, l, b) => r -> ((l, b)) }.toMap
  private val WhiteEnc = encTable(WhiteCodes)
  private val BlackEnc = encTable(BlackCodes)

  // decode side: (len << 16 | bits) → run
  private def decTable(codes: Array[(Int, Int, Int)]): Map[Int, Int] =
    (codes ++ ExtCodes).map { case (r, l, b) => ((l << 16) | b) -> r }.toMap
  private val WhiteDec = decTable(WhiteCodes)
  private val BlackDec = decTable(BlackCodes)
  private val MaxCodeLen = 13

  // -------------------------------------------------------------- bit IO

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nAcc = 0
    def put(bits: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        nAcc += 1
        if (nAcc == 8) { buf.write(acc); acc = 0; nAcc = 0 }
        i -= 1
      }
    }
    def finish(): Array[Byte] = {
      if (nAcc > 0) { buf.write(acc << (8 - nAcc)); acc = 0; nAcc = 0 }
      buf.toByteArray
    }
  }

  private final class BitReader(b: Array[Byte]) {
    private var pos = 0 // bit position
    def exhausted: Boolean = pos >= b.length * 8
    def next(): Int = {
      if (exhausted) throw new IllegalStateException("bits exhausted")
      val bit = (b(pos >>> 3) >>> (7 - (pos & 7))) & 1
      pos += 1
      bit
    }
  }

  // --------------------------------------------------------- transitions

  /** Canonical changing elements of a row: strictly increasing positions
    * where the color differs from the pixel to the left (imaginary white
    * before position 0), followed by two `width` sentinels. */
  private def transitions(row: Array[Boolean], width: Int): Array[Int] = {
    val out = new Array[Int](width + 2)
    var n = 0
    var prev = false // white
    var x = 0
    while (x < width) {
      if (row(x) != prev) { out(n) = x; n += 1; prev = row(x) }
      x += 1
    }
    out(n) = width; out(n + 1) = width
    java.util.Arrays.copyOf(out, n + 2)
  }

  /** First index into `refT` whose position is strictly right of a0 AND
    * whose changing element flips TO the opposite of `color` — transition
    * index i flips to black when i is even, so the required parity is
    * exactly `color` (0 = white, 1 = black). */
  private def b1Index(refT: Array[Int], a0: Int, color: Int): Int = {
    var i = 0
    while (i < refT.length - 2 && refT(i) <= a0) i += 1
    if ((i & 1) != color) i += 1
    i
  }

  // --------------------------------------------------------------- encode

  /** Encode a bilevel raster (black = true) as a raw T.6 bitstream, rows
    * top-down, terminated with EOFB. */
  def encode(width: Int, height: Int, black: (Int, Int) => Boolean): Array[Byte] = {
    require(width > 0 && height > 0, "empty raster")
    val w = new BitWriter
    var refT = Array(width, width) // imaginary all-white row above row 0
    val row = new Array[Boolean](width)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { row(x) = black(x, y); x += 1 }
      val curT = transitions(row, width)
      var curIdx = 0
      var a0 = -1
      var color = 0 // 0 = white, 1 = black
      while (a0 < width) {
        while (curIdx < curT.length - 2 && curT(curIdx) <= a0) curIdx += 1
        val a1 = curT(curIdx)
        val a2 = curT(math.min(curIdx + 1, curT.length - 1))
        val bi = b1Index(refT, a0, color)
        val b1 = if (bi < refT.length) refT(bi) else width
        val b2 = if (bi + 1 < refT.length) refT(bi + 1) else width
        if (b2 < a1) {
          w.put(0x1, 4) // pass: 0001
          a0 = b2
        } else if (math.abs(a1 - b1) <= 3) {
          a1 - b1 match {
            case 0 => w.put(0x1, 1) // V0: 1
            case 1 => w.put(0x3, 3) // VR1: 011
            case 2 => w.put(0x03, 6) // VR2: 000011
            case 3 => w.put(0x03, 7) // VR3: 0000011
            case -1 => w.put(0x2, 3) // VL1: 010
            case -2 => w.put(0x02, 6) // VL2: 000010
            case _ => w.put(0x02, 7) // VL3: 0000010
          }
          a0 = a1
          color ^= 1
        } else {
          w.put(0x1, 3) // horizontal: 001
          putRun(w, a1 - (if (a0 < 0) 0 else a0), color)
          putRun(w, a2 - a1, color ^ 1)
          a0 = a2
        }
      }
      refT = curT
      y += 1
    }
    w.put(0x001, 12); w.put(0x001, 12) // EOFB
    w.finish()
  }

  private def putRun(w: BitWriter, run0: Int, color: Int): Unit = {
    val enc = if (color == 0) WhiteEnc else BlackEnc
    var run = run0
    while (run >= 2624) { val (l, b) = enc(2560); w.put(b, l); run -= 2560 }
    if (run >= 64) { val (l, b) = enc(run / 64 * 64); w.put(b, l); run %= 64 }
    val (l, b) = enc(run)
    w.put(b, l)
  }

  // --------------------------------------------------------------- decode

  /** Decode a raw T.6 bitstream into a luminance raster (white=255,
    * black=0) given the out-of-band dimensions from the PDF XObject dict.
    * None on any malformed code, short stream, dimension overflow, or
    * unsupported 2-D extension — never throws. */
  def decode(b: Array[Byte], width: Int, height: Int): Option[DecodedGray] = {
    if (b == null || b.length == 0) return None
    if (width <= 0 || height <= 0 || width > (1 << 15) || height > (1 << 15))
      return None
    if (width.toLong * height > (1L << 26)) return None // decodeJpeg's cap
    try decodeUnsafe(b, width, height)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  private def decodeUnsafe(b: Array[Byte], width: Int, height: Int): Option[DecodedGray] = {
    val r = new BitReader(b)
    val out = new Array[Int](width * height)
    java.util.Arrays.fill(out, 255)
    var refT = Array(width, width)
    val row = new Array[Boolean](width)
    var y = 0
    while (y < height) {
      java.util.Arrays.fill(row, false)
      var a0 = -1
      var color = 0
      var pos = 0
      while (a0 < width) {
        val bi = b1Index(refT, a0, color)
        val b1 = if (bi < refT.length) refT(bi) else width
        val b2 = if (bi + 1 < refT.length) refT(bi + 1) else width
        readMode(r) match {
          case ModePass =>
            if (b2 > width) return None
            if (color == 1) java.util.Arrays.fill(row, pos, b2, true)
            pos = b2
            a0 = b2
          case ModeHoriz =>
            val r1 = readRun(r, color)
            val r2 = readRun(r, color ^ 1)
            val base = if (a0 < 0) 0 else a0
            val p1 = base + r1
            val p2 = p1 + r2
            if (r1 < 0 || r2 < 0 || p2 > width) return None
            if (color == 1) java.util.Arrays.fill(row, pos, p1, true)
            else java.util.Arrays.fill(row, p1, p2, true)
            pos = p2
            a0 = p2
          case d => // vertical, d in -3..3
            val a1 = b1 + d
            if (a1 < 0 || a1 > width || a1 <= a0) return None
            if (color == 1) java.util.Arrays.fill(row, pos, a1, true)
            pos = a1
            a0 = a1
            color ^= 1
        }
      }
      var x = 0
      while (x < width) {
        if (row(x)) out(y * width + x) = 0
        x += 1
      }
      refT = transitions(row, width)
      y += 1
    }
    Some(DecodedGray(width, height, out))
  }

  private val ModePass = 100
  private val ModeHoriz = 101

  /** Read one 2-D mode code; vertical modes return their offset -3..3.
    * EOL (the start of EOFB) and the 2-D extension escape are malformed
    * mid-image — height rows must decode before the terminator. */
  private def readMode(r: BitReader): Int = {
    if (r.next() == 1) return 0 // V0
    if (r.next() == 1) { // 01x
      return if (r.next() == 1) 1 else -1 // VR1 / VL1
    }
    if (r.next() == 1) return ModeHoriz // 001
    if (r.next() == 1) return ModePass // 0001
    if (r.next() == 1) { // 00001x
      return if (r.next() == 1) 2 else -2 // VR2 / VL2
    }
    if (r.next() == 1) { // 000001x
      return if (r.next() == 1) 3 else -3 // VR3 / VL3
    }
    throw new IllegalStateException("EOL/extension mid-image")
  }

  /** Read one full MH run length: any makeups then one terminating code. */
  private def readRun(r: BitReader, color: Int): Int = {
    val dec = if (color == 0) WhiteDec else BlackDec
    var total = 0
    var guard = 0
    while (guard < 64) {
      guard += 1
      var len = 0
      var bits = 0
      var run = -1
      while (run < 0 && len < MaxCodeLen) {
        bits = (bits << 1) | r.next()
        len += 1
        run = dec.getOrElse((len << 16) | bits, -1)
      }
      if (run < 0) throw new IllegalStateException("bad MH code")
      total += run
      if (run < 64) return total // terminating code ends the run
    }
    throw new IllegalStateException("runaway makeup chain")
  }
}
