package graft.kernel

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** PDF Standard security handler (ISO 32000-1 §7.6.3 and 32000-2 §7.6.4,
  * public specs) for every revision real corpora carry: R2 (RC4-40), R3
  * (RC4 up to 128), R4 (/CF crypt filters — /V2 RC4 or /AESV2
  * AES-128-CBC), and R5/R6 (/AESV3 AES-256 with the Algorithm 2.B
  * hardened hash).
  *
  * The supported case is the EMPTY user password — the overwhelmingly
  * common "owner-locked" PDF (printing/copying restricted, but any reader
  * opens it). The reference gets this free from PyMuPDF, which decrypts
  * empty-user-password files transparently (`_detector.py` never sees
  * them as encrypted); here the same files decrypt through Algorithm 2
  * (R≤4) / Algorithm 2.A+2.B (R5/R6) key derivation so their text layer
  * extracts instead of degrading. Files that genuinely REQUIRE a user
  * password (the /U check fails for the empty password) and unsupported
  * handlers (public-key /Filter values, unknown /CFM) surface as the
  * distinct encrypted-PDF error row per the X4 contract.
  *
  * Primitives: MD5/SHA-2 via `java.security.MessageDigest`, AES-CBC/ECB
  * via `javax.crypto` (all JDK-public); RC4 implemented inline from the
  * public key-scheduling/PRGA description (~15 lines, pinned to the
  * public test vectors) because the JCE provider may not ship ARCFOUR.
  */
final case class PdfCrypt(fileKey: Array[Byte], aes: Boolean,
    v5: Boolean = false) {

  /** Algorithm 1 per-object key: MD5(fileKey ∥ objNum LE24 ∥ gen LE16
    * [∥ sAlT for AES]), truncated to min(keyLen+5, 16). The generation
    * comes from the object header (nonzero after incremental updates —
    * using 0 there would RC4-garble silently). V5 (AES-256) uses the FILE
    * key directly — ISO 32000-2 dropped the per-object derivation. */
  private def objectKey(num: Int, gen: Int): Array[Byte] =
    if (v5) fileKey
    else {
      val salt =
        if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54)
        else Array.emptyByteArray
      val h = PdfCrypt.md5(
        fileKey,
        Array[Byte]((num & 0xFF).toByte, ((num >> 8) & 0xFF).toByte,
          ((num >> 16) & 0xFF).toByte,
          (gen & 0xFF).toByte, ((gen >> 8) & 0xFF).toByte),
        salt)
      h.take(math.min(fileKey.length + 5, 16))
    }

  /** Decrypt a stream payload for object `num`. AES payloads carry their
    * CBC IV in the first 16 bytes; padding is PKCS#5. Malformed ciphertext
    * (short, bad padding) yields None so the page DEGRADES to the OCR path
    * instead of throwing mid-kernel. */
  def decryptStream(num: Int, gen: Int,
      data: Array[Byte]): Option[Array[Byte]] =
    try {
      if (!aes) Some(PdfCrypt.rc4(objectKey(num, gen), data))
      else if (data.length < 32 || data.length % 16 != 0) {
        if (data.isEmpty) Some(data) else None
      } else {
        val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
        c.init(Cipher.DECRYPT_MODE,
          new SecretKeySpec(objectKey(num, gen), "AES"),
          new IvParameterSpec(java.util.Arrays.copyOfRange(data, 0, 16)))
        Some(c.doFinal(data, 16, data.length - 16))
      }
    } catch { case _: java.security.GeneralSecurityException => None }

  /** Writer-side inverse of [[decryptStream]] (fixtures + synthetic
    * corpus): RC4 is symmetric; AES prepends a deterministic per-object
    * IV (MD5 of the object key — fixtures must be bit-reproducible, so no
    * SecureRandom). */
  def encryptStream(num: Int, data: Array[Byte], gen: Int = 0): Array[Byte] =
    if (!aes) PdfCrypt.rc4(objectKey(num, gen), data)
    else {
      val iv = PdfCrypt.md5(objectKey(num, gen))
      val c = Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(Cipher.ENCRYPT_MODE,
        new SecretKeySpec(objectKey(num, gen), "AES"),
        new IvParameterSpec(iv))
      iv ++ c.doFinal(data)
    }
}

object PdfCrypt {

  /** §7.6.3.3 password padding string. */
  private[kernel] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private[kernel] def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (public KSA + PRGA). */
  private[kernel] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xFF
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xFF
      y = (y + s(x)) & 0xFF
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) + s(y)) & 0xFF)).toByte
      k += 1
    }
    out
  }

  private def padded(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ Pad).take(32)

  private def le32(v: Int): Array[Byte] = Array(
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)

  /** Algorithm 2: file encryption key from a user password. `keyBytes` is
    * /Length in bytes (5 for R2). */
  private[kernel] def fileKey(userPwd: Array[Byte], o: Array[Byte], p: Int,
      id0: Array[Byte], r: Int, keyBytes: Int,
      encryptMetadata: Boolean): Array[Byte] = {
    val noMeta =
      if (r >= 4 && !encryptMetadata)
        Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
      else Array.emptyByteArray
    var h = md5(padded(userPwd), o, le32(p), id0, noMeta)
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h.take(keyBytes)); i += 1 }
    }
    h.take(keyBytes)
  }

  /** Algorithm 3: the /O value (owner password → user password). */
  private[kernel] def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte],
      r: Int, keyBytes: Int): Array[Byte] = {
    var h = md5(padded(ownerPwd))
    if (r >= 3) {
      var i = 0
      while (i < 50) { h = md5(h); i += 1 }
    }
    val key = h.take(keyBytes)
    var o = rc4(key, padded(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        o = rc4(key.map(b => (b ^ i).toByte), o)
        i += 1
      }
    }
    o
  }

  /** Algorithms 4/5: the /U value for `key`. R2 compares all 32 bytes;
    * R≥3 compares the first 16 (the spec leaves the rest arbitrary — the
    * writer zero-fills). */
  private[kernel] def computeU(key: Array[Byte], id0: Array[Byte],
      r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        u = rc4(key.map(b => (b ^ i).toByte), u)
        i += 1
      }
      u ++ new Array[Byte](16)
    }

  /** True when `key` opens the document whose /U is `u`. */
  private[kernel] def userKeyValid(key: Array[Byte], u: Array[Byte],
      id0: Array[Byte], r: Int): Boolean = {
    val expect = computeU(key, id0, r)
    val n = if (r == 2) 32 else 16
    u.length >= n && java.util.Arrays.equals(expect, 0, n, u, 0, n)
  }

  // ------------------------------------------------------- V5 (AES-256)

  private def sha(bits: Int, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(s"SHA-$bits")
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbcNoPad(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/CBC/NoPadding")
    c.init(if (encrypt) Cipher.ENCRYPT_MODE else Cipher.DECRYPT_MODE,
      new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** ISO 32000-2 Algorithm 2.B — the R6 hardened hash (R5, the deprecated
    * Adobe extension, is the plain SHA-256 first step). `udata` is the
    * 48-byte /U value when validating the OWNER password, empty for the
    * user password. */
  private[kernel] def hash2B(pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte], r: Int): Array[Byte] = {
    var k = sha(256, pwd, salt, udata)
    if (r == 5) return k
    var round = 0
    var done = false
    while (!done) {
      round += 1
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(block, 0, k1, i * block.length, block.length)
        i += 1
      }
      val e = aesCbcNoPad(encrypt = true, k.take(16),
        java.util.Arrays.copyOfRange(k, 16, 32), k1)
      var sum = 0
      var j = 0
      while (j < 16) { sum += e(j) & 0xFF; j += 1 }
      k = sha(256 + (sum % 3) * 128, e) // 256 / 384 / 512
      done = round >= 64 && (e(e.length - 1) & 0xFF) <= round - 32
    }
    k.take(32)
  }

  /** V5 empty-user-password open: validate against /U's hash+validation
    * salt, then unwrap the 256-bit file key from /UE with the key-salt
    * intermediate (AES-256-CBC, zero IV, no padding). Returns None when
    * the empty password does not validate (→ password required). */
  private[kernel] def openV5(u: Array[Byte], ue: Array[Byte],
      r: Int): Option[Array[Byte]] = {
    if (u.length < 48 || ue.length < 32) return None
    val hash = java.util.Arrays.copyOfRange(u, 0, 32)
    val vSalt = java.util.Arrays.copyOfRange(u, 32, 40)
    val kSalt = java.util.Arrays.copyOfRange(u, 40, 48)
    val empty = Array.emptyByteArray
    if (!java.util.Arrays.equals(hash2B(empty, vSalt, empty, r), hash)) None
    else Some(aesCbcNoPad(encrypt = false,
      hash2B(empty, kSalt, empty, r), new Array[Byte](16), ue.take(32)))
  }

  // ------------------------------------------------------------ writer side

  /** Writer-side parameters for an encrypted fixture/corpus file. The three
    * modes fixtures need: RC4-128 owner-locked (opens with the empty user
    * password), AES-128 owner-locked, and user-password-locked (extraction
    * correctly impossible without the password → distinct error row). */
  sealed trait Mode
  case object Rc4Owner extends Mode // V2 R3, 128-bit, user pwd empty
  case object AesOwner extends Mode // V4 R4 /AESV2, user pwd empty
  case object Aes256Owner extends Mode // V5 R6 /AESV3, user pwd empty
  case object UserLocked extends Mode // V2 R3, non-empty user pwd

  private[kernel] val P: Int = -44 // print+modify restricted; irrelevant here

  /** Build the /Encrypt dict body, the trailer /ID hex, and the stream
    * cipher for `mode`. `idSeed` keeps fixtures deterministic. */
  private[kernel] def forWriting(mode: Mode, idSeed: Array[Byte])
      : (String, String, PdfCrypt) = {
    val id0 = md5(idSeed)
    val idHex = id0.map(b => f"$b%02x").mkString
    if (mode == Aes256Owner) return forWritingV5(idSeed, idHex)
    val (r, v, keyBytes, userPwd, cfm) = mode match {
      case Rc4Owner => (3, 2, 16, Array.emptyByteArray, "")
      case AesOwner => (4, 4, 16, Array.emptyByteArray, "/AESV2")
      case UserLocked =>
        (3, 2, 16, "secret".getBytes(StandardCharsets.ISO_8859_1), "")
    }
    val owner = "owner-pass".getBytes(StandardCharsets.ISO_8859_1)
    val o = computeO(owner, userPwd, r, keyBytes)
    val key = fileKey(userPwd, o, P, id0, r, keyBytes, encryptMetadata = true)
    val u = computeU(key, id0, r)
    def hx(b: Array[Byte]) = "<" + b.map(x => f"$x%02x").mkString + ">"
    val cf =
      if (mode == AesOwner)
        s" /CF << /StdCF << /CFM $cfm /Length $keyBytes >> >>" +
          " /StmF /StdCF /StrF /StdCF"
      else ""
    val dict = s"<< /Filter /Standard /V $v /R $r /Length ${keyBytes * 8} " +
      s"/P $P /O ${hx(o)} /U ${hx(u)}$cf >>"
    (dict, idHex, PdfCrypt(key, aes = mode == AesOwner))
  }

  /** V5 R6 (/AESV3, ISO 32000-2) writer: a deterministic 256-bit file key
    * wrapped per the spec — /U = hash ∥ validation salt ∥ key salt for the
    * EMPTY user password (Algorithm 2.B, hardened hash), /UE the
    * AES-wrapped file key, /O //OE the owner-password equivalents over
    * /U's 48 bytes, /Perms the AES-ECB-sealed permissions block. */
  private def forWritingV5(idSeed: Array[Byte], idHex: String)
      : (String, String, PdfCrypt) = {
    def seed(tag: String) = sha(256,
      idSeed, tag.getBytes(StandardCharsets.US_ASCII))
    val fileKey = seed("filekey")
    val vSalt = seed("vsalt").take(8)
    val kSalt = seed("ksalt").take(8)
    val empty = Array.emptyByteArray
    val u = hash2B(empty, vSalt, empty, r = 6) ++ vSalt ++ kSalt
    val ue = aesCbcNoPad(encrypt = true, hash2B(empty, kSalt, empty, r = 6),
      new Array[Byte](16), fileKey)
    val owner = "owner-pass".getBytes(StandardCharsets.ISO_8859_1)
    val oVSalt = seed("ovsalt").take(8)
    val oKSalt = seed("oksalt").take(8)
    val o = hash2B(owner, oVSalt, u, r = 6) ++ oVSalt ++ oKSalt
    val oe = aesCbcNoPad(encrypt = true, hash2B(owner, oKSalt, u, r = 6),
      new Array[Byte](16), fileKey)
    val permsPlain = le32(P) ++ Array[Byte](0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0xFF.toByte) ++
      "Tadb".getBytes(StandardCharsets.US_ASCII) ++ seed("perms").take(4)
    val ecb = Cipher.getInstance("AES/ECB/NoPadding")
    ecb.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(fileKey, "AES"))
    val perms = ecb.doFinal(permsPlain)
    def hx(b: Array[Byte]) = "<" + b.map(x => f"$x%02x").mkString + ">"
    val dict = s"<< /Filter /Standard /V 5 /R 6 /Length 256 /P $P " +
      s"/O ${hx(o)} /U ${hx(u)} /OE ${hx(oe)} /UE ${hx(ue)} " +
      s"/Perms ${hx(perms)} " +
      "/CF << /StdCF << /CFM /AESV3 /Length 32 >> >> " +
      "/StmF /StdCF /StrF /StdCF >>"
    (dict, idHex, PdfCrypt(fileKey, aes = true, v5 = true))
  }

  // ------------------------------------------------------------ parser side

  private val PatEncryptRef = Py.re("""/Encrypt\s+(\d+)\s+\d+\s+R""")
  private val PatV = Py.re("""/V\s+(\d+)""")
  private val PatR = Py.re("""/R\s+(\d+)""")
  private val PatLength = Py.re("""/Length\s+(\d+)""")
  private val PatP = Py.re("""/P\s+(-?\d+)""")
  private val PatStdFilter = Py.re("""/Filter\s*/Standard""")
  private val PatCfmAes = Py.re("""/CFM\s*/AESV2""")
  private val PatCfmAes3 = Py.re("""/CFM\s*/AESV3""")
  private val PatCfm = Py.re("""/CFM\s*/(\w+)""")
  private val PatCfmV2 = Py.re("""/CFM\s*/V2(?![A-Za-z0-9])""")
  private val PatStmF = Py.re("""/StmF\s*/(\w+)""")
  private val PatCfDict = Py.re("""/CF\s*<<""")
  private val PatNoMeta = Py.re("""/EncryptMetadata\s+false""")

  /** The dict text with every STRING VALUE blanked (literal `(…)` with
    * escape/nesting handling, hex `<…>`): binary /O //U literal values can
    * contain raw `<<`//`>>` byte pairs that would corrupt depth tracking.
    * Structural scans (depth, /CF entry lookup) run on the masked text;
    * VALUE reads (stringValue, firstId) run on the raw text. */
  private def maskStrings(dict: String): String = {
    val sb = new StringBuilder(dict.length)
    var i = 0
    while (i < dict.length) {
      val c = dict.charAt(i)
      if (c == '(') {
        val end = PdfParse.literalString(dict, i)._2
        sb.append('(')
        var k = i + 1
        while (k < end) { sb.append(' '); k += 1 }
        i = end
      } else if (c == '<' && i + 1 < dict.length && dict.charAt(i + 1) == '<') {
        sb.append("<<") // dict-open is ONE token — its second '<' must not
        i += 2 //          be misread as a hex-string opener
      } else if (c == '<') {
        val end0 = dict.indexOf('>', i)
        val end = if (end0 < 0) dict.length else end0 + 1
        sb.append('<')
        var k = i + 1
        while (k < end) { sb.append(' '); k += 1 }
        i = end
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The dict text with nested `<< … >>` sub-dicts blanked out, so
    * depth-0 key greps (/Length, /StmF) cannot match keys of a nested
    * crypt-filter dict — key order in PDF dicts is unspecified. Callers
    * pass [[maskStrings]]-masked text. */
  private def topLevelText(dict: String): String = {
    val sb = new StringBuilder(dict.length)
    var depth = 0
    var i = 0
    while (i < dict.length) {
      val two = i + 1 < dict.length
      if (two && dict.charAt(i) == '<' && dict.charAt(i + 1) == '<') {
        depth += 1
        sb.append(if (depth <= 1) "<<" else "  ")
        i += 2
      } else if (two && dict.charAt(i) == '>' && dict.charAt(i + 1) == '>') {
        sb.append(if (depth <= 1) ">>" else "  ")
        depth -= 1
        i += 2
      } else {
        sb.append(if (depth <= 1) dict.charAt(i) else ' ')
        i += 1
      }
    }
    sb.toString
  }

  /** The balanced `<< … >>` starting at the first `<<` at/after `from`. */
  private def balanced(s: String, from: Int): String = {
    val start = s.indexOf("<<", from)
    if (start < 0) return ""
    var depth = 0
    var j = start
    while (j + 1 < s.length) {
      if (s.charAt(j) == '<' && s.charAt(j + 1) == '<') { depth += 1; j += 2 }
      else if (s.charAt(j) == '>' && s.charAt(j + 1) == '>') {
        depth -= 1; j += 2
        if (depth == 0) return s.substring(start, j)
      } else j += 1
    }
    ""
  }

  /** The /CFM of the crypt filter the top-level /StmF names (§7.6.5):
    * None when /StmF is absent (spec default Identity) or unresolvable;
    * Some("Identity") when /StmF /Identity. Only the NAMED /CF entry is
    * consulted — a secondary crypt filter's /CFM never shadows it. */
  private def activeStreamCfm(masked: String): Option[String] =
    group1(PatStmF, topLevelText(masked)) match {
      case None => None
      case Some("Identity") => Some("Identity")
      case Some(name) =>
        val m = PatCfDict.matcher(masked)
        if (!m.find()) None
        else {
          val cf = balanced(masked, m.end() - 2)
          // delimiter-aware entry lookup: "/StdCF" must not match the
          // "/StdCF2" entry's prefix
          val needle = "/" + name
          var ent = cf.indexOf(needle)
          while (ent >= 0 && ent + needle.length < cf.length &&
            Character.isLetterOrDigit(cf.charAt(ent + needle.length)))
            ent = cf.indexOf(needle, ent + 1)
          if (ent < 0) None
          else group1(PatCfm, balanced(cf, ent))
        }
    }

  private def group1(pat: java.util.regex.Pattern, s: String): Option[String] = {
    val m = pat.matcher(s)
    if (m.find()) Some(m.group(1)) else None
  }

  /** Resolve the document's encryption state from its trailer/XRef dicts.
    * None = not encrypted. Some = decryptable with the empty user
    * password. Throws [[PdfEncryptedException]] (distinct reasons) when a
    * real user password or an unsupported handler blocks extraction —
    * exactly the files that must surface as error rows. `dicts` are the
    * candidate trailer-level dicts (classic trailers and /Type /XRef
    * stream dicts) where the spec puts /Encrypt and /ID. */
  private[kernel] def resolve(dicts: Seq[String],
      encryptObj: Int => Option[String]): Option[PdfCrypt] = {
    val carrier = dicts.find(d => PatEncryptRef.matcher(d).find())
    val enc = for {
      d <- carrier
      num <- group1(PatEncryptRef, d)
      body <- encryptObj(num.toInt)
    } yield (d, body)
    enc match {
      case None =>
        if (carrier.isDefined)
          throw new PdfEncryptedException(
            "encrypted PDF (/Encrypt): encryption dictionary unresolvable")
        None
      case Some((trailer, dict)) =>
        if (!PatStdFilter.matcher(dict).find())
          throw new PdfEncryptedException(
            "encrypted PDF (/Encrypt): unsupported security handler (not /Standard)")
        val v = group1(PatV, dict).map(_.toInt).getOrElse(0)
        val r = group1(PatR, dict).map(_.toInt).getOrElse(0)
        if (v == 5 && (r == 5 || r == 6)) {
          // AES-256 (R5 deprecated-Adobe / R6 ISO 32000-2): /AESV3 only
          if (!PatCfmAes3.matcher(dict).find())
            throw new PdfEncryptedException(
              "encrypted PDF (/Encrypt): V5 without /AESV3 crypt filter")
          val u = stringValue(dict, "/U").getOrElse(
            throw new PdfEncryptedException(
              "encrypted PDF (/Encrypt): missing /U"))
          val ue = stringValue(dict, "/UE").getOrElse(
            throw new PdfEncryptedException(
              "encrypted PDF (/Encrypt): missing /UE"))
          return openV5(u, ue, r) match {
            case Some(k) => Some(PdfCrypt(k, aes = true, v5 = true))
            case None => throw new PdfEncryptedException(
              "encrypted PDF (/Encrypt): user password required")
          }
        }
        if (v < 1 || v > 4 || r < 2 || r > 4)
          throw new PdfEncryptedException(
            s"encrypted PDF (/Encrypt): unsupported revision V=$v R=$r")
        // V4 crypt-filter resolution follows the SPEC's indirection, not a
        // whole-dict grep (a /CFM inside a secondary /CF entry must not
        // shadow the active one): the stream filter is the /CF entry NAMED
        // by /StmF (spec default /Identity = streams not encrypted).
        val masked = maskStrings(dict)
        val aes = v == 4 && {
          val cfm = activeStreamCfm(masked)
          cfm match {
            case None | Some("Identity") | Some("None") =>
              // tolerated: /StmF absent but a lone crypt filter present
              // (writers that omit the default-naming keys) — BOTH
              // variants, AESV2 and V2/RC4, symmetric
              if (cfm.isEmpty && PatCfmAes.matcher(masked).find()) true
              else if (cfm.isEmpty && PatCfmV2.matcher(masked).find()) false
              else return None // Identity: streams are not encrypted
            case Some("AESV2") => true
            case Some("V2") => false
            case Some(other) => throw new PdfEncryptedException(
              s"encrypted PDF (/Encrypt): unsupported V4 crypt filter /$other")
          }
        }
        // /Length must come from the TOP-LEVEL dict — V4 dicts carry a
        // nested byte-valued /Length inside /CF entries, and key order in
        // PDF dicts is unspecified, so grep the depth-0 text only.
        val keyBytes =
          if (r == 2) 5
          else group1(PatLength, topLevelText(masked)).map(_.toInt / 8)
            .getOrElse(if (v == 4) 16 else 5)
        if (keyBytes < 5 || keyBytes > 16)
          throw new PdfEncryptedException(
            s"encrypted PDF (/Encrypt): unsupported key length ${keyBytes * 8}")
        val p = group1(PatP, dict).map(_.toLong.toInt).getOrElse(-1)
        val encryptMetadata = !PatNoMeta.matcher(dict).find()
        val o = stringValue(dict, "/O").getOrElse(
          throw new PdfEncryptedException(
            "encrypted PDF (/Encrypt): missing /O"))
        val u = stringValue(dict, "/U").getOrElse(
          throw new PdfEncryptedException(
            "encrypted PDF (/Encrypt): missing /U"))
        val id0 = firstId(trailer)
        val key = fileKey(Array.emptyByteArray, o, p, id0, r, keyBytes,
          encryptMetadata)
        if (!userKeyValid(key, u, id0, r))
          throw new PdfEncryptedException(
            "encrypted PDF (/Encrypt): user password required")
        Some(PdfCrypt(key, aes))
    }
  }

  /** Decode the PDF string object starting at `s(j)` — `(` literal or
    * non-dict `<` hex — into its bytes (chars are bytes: the text is
    * ISO-8859-1-decoded raw bytes). The ONE decoder both /O //U //UE
    * values and /ID entries share. */
  private def pdfStringAt(s: String, j: Int): Option[Array[Byte]] = {
    if (j >= s.length) return None
    val decoded = s.charAt(j) match {
      case '(' => Some(PdfParse.literalString(s, j)._1)
      case '<' if j + 1 >= s.length || s.charAt(j + 1) != '<' =>
        Some(PdfParse.hexString(s, j)._1)
      case _ => None
    }
    decoded.map(_.toCharArray.map(c => (c & 0xFF).toByte))
  }

  /** First /ID array entry — hex OR literal string (both are legal plain
    * string objects per §14.4); empty when absent/unparsable. */
  private def firstId(trailer: String): Array[Byte] = {
    val i = trailer.indexOf("/ID")
    if (i < 0) return Array.emptyByteArray
    var j = i + 3
    while (j < trailer.length && trailer.charAt(j).isWhitespace) j += 1
    if (j >= trailer.length || trailer.charAt(j) != '[')
      return Array.emptyByteArray
    j += 1
    while (j < trailer.length && trailer.charAt(j).isWhitespace) j += 1
    pdfStringAt(trailer, j).getOrElse(Array.emptyByteArray)
  }

  /** The byte value of dict key `name` (`/O`, `/U`): literal `(…)` or hex
    * `<…>` string, reusing the content-stream string decoders (chars are
    * bytes — the dict text is ISO-8859-1-decoded raw bytes). */
  private def stringValue(dict: String, name: String): Option[Array[Byte]] = {
    var i = dict.indexOf(name)
    while (i >= 0) {
      var j = i + name.length
      while (j < dict.length && Character.isWhitespace(dict.charAt(j))) j += 1
      pdfStringAt(dict, j) match {
        case some @ Some(_) => return some
        case None => // keep scanning: "/OP" etc. can false-prefix-match
      }
      i = dict.indexOf(name, i + 1)
    }
    None
  }

}
