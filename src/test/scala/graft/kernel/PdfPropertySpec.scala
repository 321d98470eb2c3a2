package graft.kernel

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the real-PDF writer→parser round trip: both
  * layouts (classic 1.4 xref-table and 1.5 ObjStm/XRef-stream) must
  * reproduce the text layer byte-for-byte — including parenthesis/escape
  * characters, multi-page structure, and payloads whose text contains
  * PDF keywords ('endstream', 'endobj', 'N 0 obj') that could confuse a
  * naive scanner. */
class PdfPropertySpec extends AnyFunSuite {

  private def check[A](gen: Gen[A])(f: A => Unit): Unit = {
    val prop = Prop.forAllNoShrink(gen) { a => f(a); true }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(60)
      .withInitialSeed(org.scalacheck.rng.Seed(4242L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.oneOf(
    "the", "court", "case", "appeal", "order", "pipeline", "(paren",
    "close)", "back\\slash", "endstream", "endobj", "stream", "trailer",
    "9 0 obj", "straße", "a1-x", "tab\there")

  private val lineGen: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private val pageGen: Gen[Seq[String]] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, lineGen))

  private val docGen: Gen[(Seq[Seq[String]], Boolean)] = for {
    nPages <- Gen.chooseNum(1, 5)
    pages <- Gen.listOfN(nPages, pageGen)
    compress <- Gen.oneOf(true, false)
  } yield (pages, compress)

  test("round trip: classic 1.4 layout reproduces the text layer exactly " +
    "(incl. PDF keywords and escapes inside page text)") {
    check(docGen) { case (pages, compress) =>
      val doc = PdfParse.parse(PdfParse.writePdf(pages, compress = compress))
      assert(doc.pages.length == pages.length)
      doc.pages.zip(pages).foreach { case (p, expected) =>
        assert(p.textLayer == expected.mkString("\n"),
          s"classic($compress): '${p.textLayer}' vs '${expected.mkString("\n")}'")
      }
    }
  }

  test("round trip: 1.5 ObjStm layout ≡ classic layout for every document") {
    check(docGen) { case (pages, compress) =>
      val classic = PdfParse.parse(PdfParse.writePdf(pages, compress = compress))
      val objstm = PdfParse.parse(PdfParse.writePdfObjStm(pages, compress = compress))
      assert(classic.pages.map(_.textLayer) == objstm.pages.map(_.textLayer))
    }
  }

  test("round trip: the geometric second reader agrees with the cursor " +
    "reader on writer-emitted (well-ordered) documents") {
    check(docGen) { case (pages, compress) =>
      val doc = PdfParse.parse(PdfParse.writePdf(pages, compress = compress),
        needAlt = true)
      doc.pages.zip(pages).foreach { case (p, expected) =>
        assert(p.altTextLayer.contains(expected.mkString("\n")),
          s"geom: ${p.altTextLayer} vs '${expected.mkString("\n")}'")
      }
    }
  }

  test("determinism: identical bytes in, identical parse out (both readers)") {
    check(docGen) { case (pages, compress) =>
      val bytes = PdfParse.writePdf(pages, compress = compress)
      val a = PdfParse.parse(bytes, needAlt = true)
      val b = PdfParse.parse(bytes.clone(), needAlt = true)
      assert(a.pages.map(_.textLayer) == b.pages.map(_.textLayer))
      assert(a.pages.map(_.altTextLayer) == b.pages.map(_.altTextLayer))
    }
  }

  test("extraction row contract holds on every generated document " +
    "(Extractor end-to-end, both modes)") {
    val fast = new Extractor(ProbeConfig())
    val acc = new Extractor(ProbeConfig(accuracyMode = true))
    check(docGen) { case (pages, compress) =>
      for (ex <- Seq(fast, acc)) {
        val r = ex.extract(PdfParse.writePdf(pages, compress = compress))
        assert(r.docKind == "pdf")
        assert(Set("true", "false", "partial").contains(r.status))
        assert(r.totalPages == pages.length)
      }
    }
  }

  private val encModeGen: Gen[PdfCrypt.Mode] =
    Gen.oneOf(PdfCrypt.Rc4Owner, PdfCrypt.AesOwner, PdfCrypt.Aes256Owner)

  test("round trip: every owner-locked encryption mode x both layouts " +
    "reproduces the text layer exactly, and never leaks plaintext") {
    val gen = for {
      d <- docGen
      mode <- encModeGen
      objstm <- Gen.oneOf(true, false)
    } yield (d, mode, objstm)
    check(gen) { case ((pages, compress), mode, objstm) =>
      val plainBytes =
        if (objstm) PdfParse.writePdfObjStm(pages, compress = compress)
        else PdfParse.writePdf(pages, compress = compress)
      val encBytes =
        if (objstm) PdfParse.writePdfObjStm(pages, compress = compress,
          encrypt = Some(mode))
        else PdfParse.writePdf(pages, compress = compress,
          encrypt = Some(mode))
      val plain = PdfParse.parse(plainBytes)
      val enc = PdfParse.parse(encBytes)
      assert(plain.pages.map(_.textLayer) == enc.pages.map(_.textLayer),
        s"mode=$mode objstm=$objstm compress=$compress")
      // uncompressed + unencrypted leaks line text; encrypted never does
      val raw = new String(encBytes, java.nio.charset.StandardCharsets.ISO_8859_1)
      val marker = pages.flatten.find(_.length >= 12)
      marker.foreach(m => assert(!raw.contains(m),
        s"plaintext leak under $mode (objstm=$objstm)"))
    }
  }
}
