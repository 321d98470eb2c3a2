package graft.kernel

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the HTML extractor (SURVEY.md §5.2 item 3):
  * determinism, span validity, and no-invented-text over randomized
  * structured html AND arbitrary byte noise. */
class HtmlPropertySpec extends AnyFunSuite {

  /** Run a ScalaCheck property with a fixed seed (deterministic CI). */
  private def check[A](gen: Gen[A])(f: A => Unit): Unit = {
    val prop = Prop.forAllNoShrink(gen) { a => f(a); true }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(100)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] = Gen.oneOf(
    "the", "court", "case", "appeal", "order", "pipeline", "spark", "block",
    "density", "页面", "текст", "donnée", "straße", "a1", "x_y")

  private val sentenceGen: Gen[String] =
    Gen.chooseNum(3, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" ") + ".")

  private val blockGen: Gen[String] = Gen.oneOf(
    sentenceGen.map(s => s"<p>$s</p>"),
    sentenceGen.map(s => s"<div><a href='/x'>$s</a></div>"),
    sentenceGen.map(s => s"<li>$s</li>"),
    sentenceGen.map(s => s"<h2>$s</h2>"),
    Gen.const("<script>var x = '<p>never</p>';</script>"),
    Gen.const("<!-- comment with <p>markup</p> inside -->"),
    sentenceGen.map(s => s"<nav><a href='/'>$s</a></nav>"),
    sentenceGen.map(s => s"<td>$s</td>"),
    Gen.const("<br><hr><img src='x.png'>"),
    sentenceGen.map(s => s"<p>$s") // unclosed
  )

  private val htmlGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 25)
    blocks <- Gen.listOfN(n, blockGen)
    title <- Gen.option(sentenceGen)
  } yield {
    val t = title.map(s => s"<head><title>$s</title></head>").getOrElse("")
    s"<html>$t<body>${blocks.mkString("\n")}</body></html>"
  }

  test("property: extraction is deterministic") {
    check(htmlGen) { html =>
      assert(Html.extract(html) == Html.extract(html))
    }
  }

  test("property: spans are valid, ascending, non-overlapping indexes into source") {
    check(htmlGen) { html =>
      val ex = Html.extract(html)
      ex.spans.foreach { sp =>
        assert(sp.start >= 0 && sp.end <= html.length && sp.start < sp.end)
      }
      ex.spans.sliding(2).foreach {
        case Vector(a, b) => assert(a.end <= b.start)
        case _ =>
      }
      assert(ex.spans.length == (if (ex.text.isEmpty) 0 else ex.text.split('\n').length))
    }
  }

  test("property: no invented text — every extracted word occurs in the source") {
    check(htmlGen) { html =>
      val source = Html.decodeEntities(html)
      Py.splitWs(Html.extract(html).text).foreach { w =>
        assert(source.contains(w), s"invented word '$w'")
      }
    }
  }

  test("property: script/comment/nav content never leaks into extracted text") {
    check(htmlGen) { html =>
      val text = Html.extract(html).text
      assert(!text.contains("never"))
      assert(!text.contains("comment with"))
    }
  }

  test("property: tokenizer never throws on arbitrary strings") {
    check(Gen.asciiPrintableStr) { s =>
      Html.extract(s) // must not throw
    }
    check(Gen.listOf(Gen.chooseNum(Char.MinValue, Char.MaxValue)).map(_.mkString)) { s =>
      Html.extract(s) // arbitrary unicode noise
    }
  }

  test("property: extractor kernel never throws on arbitrary payload bytes") {
    val ex = new Extractor(ProbeConfig())
    check(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)) { bytes =>
      val r = ex.extract(bytes)
      assert(Set("html", "pdf", "error").contains(r.docKind))
      assert(Set("true", "false", "partial").contains(r.status))
    }
    // corrupted pdf magic prefixes specifically
    check(Gen.chooseNum(0, 64)) { n =>
      val good = PdfPayload.serialize(Synth.pdfScanned(new java.util.SplittableRandom(1), 2))
      val r = ex.extract(good.take(math.min(n + 8, good.length)))
      assert(Set("pdf", "error").contains(r.docKind))
    }
  }
}
