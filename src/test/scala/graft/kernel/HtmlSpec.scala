package graft.kernel

import java.util.SplittableRandom

import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer, block segmentation and boilerplate classification tests
  * (FIXTURES.md §2). Structural properties here; frozen byte goldens live in
  * HtmlGoldenSpec. */
class HtmlSpec extends AnyFunSuite {

  test("tokenizer: tags, text, comments, doctype") {
    val html = "<!DOCTYPE html><p class=\"a\">Hello <b>world</b></p><!-- gone -->tail"
    val ev = Html.tokenize(html).toList
    val names = ev.collect { case StartTag(n, _, _, _) => n }
    assert(names == List("p", "b"))
    val texts = ev.collect { case TextRun(s, e) => html.substring(s, e) }
    assert(texts == List("Hello ", "world", "tail"))
  }

  test("tokenizer: script/style raw content is consumed, not text") {
    val html = "<p>a</p><script>var x = '<p>not text</p>';</script><style>p{}</style><p>b</p>"
    val ev = Html.tokenize(html).toList
    val texts = ev.collect { case TextRun(s, e) => html.substring(s, e) }
    assert(texts == List("a", "b"))
  }

  test("tokenizer: attributes with '>' inside quotes") {
    val html = """<a href="/x" title="a > b">link</a> rest"""
    val ev = Html.tokenize(html).toList
    val texts = ev.collect { case TextRun(s, e) => html.substring(s, e) }
    assert(texts == List("link", " rest"))
  }

  test("tokenizer: stray quote in an UNQUOTED attribute value does not " +
    "swallow the document (quotes only open values right after '=')") {
    val html = """<p><img alt=don't src=x.png> visible text</p><p>more</p>"""
    val ev = Html.tokenize(html).toList
    val texts = ev.collect { case TextRun(s, e) => html.substring(s, e) }
    assert(texts.exists(_.contains("visible text")), s"texts=$texts")
    assert(texts.exists(_.contains("more")), s"texts=$texts")
    // properly quoted values still honor quotes (incl. '>' inside)
    val ok = """<img alt="a > don't b"><p>tail</p>"""
    val tx2 = Html.tokenize(ok).toList
      .collect { case TextRun(s, e) => ok.substring(s, e) }
    assert(tx2 == List("tail"))
  }

  test("tokenizer: unclosed tag / bare < are lenient") {
    val ev1 = Html.tokenize("a < b and c")
    assert(ev1.collect { case t: TextRun => t }.nonEmpty)
    val ev2 = Html.tokenize("<p>text<div")
    val html2 = "<p>text<div"
    val texts = ev2.collect { case TextRun(s, e) => html2.substring(s, e) }
    assert(texts == List("text"))
  }

  test("entity decoding") {
    assert(Html.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot; &#65; &#x41; &nbsp;x") ==
      "a & b <c> \"d\" A A  x")
    assert(Html.decodeEntities("no entities") == "no entities")
    assert(Html.decodeEntities("broken &am b &unknown; &#xZZ; end") ==
      "broken &am b &unknown; &#xZZ; end")
  }

  test("segment: boilerplate containers are flagged; content is not") {
    val html =
      """<html><body><nav><a href="/">Home</a> <a href="/a">About</a></nav>
        |<main><p>This is the long main content paragraph with many words to keep
        |the densitometric classifier comfortably above its word thresholds.</p></main>
        |<footer><a href="/p">Privacy</a></footer></body></html>""".stripMargin
    val (blocks, _, _) = Html.segment(html)
    val boiler = blocks.filter(_.inBoilerTag)
    val content = blocks.filter(!_.inBoilerTag)
    assert(boiler.nonEmpty && content.nonEmpty)
    assert(content.exists(_.text.startsWith("This is the long main content")))
    assert(boiler.forall(b => b.text.contains("Home") || b.text.contains("Privacy")))
  }

  test("segment: link density computed from anchor words") {
    val html = "<div><a href='/x'>two words</a> and three more words here</div>"
    val (blocks, _, _) = Html.segment(html)
    assert(blocks.length == 1)
    val b = blocks.head
    assert(b.words == 7 && b.anchorWords == 2)
    assert(b.linkDensity == 2.0 / 7.0)
  }

  test("extract: article keeps content, drops nav/aside/footer/script") {
    val html = Synth.htmlArticle(new SplittableRandom(5), 1, 6)
    val ex = Html.extract(html)
    assert(ex.text.nonEmpty)
    assert(!ex.text.contains("Home"))
    assert(!ex.text.contains("tag 0 related link"))
    assert(!ex.text.contains("tracker"))
    assert(!ex.text.contains("margin: 0"))
    assert(!ex.text.contains("©"))
    assert(ex.title.startsWith("Synthetic Document"))
    assert(ex.contentBlockCount > 0 && ex.contentBlockCount <= ex.blockCount)
  }

  test("extract: link farm yields no content") {
    val ex = Html.extract(Synth.htmlLinkFarm(new SplittableRandom(5), 2))
    assert(ex.text.isEmpty)
    assert(ex.spans.isEmpty)
  }

  test("extract: empty and trivial pages") {
    assert(Html.extract("").text.isEmpty)
    assert(Html.extract("<html><body></body></html>").text.isEmpty)
  }

  test("spans index into the source string and cover the content") {
    val html = Synth.htmlArticle(new SplittableRandom(13), 3, 5)
    val ex = Html.extract(html)
    assert(ex.spans.nonEmpty)
    ex.spans.foreach { sp =>
      assert(sp.start >= 0 && sp.end <= html.length && sp.start < sp.end)
    }
    // spans are ascending and non-overlapping
    ex.spans.sliding(2).foreach {
      case Vector(a, b) => assert(a.end <= b.start)
      case _ =>
    }
    // the first word of each content block appears within its span slice
    val blockTexts = ex.text.split('\n')
    assert(blockTexts.length == ex.spans.length)
    blockTexts.zip(ex.spans).foreach { case (t, sp) =>
      val slice = html.substring(sp.start, sp.end)
      val firstWord = t.split(' ').head
      assert(slice.contains(firstWord), s"'$firstWord' not in span slice")
    }
  }

  test("extracted words are a subset of source words (no invented text)") {
    val html = Synth.htmlArticle(new SplittableRandom(99), 7, 4)
    val ex = Html.extract(html)
    val sourceWords = Py.splitWs(Html.decodeEntities(
      html.replaceAll("<[^>]*>", " "))).toSet
    Py.splitWs(ex.text).foreach(w => assert(sourceWords.contains(w), s"invented word: $w"))
  }

  test("content inside a table is extracted") {
    val row = "<tr><td>The quick brown fox jumps over the lazy dog near the river bank today</td></tr>"
    val html = s"<html><body><table>$row$row</table></body></html>"
    val ex = Html.extract(html)
    assert(ex.text.contains("quick brown fox"))
  }

  test("malformed html does not throw and still extracts") {
    val html = "<html><body><p>Paragraph one has plenty of words to be considered content " +
      "by the classifier even though <b>tags <i>never close and the document just ends"
    val ex = Html.extract(html)
    assert(ex.text.contains("Paragraph one"))
  }

  test("determinism: same input → identical output") {
    val html = Synth.htmlArticle(new SplittableRandom(77), 11, 8)
    val a = Html.extract(html)
    val b = Html.extract(html)
    assert(a == b)
  }
}
