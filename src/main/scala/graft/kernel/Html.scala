package graft.kernel

import scala.collection.mutable.ArrayBuffer

/** Char-offset span into the decoded source html string. */
final case class Span(start: Int, end: Int)

/** A lightweight tag-event — the streaming tokenizer's output unit. Offsets
  * are char offsets into the decoded html string. */
sealed trait HtmlEvent
final case class StartTag(name: String, selfClosing: Boolean, start: Int, end: Int) extends HtmlEvent
final case class EndTag(name: String, start: Int, end: Int) extends HtmlEvent
final case class TextRun(start: Int, end: Int) extends HtmlEvent

/** One segmented text block with its shallow text features. `words` counts
  * whitespace tokens, with CJK ideographs each counted as one word (pure-CJK
  * text has no whitespace — a char-count proxy keeps the densitometric
  * thresholds meaningful for it). */
final case class Block(
    text: String,
    words: Int,
    anchorWords: Int,
    spanStart: Int,
    spanEnd: Int,
    inBoilerTag: Boolean) {
  def linkDensity: Double = if (words == 0) 0.0 else anchorWords.toDouble / words
}

/** Extraction result for one html payload. */
final case class HtmlExtract(
    text: String,
    spans: Vector[Span],
    title: String,
    blockCount: Int,
    contentBlockCount: Int,
    imageCount: Int)

/** Streaming HTML tokenizer + block segmentation + shallow-text-feature
  * boilerplate classifier (main-content extraction).
  *
  * This is the north-rule half of the engine (BASELINE.json north_star): the
  * reference repo has no HTML path, so the algorithm here is built from the
  * published shallow-text-features approach of Kohlschütter, Fankhauser &
  * Nejdl, "Boilerplate Detection using Shallow Text Features" (WSDM 2010):
  * segment text into blocks at block-level tag boundaries, compute per-block
  * word count + link density, and classify each block as content/boilerplate
  * from (prev, curr, next) features with the paper's decision-tree
  * thresholds. Extraction is fully deterministic; goldens under
  * src/test/resources/golden/html/ freeze behavior (FIXTURES.md §2).
  *
  * Single pass, bounded per-row state — no DOM tree is built, so memory is
  * O(text), which is what lets the kernel stream 10^12 rows.
  */
object Html {

  /** Tags whose entire subtree is dropped (non-content machinery). */
  private val dropSubtree: Set[String] = Set(
    "script", "style", "noscript", "template", "head", "select", "textarea",
    "svg", "iframe", "object", "embed", "button", "datalist")

  /** Raw-text elements: content until the matching close tag is not HTML. */
  private val rawText: Set[String] = Set("script", "style", "textarea", "noscript", "template")

  /** Block-level boundaries — opening or closing one flushes the block. */
  private val blockTags: Set[String] = Set(
    "address", "article", "aside", "blockquote", "body", "br", "caption",
    "center", "dd", "details", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
    "hr", "html", "legend", "li", "main", "menu", "nav", "ol", "p", "pre",
    "section", "summary", "table", "tbody", "td", "tfoot", "th", "thead",
    "title", "tr", "ul")

  /** Semantic boilerplate containers: blocks inside them are never content. */
  private val boilerTags: Set[String] = Set("nav", "header", "footer", "aside", "form")

  /** Void elements (no close tag, never nest). */
  private val voidTags: Set[String] = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")

  // ---------------------------------------------------------------- tokenizer

  /** Streaming tokenizer: one left-to-right pass, no backtracking beyond the
    * current tag. Lenient on malformed markup (unterminated tags/comments
    * consume to end of input). */
  def tokenize(html: String): ArrayBuffer[HtmlEvent] = {
    val events = new ArrayBuffer[HtmlEvent](64)
    val n = html.length
    var i = 0
    var textStart = 0

    def flushText(end: Int): Unit =
      if (end > textStart) events += TextRun(textStart, end)

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (isNameStart(c1)) { // start tag
          flushText(i)
          val tagStart = i
          i += 1
          val nameStart = i
          while (i < n && isNameChar(html.charAt(i))) i += 1
          val name = html.substring(nameStart, i).toLowerCase
          var selfClosing = false
          // skip attributes, honoring quotes — but a quote only OPENS a
          // quoted value right after '=' (like the HTML5 before-attribute-
          // value state); a stray quote inside an unquoted value (alt=don't)
          // must not swallow the rest of the document
          var done = false
          var prevNonWs = ' '
          while (i < n && !done) {
            val a = html.charAt(i)
            if ((a == '"' || a == '\'') && prevNonWs == '=') {
              i += 1
              while (i < n && html.charAt(i) != a) i += 1
              if (i < n) i += 1
              prevNonWs = a
            } else if (a == '>') {
              selfClosing = i > tagStart && html.charAt(i - 1) == '/'
              i += 1
              done = true
            } else {
              if (!a.isWhitespace) prevNonWs = a
              i += 1
            }
          }
          events += StartTag(name, selfClosing || voidTags.contains(name), tagStart, i)
          if (rawText.contains(name) && !selfClosing) {
            // consume raw content until the matching close tag
            val close = "</" + name
            val idx = indexOfIgnoreCase(html, close, i)
            if (idx < 0) { i = n }
            else {
              var j = idx + close.length
              while (j < n && html.charAt(j) != '>') j += 1
              if (j < n) j += 1
              events += EndTag(name, idx, j)
              i = j
            }
          }
          textStart = i
        } else if (c1 == '/') { // end tag
          flushText(i)
          val tagStart = i
          i += 2
          val nameStart = i
          while (i < n && isNameChar(html.charAt(i))) i += 1
          val name = html.substring(nameStart, i).toLowerCase
          while (i < n && html.charAt(i) != '>') i += 1
          if (i < n) i += 1
          if (name.nonEmpty) events += EndTag(name, tagStart, i)
          textStart = i
        } else if (c1 == '!' && html.startsWith("<!--", i)) { // comment
          flushText(i)
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
          textStart = i
        } else if (c1 == '!' || c1 == '?') { // doctype / processing instr.
          flushText(i)
          while (i < n && html.charAt(i) != '>') i += 1
          if (i < n) i += 1
          textStart = i
        } else {
          i += 1 // bare '<' in text
        }
      } else {
        i += 1
      }
    }
    flushText(n)
    events
  }

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9') || c == '-' || c == ':'

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length
    val m = needle.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      while (j < m && Character.toLowerCase(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  // ------------------------------------------------------------ entity decode

  /** Minimal, deterministic entity decoding for text runs. Unknown entities
    * pass through verbatim. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] = body match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case _ if body.startsWith("#x") || body.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            case _ if body.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // --------------------------------------------------------- block segmenting

  /** Fold the event stream into text blocks with shallow features. */
  def segment(html: String): (Vector[Block], String, Int) = {
    val events = tokenize(html)
    val blocks = Vector.newBuilder[Block]
    var title = ""
    var imageCount = 0

    var dropDepth = 0
    var boilerDepth = 0
    var anchorDepth = 0
    var inTitle = false

    val textSb = new StringBuilder
    var words = 0
    var anchorWords = 0
    var spanStart = -1
    var spanEnd = -1
    var blockBoiler = false

    def flushBlock(): Unit = {
      if (words > 0) {
        blocks += Block(textSb.toString, words, anchorWords, spanStart, spanEnd, blockBoiler)
      }
      textSb.clear()
      words = 0
      anchorWords = 0
      spanStart = -1
      spanEnd = -1
      blockBoiler = boilerDepth > 0
    }

    events.foreach {
      case StartTag(name, selfClosing, _, _) =>
        if (name == "img" && dropDepth == 0) imageCount += 1
        if (blockTags.contains(name)) flushBlock()
        if (!selfClosing) {
          if (dropSubtree.contains(name)) dropDepth += 1
          // every boilerTag is also a blockTag, so flushBlock() above has
          // already reset the block state — the unconditional mark below
          // covers the new block
          if (boilerTags.contains(name)) boilerDepth += 1
          if (name == "a") anchorDepth += 1
          if (name == "title") inTitle = true
        }
        if (boilerDepth > 0) blockBoiler = true

      case EndTag(name, _, _) =>
        if (blockTags.contains(name)) flushBlock()
        if (dropSubtree.contains(name) && dropDepth > 0) dropDepth -= 1
        if (boilerTags.contains(name) && boilerDepth > 0) boilerDepth -= 1
        if (name == "a" && anchorDepth > 0) anchorDepth -= 1
        if (name == "title") inTitle = false

      case TextRun(start, end) =>
        val raw = html.substring(start, end)
        val decoded = decodeEntities(raw)
        val tokens = Py.splitWs(decoded)
        if (inTitle && tokens.nonEmpty && title.isEmpty)
          title = tokens.mkString(" ")
        if (dropDepth == 0 && tokens.nonEmpty) {
          if (boilerDepth > 0) blockBoiler = true
          if (spanStart < 0) spanStart = start
          spanEnd = end
          var tokenWords = 0
          tokens.foreach { t =>
            if (textSb.nonEmpty) textSb.append(' ')
            textSb.append(t)
            tokenWords += wordWeight(t)
          }
          words += tokenWords
          if (anchorDepth > 0) anchorWords += tokenWords
        }
    }
    flushBlock()
    (blocks.result(), title, imageCount)
  }

  /** Word weight of one whitespace token: 1, plus one per CJK ideograph /
    * kana beyond the first so unsegmented CJK text registers its true word
    * mass (≈1 word per char is the standard approximation). */
  private def wordWeight(token: String): Int = {
    var cjk = 0
    var i = 0
    while (i < token.length) {
      val c = token.charAt(i)
      val b = Character.UnicodeBlock.of(c)
      if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
          b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
          b == Character.UnicodeBlock.HIRAGANA ||
          b == Character.UnicodeBlock.KATAKANA ||
          b == Character.UnicodeBlock.HANGUL_SYLLABLES) cjk += 1
      i += 1
    }
    math.max(1, cjk)
  }

  // ----------------------------------------------------------- classification

  /** The NumWordsRules decision tree from the WSDM 2010 paper (densitometric
    * classification on word count + link density of prev/curr/next blocks),
    * with one engine-specific override: blocks inside nav / header / footer /
    * aside / form are always boilerplate. */
  def isContent(prev: Option[Block], curr: Block, next: Option[Block]): Boolean = {
    if (curr.inBoilerTag) return false
    if (curr.linkDensity > 0.333333) return false
    val prevWords = prev.map(_.words).getOrElse(0)
    val prevLink = prev.map(_.linkDensity).getOrElse(0.0)
    val nextWords = next.map(_.words).getOrElse(0)
    if (prevLink <= 0.555556)
      curr.words > 16 || nextWords > 15 || prevWords > 4
    else
      curr.words > 40 || nextWords > 17
  }

  /** Full extraction: tokenize → segment → classify → join content blocks
    * with '\n'. Spans cover each content block's raw char range in the
    * decoded source string.
    *
    * prev/next context for the classifier skips blocks inside semantic
    * boilerplate containers: a content paragraph right after a `<nav>` should
    * be judged against its previous *candidate* block, not against the nav —
    * the nav's link density would otherwise push real content into the
    * strict >40-words branch and drop it. */
  def extract(html: String): HtmlExtract = {
    val (blocks, title, imageCount) = segment(html)
    val candidates = blocks.filter(!_.inBoilerTag)
    val content = Vector.newBuilder[Block]
    var i = 0
    while (i < candidates.length) {
      val prev = if (i > 0) Some(candidates(i - 1)) else None
      val next = if (i + 1 < candidates.length) Some(candidates(i + 1)) else None
      if (isContent(prev, candidates(i), next)) content += candidates(i)
      i += 1
    }
    val cb = content.result()
    HtmlExtract(
      cb.map(_.text).mkString("\n"),
      cb.map(b => Span(b.spanStart, b.spanEnd)),
      title,
      blocks.length,
      cb.length,
      imageCount)
  }
}
