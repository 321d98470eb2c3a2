package graft.kernel

import java.util.regex.{Matcher, Pattern}

/** Python-compatible string/regex semantics.
  *
  * The reference kernel (/root/reference/src/ocr_detection/_analyzer.py,
  * _detector.py) is CPython 3.13; its text functions are the
  * byte-identity-critical surface (SURVEY.md §2.8). This object pins down the
  * places where Java and Python string semantics diverge:
  *
  *  - `str.strip()` strips Python's whitespace set (`str.isspace`), which
  *    includes U+00A0 and U+001C..U+001F — Java's `String.strip` does not.
  *  - `str.split()` (no args) splits on runs of that same whitespace set and
  *    drops empty tokens.
  *  - `str.split("\n")` keeps trailing empty fields (Java needs limit = -1).
  *  - `re` with `str` patterns is Unicode-aware: `\w`, `\b`, `\s` are Unicode
  *    classes → Java needs UNICODE_CHARACTER_CLASS (+ UNICODE_CASE for
  *    IGNORECASE).
  *  - `re.MULTILINE` `$` only treats `\n` as a line terminator → Java needs
  *    UNIX_LINES or `$` would also match before CR / NEL / LS / PS.
  *  - `statistics.stdev` is the SAMPLE standard deviation (n − 1), computed
  *    from exact integer sums for int inputs.
  *
  *  - `len(s)`, `s[:n]`, `s[0]` and per-char classification are CODE-POINT
  *    operations in CPython; Java Strings are UTF-16 — `Py.len`/`Py.sliceCp`
  *    and code-point loops pin this for non-BMP text (emoji, math
  *    alphanumerics), exercised by the non-BMP rows of analyzer_parity.tsv.
  *
  * Known residual divergence (documented, fixture-free): Python `\s` also
  * matches U+001C..U+001F; Java's Unicode `\s` (White_Space=Yes) does not.
  * No fixture or realistic web payload contains those code points.
  */
object Py {

  /** Python `len(s)` — counts CODE POINTS, not UTF-16 units. Non-BMP text
    * (emoji, math alphanumerics) counts each astral char once, like
    * CPython; Java's String.length would count its two surrogate units. */
  def len(s: String): Int = s.codePointCount(0, s.length)

  /** Python `s[:n]` — slice by code points. */
  def sliceCp(s: String, n: Int): String =
    if (len(s) <= n) s else s.substring(0, s.offsetByCodePoints(0, n))

  /** Python `str.isspace()` for a single char (Unicode Zs/Zl/Zp + the ASCII
    * control whitespace set + U+0085). */
  def isSpace(c: Char): Boolean = {
    val t = Character.getType(c)
    t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
    t == Character.PARAGRAPH_SEPARATOR ||
    c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r' ||
    c == '\u001C' || c == '\u001D' || c == '\u001E' || c == '\u001F' ||
    c == '\u0085'
  }

  /** Python `str.strip()` (no args). */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isSpace(s.charAt(i))) i += 1
    while (j > i && isSpace(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  /** Python `str.lstrip()` (no args). */
  def lstrip(s: String): String = {
    var i = 0
    while (i < s.length && isSpace(s.charAt(i))) i += 1
    s.substring(i)
  }

  /** Python `str.split()` (no args): split on whitespace runs, no empties. */
  def splitWs(s: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isSpace(s.charAt(i))) i += 1
      if (i < n) {
        val start = i
        while (i < n && !isSpace(s.charAt(i))) i += 1
        out += s.substring(start, i)
      }
    }
    out.result()
  }

  /** Python `str.split(sep)`: keeps leading/trailing empty fields. */
  def splitOn(s: String, sep: Char): Array[String] = {
    val out = Array.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == sep) { out += s.substring(start, i); start = i + 1 }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }

  private val baseFlags = Pattern.UNICODE_CHARACTER_CLASS | Pattern.UNIX_LINES

  /** Compile with Python-`re`-equivalent flags. */
  def re(pattern: String): Pattern = Pattern.compile(pattern, baseFlags)

  def reMultiline(pattern: String): Pattern =
    Pattern.compile(pattern, baseFlags | Pattern.MULTILINE)

  def reIgnoreCase(pattern: String): Pattern =
    Pattern.compile(pattern, baseFlags | Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)

  /** `len(re.findall(p, s))` — count of non-overlapping matches. */
  def countMatches(p: Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  /** `re.findall(p, s)` for patterns without groups (whole-match capture). */
  def findAll(p: Pattern, s: String): List[String] = {
    val m = p.matcher(s)
    val out = List.newBuilder[String]
    while (m.find()) out += m.group()
    out.result()
  }

  /** `re.search(p, s) is not None`. */
  def search(p: Pattern, s: String): Boolean = p.matcher(s).find()

  /** `re.split(p, s)` — includes leading/trailing empty fields like CPython. */
  def reSplit(p: Pattern, s: String): Array[String] = {
    val m: Matcher = p.matcher(s)
    val out = Array.newBuilder[String]
    var start = 0
    while (m.find()) {
      out += s.substring(start, m.start())
      start = m.end()
    }
    out += s.substring(start)
    out.result()
  }

  /** Python `str.isupper()`: ≥1 cased char and all cased chars uppercase.
    * Iterates CODE POINTS so non-BMP cased letters (math alphanumerics
    * like U+1D400 𝐀) are classified like CPython, not as surrogate pairs. */
  def isUpperStr(s: String): Boolean = {
    var hasCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (Character.isLowerCase(cp) || Character.getType(cp) == Character.TITLECASE_LETTER)
        return false
      if (Character.isUpperCase(cp)) hasCased = true
      i += Character.charCount(cp)
    }
    hasCased
  }

  /** `statistics.mean` over ints (exact sums → correctly-rounded double). */
  def meanInt(xs: Array[Int]): Double = {
    var s = 0L
    var i = 0
    while (i < xs.length) { s += xs(i); i += 1 }
    s.toDouble / xs.length
  }

  /** `statistics.stdev` (sample, n−1) over ints, via the exact integer
    * identity SS = (n·Σx² − (Σx)²)/n so the result matches CPython's
    * exact-fraction computation for inputs within Long range. */
  def stdevInt(xs: Array[Int]): Double = {
    val n = xs.length
    require(n > 1, "stdev requires at least two data points")
    var s = 0L
    var ss = 0L
    var i = 0
    while (i < n) { s += xs(i); ss += xs(i).toLong * xs(i); i += 1 }
    // variance = (n·Σx² − (Σx)²) / (n·(n−1)); numerator exact in Long for
    // any realistic line-length input (|x| < 2^20, n < 2^20).
    val num = n * ss - s * s
    math.sqrt(num.toDouble / (n.toDouble * (n - 1)))
  }
}
