package graft.kernel

/** Deterministic 64-bit hashing for dedup/fingerprinting — self-contained
  * (engine-independent: results don't depend on Spark or any SQL engine's
  * hash, so signatures are stable across versions and portable to tests).
  * FNV-1a with a 64-bit avalanche finisher (splitmix64's mixer). */
object Hashing {

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  def fnv1a(s: String, seed: Long = 0L): Long = {
    var h = FnvOffset ^ seed
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= FnvPrime
      i += 1
    }
    mix(h)
  }

  /** splitmix64 finisher — avalanches FNV's weak low bits. */
  def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 30; x *= 0xbf58476d1ce4e5b9L
    x ^= x >>> 27; x *= 0x94d049bb133111ebL
    x ^= x >>> 31
    x
  }

  /** Q20 fixed-point integer log2: round-toward-zero log2(n)·2^20 computed
    * with INTEGER arithmetic only (normalize to Q32 in [2^32, 2^33), then
    * 20 square-and-shift steps — the classical digit-recurrence method).
    * Exact and engine-reproducible: the DuckDB oracle unrolls the same 20
    * steps in HUGEINT SQL and gets bit-identical values, which is what
    * lets log-ratio scoring (DSIR importance weights) be oracle-checked
    * with ZERO floating-point operations. Accuracy ≈ 1e-6 log2 units
    * (plus Q32 truncation for n ≥ 2^33). Requires n ≥ 1. */
  def ilog2Q20(n: Long): Long = {
    require(n >= 1, s"ilog2Q20 requires n >= 1, got $n")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(n)
    var x: Long = if (e <= 32) n << (32 - e) else n >>> (e - 32)
    var bits = 0L
    var i = 0
    while (i < 20) {
      // x < 2^33 so the square needs 66 bits: multiplyHigh + unsigned
      // low half reassemble the exact 128-bit product >> 32
      val hi = java.lang.Math.multiplyHigh(x, x)
      val sq = (hi << 32) | ((x * x) >>> 32)
      x = if (sq >= 0x200000000L) { bits = bits * 2 + 1; sq >>> 1 }
        else { bits = bits * 2; sq }
      i += 1
    }
    (e.toLong << 20) + bits
  }

  /** SimHash-64 over whitespace tokens: per token a 64-bit hash votes ±1 on
    * each bit position; the sign of each position's tally forms the
    * fingerprint. Near-duplicate texts land within small Hamming distance. */
  def simhash64(text: String): Long = {
    val tally = new Array[Int](64)
    val toks = Py.splitWs(text)
    var t = 0
    while (t < toks.length) {
      val h = fnv1a(toks(t))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Polynomial rolling-hash document fingerprint over chars (order
    * sensitive — permuted text gets a different fingerprint, unlike a bag
    * hash). */
  def rollingFingerprint(text: String): Long = {
    var h = 0L
    var i = 0
    while (i < text.length) {
      h = h * 1315423911L + text.charAt(i)
      i += 1
    }
    mix(h)
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Winnowing — the STANDARD algorithm of Schleimer, Wilkerson, Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting",
    * SIGMOD'03 §4 (not the paper's "robust" variant, which prefers
    * re-selecting the previous window's pick on ties — the rightmost
    * rule here is position-deterministic, which the SQL oracle needs):
    * hash every word k-gram ([[fnv1a]] of the space-joined gram), slide
    * a window of `w` consecutive gram hashes, and select each window's
    * minimum — rightmost occurrence on ties. Guarantees: every
    * shared token run of length ≥ w + k − 1 yields at least one shared
    * selected fingerprint (detection), and expected sketch density is
    * 2/(w+1) of the gram count (the sub-linear sketch that makes
    * fingerprint joins affordable at corpus scale).
    *
    * Hashes compare as UNSIGNED 64-bit values (the natural order of the
    * HUGEINT re-derivation in the DuckDB oracle), not signed Longs.
    * Returns distinct (gram position, gram hash) selections in position
    * order. Fewer than w grams → one window over all of them; fewer than
    * k tokens → empty sketch. */
  def winnow(tokens: IndexedSeq[String], k: Int, w: Int): Vector[(Int, Long)] = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val m = tokens.length - k + 1
    if (m <= 0) return Vector.empty
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = fnv1a(tokens.slice(i, i + k).mkString(" "))
      i += 1
    }
    val picked = scala.collection.mutable.SortedSet.empty[Int]
    var j = 0
    val lastStart = math.max(m - w, 0)
    while (j <= lastStart) {
      var best = j
      var p = j + 1
      val end = math.min(j + w, m)
      while (p < end) {
        if (java.lang.Long.compareUnsigned(hs(p), hs(best)) <= 0) best = p
        p += 1
      }
      picked += best
      j += 1
    }
    picked.toVector.map(p => (p, hs(p)))
  }
}
