package graft.ops

import graft.kernel.{Hashing, TextQuality}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language-ID,
  * quality scoring, token counting, fingerprinting. Column-expression
  * variants where the math is SQL-portable; kernel variants (Dataset map
  * over the pure-Scala kernel) where full reference semantics are needed. */
object TextOps {

  /** Occurrences of whole word `word` in single-space-separated `text` —
    * built only from length/replace, so it is portable to any SQL engine
    * (used by the DuckDB oracle cross-checks). Doubling inner spaces first
    * gives every token its own space padding, so adjacent occurrences
    * (" a a ") count correctly without overlap handling. */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), replace(text, lit(" "), lit("  ")), lit(" "))
    val needle = s" $word "
    ((length(padded) - length(replace(padded, lit(needle), lit("")))) /
      needle.length).cast("long")
  }

  /** Whitespace token count (single-space-separated text). */
  def tokenCount(text: Column): Column =
    when(length(text) === 0, 0).otherwise(size(split(text, " "))).cast("long")

  /** BPE-ish token estimate: word tokens + punctuation tokens via regex. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))
      .cast("long")

  /** n-gram-heuristic language ID over (en, de, fr) stopword markers.
    * Marker hit counts are whole-word occurrences; the argmax (ties → the
    * earlier language in the order en, de, fr) is the guess, "und" =
    * undetermined when no marker hits. */
  def langIdGuess(text: Column): Column = {
    val en = Seq("the", "and", "of", "is").map(wordOccurrences(text, _)).reduce(_ + _)
    val de = Seq("der", "und", "die", "ist").map(wordOccurrences(text, _)).reduce(_ + _)
    val fr = Seq("le", "et", "les", "est").map(wordOccurrences(text, _)).reduce(_ + _)
    when(greatest(en, de, fr) === 0, "und")
      .when(en >= de && en >= fr, "en")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** SQL-portable quality proxy: stopword density + length band + numeric
    * ratio, additive and capped like the reference's F5 shape. */
  def qualityProxy(text: Column): Column = {
    val words = tokenCount(text)
    val stop = Seq("the", "and", "of", "is", "a", "to")
      .map(wordOccurrences(text, _)).reduce(_ + _)
    val stopRatio = when(words === 0, 0.0).otherwise(stop.cast("double") / words)
    val lenScore = when(length(text) >= 200 && length(text) <= 5000, 0.3).otherwise(0.0)
    val digits = length(text) - length(regexp_replace(text, "[0-9]", ""))
    val digitRatio = when(length(text) === 0, 0.0)
      .otherwise(digits.cast("double") / length(text))
    val digitScore = when(digitRatio < 0.3, 0.2).otherwise(0.0)
    least(least(stopRatio, lit(0.5)) + lenScore + digitScore, lit(1.0))
  }

  /** Corpus vocabulary: the k most frequent whitespace tokens with doc
    * frequencies — the heavy-hitters substrate of tokenizer/vocab training.
    * Shuffle story: explode is row-local; the groupBy aggregates with
    * map-side combine (distinct tokens per partition, not token
    * occurrences, cross the wire); the final top-k is a TakeOrdered over
    * the aggregated (≈ vocabulary-sized) table, not the corpus.
    * Deterministic ties: count DESC, then token ASC. */
  def topVocabulary(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("token").asc)
      .limit(k)

  /** PII scrubbing for training corpora: mask emails, IPv4 addresses and
    * international-format phone numbers with typed placeholder tokens.
    * A chain of codegen'd `regexp_replace` (row-local, no UDF); the
    * patterns avoid lookaround so they are portable to RE2-based engines
    * (the DuckDB oracle runs the same regexes with the 'g' flag). Order
    * matters: emails first (an email's host part must not be half-eaten
    * by another rule), then IPs, then phones. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+\\d{7,15}\\b", "<PHONE>")
  }

  /** Full reference-semantics quality metrics via the kernel (Dataset map —
    * used when byte-identical F1–F7 values are required on a text column). */
  def kernelQuality(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val m = TextQuality.analyze(if (text == null) "" else text)
        (id, m.charCount, m.wordCount, m.avgWordLength, m.ocrQualityScore,
          m.textDensity, m.formattingConsistency, m.english, m.numeric,
          m.specialChars)
      }
      .toDF("id", "char_count", "word_count", "avg_word_length",
        "ocr_quality_score", "text_density", "formatting_consistency",
        "english", "numeric", "special_chars")
  }

  /** Order-sensitive rolling-hash document fingerprint via the kernel. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val t = if (text == null) "" else text
        (id, Hashing.rollingFingerprint(t), Hashing.simhash64(t))
      }
      .toDF("id", "fingerprint", "simhash")
  }
}
