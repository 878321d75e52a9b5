package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, quality scoring, language-ID heuristics,
  * fingerprinting. All pure Catalyst built-ins (codegen'd — no UDFs),
  * so they run inside whole-stage codegen over 100 TB of documents.
  */
object TextFunctions {

  /** Whitespace tokens (generator texts are single-space separated). */
  def tokens(text: Column): Column = split(trim(text), " ")

  def tokenCount(text: Column): Column =
    size(tokens(text)).cast("long")

  /** Total characters that belong to tokens (strips separators). */
  def tokenChars(text: Column): Column =
    length(regexp_replace(text, "[^a-z0-9]", "")).cast("long")

  /** Mean token length; deterministic double division. */
  def avgTokenLen(text: Column): Column =
    tokenChars(text).cast("double") / tokenCount(text).cast("double")

  private val StopwordPattern =
    "\\b(the|a|an|of|to|and|in|is|on|for)\\b"

  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit(StopwordPattern), lit(0))).cast("long")

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text).cast("double")

  /** Heuristic quality score in [0,1]: enough tokens, not stopword soup.
    * quality = min(1, n_tokens/50) * (1 - stopword_ratio)
    */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text).cast("double") / lit(50.0)) *
      (lit(1.0) - stopwordRatio(text))

  /** Stopword-trigger language-ID heuristic (n-gram-lite). Real
    * pipelines plug a model here; the operator shape (scan-side scalar
    * classification, no shuffle) is what matters at scale. */
  def langIdHeuristic(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    when(padded.contains(" der ") || padded.contains(" und "), "de")
      .when(padded.contains(" le ") || padded.contains(" la "), "fr")
      .when(padded.contains(" el ") || padded.contains(" los "), "es")
      .when(padded.contains(" the ") || padded.contains(" is "), "en")
      .otherwise("unknown")
  }

  /** Exact-content fingerprint (md5 hex — stable across engines). */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Bigram shingles over an ALREADY-MATERIALIZED token array column.
    * Feeding `tokens(text)` directly would re-evaluate the split inside
    * every lambda invocation (one per bigram — observed ~180 redundant
    * splits per doc); materialize the array in a projection first. */
  def bigramShinglesFromTokens(ts: Column): Column =
    when(size(ts) >= 2,
      array_distinct(transform(sequence(lit(1), size(ts) - 1),
        i => concat(element_at(ts, i), lit(" "), element_at(ts, i + 1)))))
      .otherwise(array().cast("array<string>"))

  /** Word bigram shingles (distinct), the dedup unit for MinHash.
    * Empty when the doc has fewer than two tokens. Prefer the two-step
    * `tokens(...)` + [[bigramShinglesFromTokens]] in query plans. */
  def bigramShingles(text: Column): Column =
    bigramShinglesFromTokens(tokens(text))

  /** ALL bigram occurrences (duplicates kept) — the unit for
    * repetition metrics, where the dedup that [[bigramShingles]]
    * applies would erase exactly the signal being measured. */
  def bigramsAllFromTokens(ts: Column): Column =
    when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1),
        i => concat(element_at(ts, i), lit(" "), element_at(ts, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** Distinct `w`-word spans over a materialized token array — the
    * unit of span-level (exact-substring-style) dedup detection, where
    * a duplicated PASSAGE inside otherwise-distinct documents is the
    * target (bigram shingles are too short to localize it; whole-doc
    * fingerprints miss it entirely). Empty when the doc has fewer than
    * `w` tokens. */
  def wordGramsFromTokens(ts: Column, w: Int): Column =
    when(size(ts) >= w,
      array_distinct(transform(sequence(lit(1), size(ts) - (w - 1)),
        i => concat_ws(" ", slice(ts, i, lit(w))))))
      .otherwise(array().cast("array<string>"))

  /** Distinct character trigrams — the char-n-gram dedup unit (robust
    * to word-boundary edits where word shingles are not). Empty when
    * the text is shorter than 3 chars. */
  def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      array_distinct(transform(sequence(lit(1), length(text) - 2),
        i => text.substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))

  /** Seeded MinHash component: min over shingles of md5(seed||shingle).
    * md5-as-permutation keeps the oracle SQL-expressible (DuckDB has
    * identical md5); the production-speed variant would use xxhash64.
    * Apply as an aggregate over exploded shingles. */
  def seededHash(seed: Int, shingle: Column): Column =
    md5(concat(lit(s"$seed|"), shingle).cast("binary"))

  /** PII patterns, RE2-compatible by construction (no backreferences
    * or lookaround) so Java regex (Spark codegen) and RE2 (the DuckDB
    * oracle) match the SAME spans — the portability constraint any
    * cross-engine scrubbing pass must hold. */
  val EmailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern = "\\+?[0-9][0-9-]{6,}[0-9]"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")

  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")

  /** PII scrubbing: emails then phones replaced by typed placeholders
    * (email first — a phone-shaped digit run inside a yet-unredacted
    * address would otherwise be double-redacted). Pure scan-side
    * codegen, no shuffle: the shape every compliance pass needs at
    * 100 TB. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")
}
