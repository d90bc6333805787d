package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines
  * (beyond-reference surface, SURVEY §7 item 7). Everything is built from
  * codegen'd `org.apache.spark.sql.functions` — no UDFs — so the operators
  * run inside whole-stage codegen and scale linearly with input splits:
  * per-document computations have no shuffle at all.
  */
object TextAnalysis {

  /** Whitespace tokenization. Edge whitespace is stripped with a REGEXP
    * trim first — Spark's trim() removes only ASCII spaces, so a
    * tab/newline-edged document would otherwise emit phantom empty
    * tokens — and an empty or whitespace-only document yields ZERO
    * tokens (split("", ...) returns [""], which would otherwise count
    * one phantom token and leak an empty token into every downstream
    * stats/shingle pipeline). NULL text stays NULL. Trim-then-split
    * means interior runs collapse and no other input can produce an
    * empty fragment, so the single guard is exhaustive (no interpreted
    * array-filter needed — the whole expression stays codegen).
    * Equivalent DuckDB form (used by the oracles):
    * list_filter(string_split_regex(text, '\s+'), t -> t <> ''). */
  def tokens(text: Column): Column = {
    val t = wsTrim(text)
    when(length(t) > 0, split(t, "\\s+"))
      .otherwise(when(text.isNotNull, lit(Array.empty[String])))
  }

  /** Full-whitespace edge trim (tabs/newlines included, unlike trim()). */
  private def wsTrim(text: Column): Column =
    regexp_replace(text, "^\\s+|\\s+$", "")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token estimate: runs of letters, runs of digits, and single
    * punctuation marks each count as one token. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
  def bpeishTokenCount(text: Column): Column = regexp_count(text, lit(BpeishPattern))

  /** Characters that are neither word characters nor whitespace. */
  def punctCount(text: Column): Column = regexp_count(text, lit("[^a-zA-Z0-9\\s]"))

  def charCount(text: Column): Column = length(text)

  /** Stopword hits: number of tokens that are in `words` (space-padded
    * containment, duplicate-insensitive per word). */
  def markerScore(text: Column, words: Seq[String]): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    words.map(w => when(padded.contains(s" $w "), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** Language-ID marker words (n-gram-heuristic stand-in): function words
    * that discriminate between the pipeline's languages. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Predict language: highest marker score wins, ties broken by the
    * declaration order above; all-zero scores → "und" (undetermined). */
  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, ws) => (lang, markerScore(text, ws)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Quality heuristics: length bounds, punctuation ratio, stopword ratio,
    * mean token length. Ratios are double divisions of exact integer counts
    * — deterministic across engines. */
  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")

  def stopwordRatio(text: Column): Column =
    markerScore(text, LangMarkers.head._2).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  def meanTokenLen(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Composite quality gate for pipeline filtering. */
  def qualityOk(text: Column, minChars: Int = 50, maxChars: Int = 10000,
                maxPunctRatio: Double = 0.2): Column =
    length(text).between(minChars, maxChars) && punctRatio(text) <= maxPunctRatio

  /** Normalization used for fingerprinting: collapse whitespace, lowercase. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Aggressive canonicalization for near-dup matching — the C4-style
    * preprocessing that lets EXACT dedup catch reformatted copies
    * (punctuation/casing/whitespace edits): lowercase, strip every
    * non-alphanumeric to a space (ASCII classes only — the RE2∩Java
    * dialect subset every engine agrees on, per the q_text_redact
    * convention), collapse runs, trim. Compose with fingerprint-based
    * grouping so shuffles move 16-byte hashes, never text. */
  def normalizeAggressive(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "),
      "\\s+", " "))

  /** Document fingerprint — md5 of the normalized text (cross-engine
    * deterministic). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** 64-bit rolling-hash fingerprint (engine-internal; values are Spark's
    * xxhash64, not portable across engines — documented like the
    * reference's SupersonicFingerprint, hashing_expressions.h:28-35). */
  def fingerprint64(text: Column): Column = xxhash64(normalize(text))

  // ===== PII redaction (training-data scrubbing; codegen'd regexp_replace
  // chain — zero shuffle, linear scan) =====

  /** Default scrub patterns, ordered most-specific first (SSN before phone
    * — both are digit-dash shapes and replacement is sequential). The
    * regexes stay inside the RE2 ∩ Java-regex common dialect, so any
    * engine reproduces the scrub byte-for-byte. */
  val RedactionPatterns: Seq[(String, String)] = Seq(
    "\\b\\d{3}-\\d{2}-\\d{4}\\b" -> "[SSN]",
    "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b" -> "[PHONE]",
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}" -> "[EMAIL]")

  /** Replace every match of every pattern (applied in order) with its tag. */
  def redact(text: Column, patterns: Seq[(String, String)] = RedactionPatterns): Column =
    patterns.foldLeft(text) { case (t, (pat, tag)) => regexp_replace(t, pat, tag) }

  /** How many PII spans the default patterns would scrub (counted on the
    * progressively-redacted text, so overlapping pattern classes — SSN vs
    * phone — never double-count one span). */
  def piiCount(text: Column, patterns: Seq[(String, String)] = RedactionPatterns): Column =
    patterns.foldLeft((text, lit(0L))) { case ((t, n), (pat, tag)) =>
      (regexp_replace(t, pat, tag), n + regexp_count(t, lit(pat)))
    }._2
}
