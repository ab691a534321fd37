package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions ([ext], SURVEY.md §2.8).
  *
  * Everything here is a pure `Column` expression built from codegen'd
  * built-ins (split / filter / transform / aggregate) — no UDFs, so the
  * whole text pipeline stays inside whole-stage codegen and distributes
  * trivially (narrow, per-row).
  */
object Texts {

  /** Whitespace tokenizer, empty tokens dropped (documents end with a
    * trailing space — a naive split yields a phantom "" token).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  def uniqueTokenCount(text: Column): Column = size(array_distinct(tokens(text)))

  /** Sum of token lengths (int) — building block for avg token length. */
  def sumTokenLength(text: Column): Column =
    aggregate(tokens(text), lit(0), (acc, t) => acc + length(t))

  /** Count of tokens found in `words` (multiplicity preserved). */
  def wordHitCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  /** A small fixed English stopword list (quality-scoring feature). */
  val englishStopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "in", "and", "or", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "from", "it", "this", "that")

  /** Tiny per-language marker lexicons for the n-gram/stopword language-ID
    * heuristic. Deterministic, self-contained (no external model).
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> englishStopwords,
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "y", "es", "en", "un"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"),
  )

  /** Language-ID heuristic: argmax of marker-lexicon hit counts, ties and
    * zero-hit rows -> "und" (undetermined).
    *
    * Shaped to tokenize ONCE: a single `aggregate` fold over the token
    * array accumulates all per-language counters into one struct, then the
    * argmax is a cheap struct-field comparison. (The naive greatest-of-
    * scores formulation re-evaluates the tokenization per score reference
    * — the [[collapse-project inlining]] trap, see MinHashSig scaladoc.)
    */
  /** Per-language marker-hit counters as ONE struct, built in a single
    * fold over the token array (one tokenization, one pass).
    */
  def langScores(text: Column): Column = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    val zero = struct(langs.map { case (l, _) => lit(0).as(l) }: _*)
    aggregate(tokens(text), zero, (acc, t) =>
      struct(langs.map { case (l, words) =>
        (acc.getField(l) + when(t.isInCollection(words), 1).otherwise(0)).as(l)
      }: _*))
  }

  /** Argmax over a langScores struct ATTRIBUTE. Keep the scores in their
    * own projection (`.select(langScores(...).as("sc")).select(
    * langIdFromScores(col("sc")))`): this function references the struct
    * many times, and only a multi-referenced non-cheap alias survives
    * CollapseProject un-inlined. A single-expression formulation
    * re-evaluates the fold per reference (no CSE in interpreted HOFs).
    */
  def langIdFromScores(scores: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val best = greatest(langs.map(scores.getField): _*)
    langs.foldLeft(Option.empty[Column]) { case (acc, lang) =>
      val hit = (scores.getField(lang) === best) && (best > 0)
      Some(acc.fold(when(hit, lang))(_.when(hit, lang)))
    }.get.otherwise(lit("und"))
  }

  /** One-shot convenience (fine for small frames / tests). */
  def langId(text: Column): Column = langIdFromScores(langScores(text))

  /** Document fingerprint: full-content SHA-256 (exact-dup key that is
    * shuffle-friendly at 100 TB — 32 bytes instead of the whole text).
    */
  def fingerprintSha(text: Column): Column = sha2(text, 256)

  /** BPE-ish sub-word tokenizer: lowercase, then words / digit runs /
    * single punctuation marks as separate tokens — the shape an LLM-data
    * token counter wants (whitespace counting undercounts code/punct-heavy
    * text). Pure regex, codegen'd.
    */
  def regexTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Rolling-hash document fingerprint: minimum xxhash64 over the n-gram
    * shingle stream (the winnowing/min-sampling idea collapsed to one
    * value). Similar prefixes/windows -> likely-equal fingerprints; a
    * compact near-dup blocking key where the full MinHash signature is
    * overkill. Null for docs with fewer than n tokens.
    */
  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => xxhash64(s)))

  /** Token n-gram shingles: ["a","b","c"], n=2 -> ["a b", "b c"].
    * Empty result if the document has fewer than n tokens.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    if (n == 1) toks // 1-gram shingles ARE the tokens; skip the slice pipeline
    else when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }
}
