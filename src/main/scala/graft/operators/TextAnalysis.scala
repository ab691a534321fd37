package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Texts

/** Text-analysis operators over the documents corpus ([ext], SURVEY.md
  * §2.8): token statistics, quality scoring, language ID, fingerprints.
  * All narrow per-row transforms + one hash aggregate — scales linearly,
  * shuffle only on the (low-cardinality) group keys.
  */
object TextAnalysis {

  /** Per-language corpus statistics. */
  def tokenStatsByLang(documents: DataFrame): DataFrame =
    documents
      .select(col("lang"), Texts.tokenCount(col("text")).as("n_toks"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        round(avg(col("n_toks")), 6).as("avg_tokens"))

  /** Append the quality feature columns NARROWLY to any frame with a
    * `text` column — the composition-friendly form: a pipeline stage
    * (q136) projects the features directly onto its corpus in one pass
    * instead of self-joining [[docQuality]] back on doc_id (which scans
    * and tokenizes the same rows twice for what are per-row
    * expressions). Unused feature columns prune away for free.
    */
  def withQualityFeatures(df: DataFrame): DataFrame = {
    val nToks = col("n_tokens")
    df
      .withColumn("n_tokens", Texts.tokenCount(col("text")))
      .withColumn("n_uniq_tokens", Texts.uniqueTokenCount(col("text")))
      .withColumn("avg_token_len",
        when(nToks > 0,
          round(Texts.sumTokenLength(col("text")).cast("double") / nToks, 6)))
      .withColumn("stopword_ratio",
        when(nToks > 0,
          round(Texts.wordHitCount(col("text"), Texts.englishStopwords)
            .cast("double") / nToks, 6)))
  }

  /** Per-document quality features: token counts, uniqueness, mean token
    * length, stopword ratio. The standard "is this document junk" feature
    * vector for LLM-corpus filtering.
    */
  def docQuality(documents: DataFrame): DataFrame =
    withQualityFeatures(documents)
      .select(col("doc_id"), col("n_tokens"), col("n_uniq_tokens"),
        col("avg_token_len"), col("stopword_ratio"))

  /** The Gopher stopword-presence list (Rae et al. 2021, appendix A —
    * "contains at least two of: the, be, to, of, and, that, have,
    * with").
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The published Gopher quality-rule gate (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", appendix A "Quality filtering" —
    * the doc-level heuristics MassiveWeb applies before dedup; also the
    * core of RedPajama-v2's and Dolma's rule sets):
    *
    *   - word count in [50, 100000]
    *   - mean word length in [3, 10]
    *   - >= 80% of words contain at least one alphabetic character
    *   - symbol-to-word ratio <= 0.1 for EACH tracked symbol ('#' and
    *     '...') separately — the paper thresholds per symbol, not the
    *     sum, so a doc at 0.06 on each must still pass
    *   - at least 2 distinct stopwords from [[gopherStopwords]]
    *
    * (The paper's line-shape rules — bullet/ellipsis line ratios —
    * need multi-line documents; this corpus is single-line, so they
    * are not represented.) One narrow per-row projection — no
    * shuffle, no UDF; every feature and flag is a codegen'd
    * expression, so the gate composes into any pipeline scan
    * (q136-style) for free.
    *
    * Returns per doc: the feature values (rounded where fractional,
    * the oracle convention), one boolean per rule, and the overall
    * `pass`.
    */
  def gopherQualityGate(documents: DataFrame): DataFrame = {
    val toks = col("__toks")
    val nW = col("n_words")
    documents
      .withColumn("__toks", Texts.tokens(col("text")))
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("mean_word_len",
        round(try_divide(Texts.sumTokenLength(col("text")).cast("double"), nW), 6))
      .withColumn("frac_alpha_words",
        round(try_divide(
          size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("double"), nW), 6))
      .withColumn("hash_ratio",
        round(try_divide(
          (length(col("text")) - length(replace(col("text"), lit("#"), lit(""))))
            .cast("double"), nW), 6))
      .withColumn("ellipsis_ratio",
        round(try_divide(
          (length(col("text")) - length(replace(col("text"), lit("..."), lit(""))))
            .cast("double") / 3.0, nW), 6))
      .withColumn("stop_hits",
        size(filter(
          array(gopherStopwords.map(lit): _*),
          s => array_contains(toks, s))).cast("long"))
      .withColumn("words_ok", nW.between(50L, 100000L))
      .withColumn("mean_len_ok", col("mean_word_len").between(3.0, 10.0))
      .withColumn("alpha_ok", col("frac_alpha_words") >= 0.8)
      .withColumn("symbol_ok",
        col("hash_ratio") <= 0.1 && col("ellipsis_ratio") <= 0.1)
      .withColumn("stopword_ok", col("stop_hits") >= 2L)
      .withColumn("pass",
        col("words_ok") && col("mean_len_ok") && col("alpha_ok") &&
          col("symbol_ok") && col("stopword_ok"))
      .select(col("doc_id"), col("n_words"), col("mean_word_len"),
        col("frac_alpha_words"), col("hash_ratio"), col("ellipsis_ratio"),
        col("stop_hits"), col("words_ok"), col("mean_len_ok"), col("alpha_ok"),
        col("symbol_ok"), col("stopword_ok"), col("pass"))
  }

  /** Quality-signal ENSEMBLE gate with per-language calibrated cuts —
    * the composed keep/drop production corpus gates actually run (the
    * CCNet shape: Wenzek et al. 2020 bucket CommonCrawl by LM
    * perplexity PER LANGUAGE, because an absolute perplexity cut keeps
    * rich-resource languages and deletes the rest; modern open recipes
    * — RedPajama-v2, Dolma, FineWeb — layer rule gates and learned
    * scores the same way). Three signals vote, each already proven
    * alone:
    *
    *   - [[gopherQualityGate]]'s LANGUAGE-AGNOSTIC rules (word count,
    *     mean word length, alpha-word fraction, symbol ratios) as one
    *     `rule_pass`. The stopword-PRESENCE rule is deliberately
    *     excluded: its list is English (Rae et al. filter an
    *     English-only corpus), and on a multilingual corpus it is
    *     precisely the absolute-cut mistake per-language calibration
    *     exists to avoid — it would veto every non-English document
    *     (and on this corpus does exactly that);
    *   - [[bigramLmScore]]'s `lm_score` (q135) — kept iff >= the
    *     language's `lmQ` quantile among scored corpus docs;
    *   - [[Sampling.lrQualityScores]]' `lr_quality` (q149, trained
    *     target-vs-corpus) — kept iff >= the language's `lrQ`
    *     quantile.
    *
    * keep = rule pass AND both learned scores clear their per-language
    * cuts. Docs the learned signals cannot score (< 2 tokens) are
    * dropped by the inner joins — unscorable docs are junk under every
    * production gate.
    *
    * Scale shape: each signal keeps its own proven posture (narrow
    * projection / hash-keyed vocab aggregates / bounded model state);
    * the signal frames join on doc_id (corpus-cardinality, uniform
    * key); the joined frame is materialized ONCE behind a checkpoint
    * barrier because two subtrees consume it (the |langs|-row cut
    * aggregate and the final decision join — the q113 pattern); cuts
    * come back as a broadcast. Exact `percentile` per language is safe
    * HERE, unlike ungrouped q38: each language's scores funnel to its
    * own reducer, and the gate is language-parallel. Cuts and scores
    * are rounded to 6 dp so the decision is engine-portable.
    *
    * Returns per scored corpus doc: (doc_id, lang, rule_pass,
    * lm_score, lm_cut, lr_quality, lr_cut, keep).
    */
  def ensembleQualityGate(corpus: DataFrame, target: DataFrame,
                          lmQ: Double = 0.25, lrQ: Double = 0.25,
                          nBuckets: Int = 64, lrate: Double = 0.5,
                          rounds: Int = 3): DataFrame = {
    val gopher = gopherQualityGate(corpus)
      .select(col("doc_id"),
        (col("words_ok") && col("mean_len_ok") && col("alpha_ok") &&
          col("symbol_ok")).as("rule_pass"))
    // the LM trains on the full table (q135's convention — target digs
    // the model's counts too, exactly like its oracle), scores are used
    // for corpus docs only
    val lm = bigramLmScore(target.unionByName(corpus))
      .select(col("doc_id"), col("lm_score"))
    val lr = Sampling.lrQualityScores(target, corpus, "doc_id", "text",
      nBuckets, lrate, rounds)
    val base = corpus.select(col("doc_id"), col("lang"))
      .join(gopher, Seq("doc_id"))
      .join(lm, Seq("doc_id"))
      .join(lr, Seq("doc_id"))
      .localCheckpoint()
    val cuts = base.groupBy(col("lang"))
      .agg(round(expr(s"percentile(lm_score, $lmQ)"), 6).as("lm_cut"),
        round(expr(s"percentile(lr_quality, $lrQ)"), 6).as("lr_cut"))
    base.join(broadcast(cuts), Seq("lang"))
      .withColumn("keep",
        col("rule_pass") && col("lm_score") >= col("lm_cut") &&
          col("lr_quality") >= col("lr_cut"))
      .select(col("doc_id"), col("lang"), col("rule_pass"),
        col("lm_score"), col("lm_cut"), col("lr_quality"), col("lr_cut"),
        col("keep"))
  }

  /** Language-ID heuristic rollup (rows-only check: heuristic has no
    * SQL-oracle form by design — it is our own classifier).
    */
  def langIdDist(documents: DataFrame): DataFrame =
    documents
      .select(Texts.langScores(col("text")).as("sc")) // own projection: fold once
      .select(Texts.langIdFromScores(col("sc")).as("lang_pred"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n"))

  /** Content fingerprints: exact-dup key (SHA-256). */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), Texts.fingerprintSha(col("text")).as("fp"))

  /** Cross-document repeated-segment (boilerplate) scrub — the
    * FineWeb/RefinedWeb-style curation step that removes nav bars,
    * cookie banners, and license footers: a doc is split into
    * fixed-size non-overlapping token segments, a segment whose content
    * hash occurs in >= `minDocs` DISTINCT documents is boilerplate, and
    * the doc is reassembled from its surviving segments in order.
    *
    * Scale shape: one tokenization pass, one hash aggregate on the
    * segment hash (map-side partials collapse repeats early), one
    * shuffle join back on the same hash, one ordered per-doc
    * reassembly aggregate. Nothing is ever all-pairs, and the shuffle
    * key (segment hash) is uniform by construction — no skew.
    *
    * Returns per doc: segment counts, boilerplate counts, and the md5
    * of the scrubbed text (order-preserving reassembly via
    * array_sort over (seg_id, segment) structs — collect_list drops
    * the boilerplate rows nulled by the `when`).
    */
  def repeatedSegmentScrub(documents: DataFrame, segTokens: Int = 16,
                           minDocs: Long = 2L): DataFrame = {
    val toks = documents
      .select(col("doc_id"), Texts.tokens(col("text")).as("t"))
      .withColumn("n", size(col("t")))
      .filter(col("n") > 0)
    val segs = toks
      .select(col("doc_id"), col("t"), col("n"),
        explode(sequence(lit(0L), floor((col("n") - 1) / segTokens).cast("long"))).as("seg_id"))
      .withColumn("segment",
        slice(col("t"), (col("seg_id") * segTokens + 1).cast("int"), lit(segTokens)))
      .select(col("doc_id"), col("seg_id"), col("segment"),
        md5(array_join(col("segment"), " ").cast("binary")).as("h"))
      // materialize ONCE: segs feeds both the frequency aggregate and
      // the join-back probe side, and the two subtrees differ (one has
      // a partial agg) so exchange reuse cannot dedup them — without
      // the barrier the text is tokenized and segmented twice
      .localCheckpoint()
    val freq = segs.groupBy(col("h")).agg(countDistinct(col("doc_id")).as("ndocs"))
    segs.join(freq, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("ndocs") >= minDocs, 1L).otherwise(0L)).as("n_boilerplate"),
        md5(array_join(flatten(transform(
            array_sort(collect_list(when(col("ndocs") < minDocs,
              struct(col("seg_id"), col("segment"))))),
            s => s.getField("segment"))), " ").cast("binary")).as("scrubbed_hash"))
  }

  /** Bigram language-model quality score — the CCNet/KenLM-style
    * perplexity filter, self-trained on the corpus itself: per document,
    * the mean log-probability of its bigrams under an add-one-smoothed
    * bigram model, P(b|a) = (C(a,b) + 1) / (C(a) + V), where C(·) are
    * corpus frequencies and V the vocabulary size. Low scores flag
    * gibberish / rare-construction docs the heuristic features
    * ([[docQuality]]) miss; the published pipelines threshold on exactly
    * this statistic (there scored by an external LM — here the corpus IS
    * the training set, which keeps the op closed over its inputs and
    * oracle-checkable).
    *
    * Scale shape: the corpus is scanned and tokenized ONCE (materialized
    * behind a checkpoint barrier — it feeds three distinct subtrees);
    * bigrams come from ONE narrow zip_with + explode per doc (no
    * self-join on token position); the model is two hash aggregates —
    * bigram counts and unigram counts — both map-side combinable and
    * bounded by vocabulary size, not corpus size; V is a 1-row
    * aggregate. Every shuffle and join is keyed on xxhash64 of the
    * token/bigram (8-byte keys), never the token STRINGS — shuffle
    * width is constant in vocabulary growth, which flattened the
    * corpus-scaling slope (the strings-through-the-shuffle shape grew
    * 2.9x at 10x corpus). Hash-keying is exact up to xxhash64
    * collisions (~1e-19 per pair); the DuckDB oracle re-derives the
    * model on strings, so a collision would surface as a hash-mismatch.
    * Scoring attaches log-probs to the count table first (vocab-sized
    * join), then joins bigram INSTANCES once on the bigram key — one
    * instance-sized shuffle, key-uniform by construction (hashes).
    * Nothing is all-pairs; no windows.
    *
    * Returns (doc_id, n_bigrams, lm_score) for docs with >= 2 tokens;
    * lm_score rounded to 6 dp for cross-engine reproducibility.
    */
  def bigramLmScore(documents: DataFrame): DataFrame = {
    // materialize the tokenized corpus ONCE (q113 / repeatedSegmentScrub
    // pattern): it feeds the unigram counts, the bigram model build, and
    // the bigram probe side — three subtrees that all differ above the
    // scan (different aggregates/filters), so exchange reuse cannot dedup
    // them and without the barrier the text is scanned + tokenized 3x
    val toksAll = lmTokenized(documents).localCheckpoint()
    val biK = lmBigramKeys(toksAll)
    val uniCounts = lmUnigramCounts(toksAll)
    val vocab = uniCounts.agg(count(lit(1)).cast("double").as("v"))
    // kab functionally determines ka (the bigram's first token), so
    // grouping on both costs nothing and keeps ka for the unigram join
    val model = biK.groupBy(col("kab"), col("ka")).agg(count(lit(1)).as("cab"))
      .join(uniCounts, Seq("ka"))
      .crossJoin(broadcast(vocab))
      .select(col("kab"),
        log((col("cab") + 1).cast("double") / (col("cw") + col("v"))).as("lp"))
    biK.join(model, Seq("kab"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 6).as("lm_score"))
  }

  /** The LM's tokenized-corpus frame (doc_id, ts) — shared by the
    * inline [[bigramLmScore]] and the persisted-model build/serve
    * paths ([[Models]]), so all three derive from the identical
    * expression tree.
    */
  private[operators] def lmTokenized(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), Texts.tokens(col("text")).as("ts"))

  /** Per-document bigram INSTANCES as hash keys: (doc_id, ka, kab)
    * with ka = xxhash64(first token), kab = xxhash64(bigram) — the
    * keys are computed narrowly at the explode, so no downstream
    * operator ever carries a token string (the shuffle-width argument
    * in [[bigramLmScore]]'s doc).
    */
  private[operators] def lmBigramKeys(tokenized: DataFrame): DataFrame =
    tokenized.filter(size(col("ts")) > 1)
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("wa"), b.as("wb")))).as("bg"))
      .select(col("doc_id"),
        xxhash64(col("bg.wa")).as("ka"),
        xxhash64(col("bg.wa"), col("bg.wb")).as("kab"))

  /** Hash-keyed unigram counts (ka, cw) — the LM's conditioning-count
    * table, vocabulary-sized, map-side combinable.
    */
  private[operators] def lmUnigramCounts(tokenized: DataFrame): DataFrame =
    tokenized
      .select(explode(col("ts")).as("w"))
      .select(xxhash64(col("w")).as("ka"))
      .groupBy(col("ka")).agg(count(lit(1)).as("cw"))

  /** One selected merge of [[bpeTrainMerges]]. */
  final case class BpeMerge(rank: Int, lhs: String, rhs: String,
                            merged: String, cnt: Long)

  /** BPE tokenizer TRAINING (the published recipe: Sennrich et al.
    * 2016, "Neural Machine Translation of Rare Words with Subword
    * Units" — iteratively merge the corpus-wide most frequent adjacent
    * symbol pair; here without the end-of-word marker, à la the
    * SentencePiece/GPT-2 within-word variant). Returns the learned
    * merge table (rank, lhs, rhs, merged, cnt).
    *
    * The distributed shape: ONE corpus pass builds the (distinct word,
    * count) table — BPE's entire training state, vocabulary-sized, cut
    * from the corpus lineage by a checkpoint. Every merge round then
    * runs on that small table: adjacent-pair explode → weighted count
    * aggregate → a ONE-ROW argmax collect (the bounded-collect
    * contract: nMerges driver rows total, like IVF centroids and PQ
    * codebooks) → a narrow per-word rewrite of the symbol strings.
    *
    * The rewrite is a left fold over the word's symbol ARRAY (a plain
    * string `replace` of " lhs rhs" is boundary-UNSAFE on the right:
    * it also fires when the next symbol merely STARTS with rhs — e.g.
    * after round 1 merges (b,c), " a bc" must not match a round-2
    * (a,b) merge, but the substring " a b" does): the accumulator is
    * the rewritten prefix, and each next symbol either fuses into the
    * accumulator's LAST symbol (exactly when that symbol IS lhs and
    * the next IS rhs — whole-symbol equality, never substring) or
    * appends. Left-to-right non-overlapping fusion IS the BPE greedy
    * merge order, and the same fold is replayed by the DuckDB oracle's
    * `list_reduce` (it re-derives every round's counts, argmax, and
    * rewrite).
    *
    * Determinism: ties broken by (count DESC, lhs ASC, rhs ASC).
    * Rounds whose best pair occurs once stop early (nothing left to
    * compress).
    */
  def bpeTrainMerges(documents: DataFrame, nMerges: Int): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    bpeTrain(documents, nMerges)._1.toDF("rank", "lhs", "rhs", "merged", "cnt")
  }

  /** The subword VOCABULARY after `nMerges` BPE rounds — training's
    * encode-side twin: the final rewritten word table IS the corpus
    * encoded under the learned merges, so exploding its symbols
    * (weighted by word frequency) gives the subword token distribution
    * a tokenizer built from this corpus would produce. Top `topK` by
    * (count DESC, subword ASC).
    */
  def bpeSubwordVocab(documents: DataFrame, nMerges: Int, topK: Int): DataFrame =
    bpeTrain(documents, nMerges)._2
      .select(explode(split(trim(col("s")), " ")).as("subword"), col("n"))
      .groupBy(col("subword")).agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("subword"))
      .limit(topK)

  /** BPE tokenizer APPLICATION — encode a corpus under a learned merge
    * list (the production op: train once with [[bpeTrainMerges]], store
    * the nMerges-row table, then encode every shard with it). Returns
    * per doc: the subword token count and the md5 of the full
    * space-joined token stream (strong order-sensitive content check).
    * Docs with no tokens produce no row.
    *
    * Scale shape: the merge list is a BOUNDED driver-side constant
    * (nMerges rows — the IVF-centroid convention), so encoding is ONE
    * narrow per-row projection: tokenize → per word, split to code
    * points and apply each merge in rank order as the same greedy left
    * fold training uses ([[bpeTrain]]'s rewrite, array form) → flatten.
    * No explode, no join, NO shuffle at all — the op composes into any
    * pipeline scan or a streaming micro-batch for free, and at 100 TB
    * costs exactly one pass over the text.
    *
    * The fold runs as the native codegen'd kernel
    * [[graft.plans.BpeEncodeTokens]] (the HOF form below re-allocated
    * the accumulator array per element — q146 was the slowest bench
    * query by 3.4× at sf0.1); [[bpeEncodeHof]] keeps the declarative
    * recurrence as the parity reference, replayed in TextsSpec.
    */
  def bpeEncode(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    documents
      .select(col("doc_id"), Texts.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"),
        graft.plans.BpeEncodeTokens.bpeEncodeTokens(col("ws"), merges).as("enc"))
      .select(col("doc_id"),
        size(col("enc")).cast("long").as("n_bpe_tokens"),
        md5(array_join(col("enc"), " ")).as("bpe_md5"))

  /** The full subword vocabulary of the corpus encoded under `merges`,
    * as a deterministic id-ordered list (lexicographic — the same
    * total order every engine reproduces with `ORDER BY subword`):
    * index in the returned Seq IS the token id. Driver-side by the
    * bounded-artifact contract (a tokenizer vocabulary is vocab-sized
    * — chars + one entry per merge at most — like the merge table,
    * IVF centroids, and PQ codebooks).
    */
  def bpeIdVocab(documents: DataFrame, merges: Seq[(String, String)]): Seq[String] =
    documents
      .select(Texts.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(explode(graft.plans.BpeEncodeTokens
        .bpeEncodeTokens(col("ws"), merges)).as("subword"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq

  /** [[bpeEncode]] to token IDS — the artifact-grade form: per doc the
    * full `array<int>` id stream under (`merges`, `vocab`), ready for
    * [[Packing.materializeTokenSequences]]. The vocab map rides into
    * codegen as a literal (bounded artifact); the op stays the same
    * no-shuffle narrow projection as [[bpeEncode]]. Docs with no
    * tokens produce no row.
    */
  def bpeEncodeIds(documents: DataFrame, merges: Seq[(String, String)],
                   vocab: Map[String, Int]): DataFrame =
    documents
      .select(col("doc_id"), Texts.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"),
        transform(
          graft.plans.BpeEncodeTokens.bpeEncodeTokens(col("ws"), merges),
          s => element_at(typedLit(vocab), s)).as("toks"))

  /** The declarative higher-order-function form of [[bpeEncode]] —
    * same recurrence, kept as the executable parity reference for the
    * native kernel (TextsSpec runs both over real corpus data and
    * asserts identical output). Not the production path: `aggregate`
    * rebuilds the accumulator array per element (O(merges × len²)
    * interpreted), which is why the kernel exists.
    */
  private[graft] def bpeEncodeHof(
      documents: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    // greedy non-overlapping left-to-right pair fusion over a symbol
    // array: whole-symbol compares only (see bpeTrain's fold; this is
    // the array-accumulator form of the same recurrence)
    def fuse(sym: Column, lhs: String, rhs: String): Column =
      aggregate(sym, array().cast("array<string>"),
        (acc, x) =>
          when(size(acc) > 0 && element_at(acc, -1) === lit(lhs) &&
              x === lit(rhs),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(lhs + rhs))))
            .otherwise(concat(acc, array(x))))
    def encodeWord(w: Column): Column =
      merges.foldLeft(filter(split(w, ""), c => c =!= "")) {
        case (sym, (lhs, rhs)) => fuse(sym, lhs, rhs)
      }
    documents
      .select(col("doc_id"), Texts.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"),
        flatten(transform(col("ws"), encodeWord(_))).as("enc"))
      .select(col("doc_id"),
        size(col("enc")).cast("long").as("n_bpe_tokens"),
        md5(array_join(col("enc"), " ")).as("bpe_md5"))
  }

  /** Retrieval-side CHUNKING — split each document into overlapping
    * fixed-size token windows (`window` tokens every `stride`, the
    * standard RAG / dense-retrieval passage shape: stride < window
    * gives the overlap that keeps answers from straddling a chunk
    * boundary). Starts are the multiples of `stride` strictly below
    * the doc's token count, so the final chunk may be short but every
    * token is covered and no start falls past the text.
    *
    * Per chunk: its index within the doc, its token count, and the md5
    * of its space-joined tokens — the identity a downstream embedding /
    * indexing stage keys on. Scale shape: tokenize is a narrow
    * projection, the fan-out is a bounded per-row explode
    * (`ceil(n_tokens / stride)` chunks per doc), and there is NO
    * shuffle at all — chunking composes into the scan of any pipeline,
    * batch or streaming, and feeds the ANN family (the chunk vectors
    * are what `Similarity` indexes at serving time).
    */
  def slidingChunks(documents: DataFrame, window: Int, stride: Int): DataFrame = {
    require(window >= stride && stride > 0,
      s"need window >= stride > 0, got window=$window stride=$stride")
    documents
      .select(col("doc_id"), Texts.tokens(col("text")).as("ws"))
      .withColumn("nt", size(col("ws")))
      .filter(col("nt") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr(s"cast((nt - 1) div $stride as bigint)"))))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("ws"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(window)).as("cw"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("cw")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("cw"), " ")).as("chunk_md5"))
  }

  /** Shared training loop: returns (selected merges, final rewritten
    * word table).
    */
  private def bpeTrain(documents: DataFrame, nMerges: Int): (Seq[BpeMerge], DataFrame) = {
    var cur = documents
      .select(explode(Texts.tokens(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .select(concat(lit(" "),
        array_join(filter(split(col("w"), ""), c => c =!= ""), " ")).as("s"),
        col("n"))
      .localCheckpoint() // vocab-sized state; corpus is never re-read
    val merges = Seq.newBuilder[BpeMerge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val best = cur
        .select(col("n"), split(trim(col("s")), " ").as("sym"))
        .filter(size(col("sym")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(sym) - 2), i -> struct(sym[i] AS lhs, sym[i+1] AS rhs))"))
          .as("pr"))
        .groupBy(col("pr.lhs").as("lhs"), col("pr.rhs").as("rhs"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("lhs"), col("rhs"))
        .limit(1).collect() // bounded: ONE row per round by construction
      if (best.isEmpty || best(0).getLong(2) < 2) done = true
      else {
        val (lhs, rhs, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += BpeMerge(r, lhs, rhs, lhs + rhs, cnt)
        // greedy left-to-right pair fusion as a fold over the symbol
        // array: the accumulator is the rewritten prefix (space-joined);
        // its last symbol is lhs iff acc == lhs or acc ends with " lhs"
        // (symbols contain no spaces), and fusing appends rhs with NO
        // separator. Whole-symbol tests only — " a bc" can never be
        // corrupted by an (a, b) merge the way substring replace would.
        cur = cur.select(
          concat(lit(" "), aggregate(
            split(trim(col("s")), " "),
            lit(""),
            (acc, x) =>
              when(acc === lit(""), x)
                .when((acc === lit(lhs) || acc.endsWith(lit(s" $lhs"))) &&
                    x === lit(rhs),
                  concat(acc, lit(rhs)))
                .otherwise(concat(acc, lit(" "), x)))).as("s"),
          col("n"))
        r += 1
      }
    }
    (merges.result(), cur)
  }
}
