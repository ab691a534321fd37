package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** PERSISTED quality models — the serving half of the learned-signal
  * family ([ext], SURVEY.md §2.8). The inline operators
  * ([[TextAnalysis.bigramLmScore]] q135, [[Sampling.lrQualityScores]]
  * q149, [[Sampling.dsirSelect]] q145, and their q154 ensemble) retrain
  * their model inside every invocation — the exploratory shape. A
  * production gate trains ONCE and scores every new shard against the
  * frozen artifact (the q155/q122 persistent-index recipe, applied to
  * the model family):
  *
  *   - bigram LM → `modelDir/unigrams` (ka, cw), `modelDir/bigrams`
  *     (kab, cab), `modelDir/meta` (vocab size) — all hash-keyed
  *     8-byte keys, vocabulary-sized, never carrying token strings;
  *   - LR quality classifier → `modelDir/weights` (b, w) — nBuckets+1
  *     tiny rows (b = -1 is the bias);
  *   - DSIR importance ratios → `modelDir/ratios` (b, lr) — nBuckets
  *     tiny rows.
  *
  * All commits go through `EventStreams.mergeBatchIntoTable` (atomic
  * manifest publish, idempotent batchId). Scoring reads ONLY the model
  * tables + the corpus being scored — no training aggregate anywhere in
  * the plan (PlanSpec-guarded), which at 100 TB turns every scoring
  * pass from "re-derive the model over the full corpus, then score"
  * into one narrow corpus scan against bounded state. Scores are
  * BIT-IDENTICAL to the inline-trained scores for the same corpus
  * (counts and weights round-trip parquet exactly; q161 hash-checks
  * this against the inline oracles), and add-one smoothing generalizes
  * to unseen tokens: a bigram/unigram absent from the model scores with
  * count 0 — exactly the backoff the smoothed formula defines — so new
  * shards score without retraining ([[graft.streaming.CurationStream
  * .scoreShard]] wires this into the incremental pipeline).
  */
object Models {

  // --------------------------------------------------------------------
  // Bigram LM (the q135 CCNet/KenLM-style perplexity filter)
  // --------------------------------------------------------------------

  /** Train the add-one-smoothed bigram LM on `documents` and commit its
    * three model tables under `modelDir`. One corpus pass (tokenized
    * frame checkpointed — it feeds the unigram and bigram aggregates);
    * both count tables are map-side-combinable hash aggregates bounded
    * by vocabulary, not corpus, size.
    */
  def buildLmModel(documents: DataFrame, modelDir: String,
                   batchId: Long = 0L, nBuckets: Int = 8): Unit = {
    val spark = documents.sparkSession
    import spark.implicits._
    // ENFORCED train-once contract (not just documented): a re-run with
    // a NEW batchId over a different corpus would silently upsert fresh
    // counts over the stale rows (merge never deletes) while replacing
    // meta/vocab — served scores would then match no corpus. A replay
    // of the SAME batchId is safe (the merges below no-op on it);
    // anything else requires a fresh modelDir.
    EventStreams.latestCommittedBatchId(spark, s"$modelDir/meta").foreach { prev =>
      require(prev == batchId,
        s"a committed LM model already exists at $modelDir (batch $prev); " +
          s"refusing to retrain as batch $batchId - counts merge additively " +
          "and never delete, so retraining over a different corpus would " +
          "serve scores matching no corpus. Use a fresh modelDir.")
    }
    val toksAll = TextAnalysis.lmTokenized(documents).localCheckpoint()
    // vocab-sized; feeds the commit AND the vocab-size count
    val uni = TextAnalysis.lmUnigramCounts(toksAll).localCheckpoint()
    val vocab = uni.count()
    EventStreams.mergeBatchIntoTable(uni, s"$modelDir/unigrams",
      Seq("ka"), "ka", nBuckets, batchId)
    EventStreams.mergeBatchIntoTable(
      TextAnalysis.lmBigramKeys(toksAll)
        .groupBy(col("kab")).agg(count(lit(1)).as("cab")),
      s"$modelDir/bigrams", Seq("kab"), "kab", nBuckets, batchId)
    EventStreams.mergeBatchIntoTable(
      Seq((0, vocab)).toDF("k", "vocab"), s"$modelDir/meta",
      Seq("k"), "vocab", nBuckets = 1, batchId = batchId)
  }

  /** Score documents against the COMMITTED LM — no training aggregate
    * in the plan: the corpus scan explodes to hash-keyed bigram
    * instances (8-byte keys, never strings), left-joins the two count
    * tables (unseen → count 0, the add-one backoff), and averages per
    * doc. Returns (doc_id, n_bigrams, lm_score) for docs with >= 2
    * tokens — bit-identical to [[TextAnalysis.bigramLmScore]] on the
    * training corpus.
    */
  def scoreWithLmModel(spark: SparkSession, modelDir: String,
                       documents: DataFrame): DataFrame = {
    val uni = EventStreams.readUpsertTable(spark, s"$modelDir/unigrams")
    val bi = EventStreams.readUpsertTable(spark, s"$modelDir/bigrams")
    // one-row bounded read: the committed vocabulary size. Fail with
    // the remediation, not an opaque empty-iterator error, when the
    // model was never committed (e.g. a crashed build's partial state)
    val metaRows = EventStreams.readUpsertTable(spark, s"$modelDir/meta").collect()
    require(metaRows.nonEmpty,
      s"no committed LM model at $modelDir (meta table empty) - run buildLmModel first")
    val v = metaRows.head.getAs[Long]("vocab").toDouble
    TextAnalysis.lmBigramKeys(TextAnalysis.lmTokenized(documents))
      .join(bi, Seq("kab"), "left")
      .join(uni, Seq("ka"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(
          (coalesce(col("cab"), lit(0L)) + 1).cast("double")
            / (coalesce(col("cw"), lit(0L)) + lit(v)))), 6).as("lm_score"))
  }

  // --------------------------------------------------------------------
  // LR quality classifier (the q149 GPT-3-style learned filter)
  // --------------------------------------------------------------------

  /** Train the LR classifier (target-vs-raw, [[Sampling.lrFit]]'s
    * deterministic full-batch trajectory) and commit the weight vector
    * as an (b, w) table — nBuckets + 1 rows, b = -1 the bias.
    */
  def buildLrModel(target: DataFrame, raw: DataFrame, modelDir: String,
                   idCol: String, textCol: String, nBuckets: Int,
                   lrate: Double, rounds: Int, batchId: Long = 0L): Unit = {
    val spark = target.sparkSession
    import spark.implicits._
    val labeled =
      target.select(col(idCol), lit(1.0).as("y"), col(textCol).as("t"))
        .unionByName(raw.select(col(idCol), lit(0.0).as("y"), col(textCol).as("t")))
    val w = Sampling.lrFit(
      Sampling.lrFeatures(labeled, idCol, nBuckets, barrier = true),
      nBuckets, lrate, rounds)
    EventStreams.mergeBatchIntoTable(
      w.zipWithIndex.map { case (wj, j) => (j - 1, wj) }.toSeq.toDF("b", "w"),
      s"$modelDir/weights", Seq("b"), "b", nBuckets = 1, batchId = batchId)
  }

  /** Score documents against the COMMITTED weights: one bounded read
    * (nBuckets + 1 rows) pulls the vector driver-side, and the plan is
    * the feature aggregation + a narrow sigmoid projection — no
    * gradient rounds, no label column, no second corpus scan.
    */
  def scoreWithLrModel(spark: SparkSession, modelDir: String, docs: DataFrame,
                       idCol: String, textCol: String): DataFrame = {
    val rows = EventStreams.readUpsertTable(spark, s"$modelDir/weights")
      .collect() // bounded by contract: nBuckets + 1 rows
    require(rows.nonEmpty,
      s"no committed LR model at $modelDir (weights table empty) - run buildLrModel first")
    val w = new Array[Double](rows.length)
    rows.foreach(r => w(r.getInt(0) + 1) = r.getDouble(1))
    Sampling.lrScoreWith(docs, idCol, textCol, w)
  }

  // --------------------------------------------------------------------
  // DSIR importance ratios (the q145 importance-resampling selector)
  // --------------------------------------------------------------------

  /** Commit DSIR's entire model — the nBuckets-row per-bucket
    * importance log-ratio table ([[Sampling.dsirRatioTable]]).
    */
  def buildDsirModel(target: DataFrame, raw: DataFrame, modelDir: String,
                     idCol: String, textCol: String, nBuckets: Int,
                     batchId: Long = 0L): Unit =
    EventStreams.mergeBatchIntoTable(
      Sampling.dsirRatioTable(target, raw, idCol, textCol, nBuckets),
      s"$modelDir/ratios", Seq("b"), "b", nBuckets = 1, batchId = batchId)

  /** Score documents against the COMMITTED ratio table: one narrow
    * token-bucket explode + a broadcast join of the nBuckets-row model
    * + one per-doc average ([[Sampling.dsirScoreAgainst]], the serving
    * half of the inline q145 plan).
    */
  def scoreWithDsirModel(spark: SparkSession, modelDir: String, docs: DataFrame,
                         idCol: String, textCol: String, nBuckets: Int): DataFrame =
    Sampling.dsirScoreAgainst(docs, idCol, textCol, nBuckets,
      EventStreams.readUpsertTable(spark, s"$modelDir/ratios"))

  // --------------------------------------------------------------------
  // The BPE tokenizer artifact (merges + id vocab as committed tables)
  // --------------------------------------------------------------------

  /** Train the BPE tokenizer ([[TextAnalysis.bpeTrainMerges]], fixed
    * greedy recipe) and commit THE artifact every downstream consumer
    * shares: `tokDir/merges` (rank, lhs, rhs) and `tokDir/vocab`
    * (tid, subword — lexicographic ids, the q160 convention). A frozen
    * tokenizer is what makes incremental token materialization
    * ([[Packing.materializeShardIncremental]]) batch-equivalent: every
    * shard MUST encode under the same merges/ids, so they live in a
    * committed table, not a per-run retrain.
    */
  def buildTokenizer(documents: DataFrame, tokDir: String, nMerges: Int,
                     batchId: Long = 0L): Unit = {
    val spark = documents.sparkSession
    import spark.implicits._
    val mergesDf = TextAnalysis.bpeTrainMerges(documents, nMerges)
      .select(col("rank"), col("lhs"), col("rhs"))
    EventStreams.mergeBatchIntoTable(mergesDf, s"$tokDir/merges",
      Seq("rank"), "rank", nBuckets = 1, batchId = batchId)
    val merges = EventStreams.readUpsertTable(spark, s"$tokDir/merges")
      .collect().sortBy(_.getInt(0)) // bounded by contract: nMerges rows
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = TextAnalysis.bpeIdVocab(documents, merges)
    EventStreams.mergeBatchIntoTable(
      vocab.zipWithIndex.map { case (s, i) => (i, s) }.toDF("tid", "subword"),
      s"$tokDir/vocab", Seq("tid"), "tid", nBuckets = 1, batchId = batchId)
  }

  /** Read the committed tokenizer (bounded: nMerges + vocab rows —
    * the IVF-centroid driver-side-artifact contract). Returns (merges
    * in rank order, subword → id map, separator id = vocab size, the
    * q160 EOS convention).
    */
  def readTokenizer(spark: SparkSession,
                    tokDir: String): (Seq[(String, String)], Map[String, Int], Int) = {
    val merges = EventStreams.readUpsertTable(spark, s"$tokDir/merges")
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = EventStreams.readUpsertTable(spark, s"$tokDir/vocab")
      .collect().map(r => r.getString(1) -> r.getInt(0)).toMap
    // an empty vocab would make every encoded id null downstream —
    // fail here with the cause (tokenizer never built / empty corpus)
    require(vocab.nonEmpty,
      s"no committed tokenizer at $tokDir (vocab table empty) - run buildTokenizer first")
    (merges, vocab, vocab.size)
  }

  // --------------------------------------------------------------------
  // The FULL calibrated gate, served (the q154 ensemble from frozen state)
  // --------------------------------------------------------------------

  /** The q154 ensemble's three signals for `docs`, every learned signal
    * scored against the COMMITTED models under `modelRoot` (`lm/` and
    * `lr/`, [[buildLmModel]]/[[buildLrModel]] layouts): the
    * language-agnostic Gopher rule pass (a narrow projection), the LM
    * score, and the LR score, inner-joined on doc_id (docs a learned
    * signal cannot score are unscorable junk, the q154 argument).
    * Three passes over the docs' text — one per signal family, each
    * with its own aggregate shape — exactly the inline gate's pass
    * structure MINUS all training.
    */
  private def gateSignals(spark: SparkSession, modelRoot: String,
                          docs: DataFrame): DataFrame = {
    val gopher = TextAnalysis.gopherQualityGate(docs)
      .select(col("doc_id"),
        (col("words_ok") && col("mean_len_ok") && col("alpha_ok") &&
          col("symbol_ok")).as("rule_pass"))
    val lm = scoreWithLmModel(spark, s"$modelRoot/lm", docs)
      .select(col("doc_id"), col("lm_score"))
    val lr = scoreWithLrModel(spark, s"$modelRoot/lr", docs, "doc_id", "text")
    docs.select(col("doc_id"), col("lang"))
      .join(gopher, Seq("doc_id"))
      .join(lm, Seq("doc_id"))
      .join(lr, Seq("doc_id"))
  }

  /** CALIBRATE the gate and commit the per-language cut table: the
    * q154 quantile cuts (lmQ/lrQ over the calibration corpus's scored
    * signals, per language, rounded to 6 dp) frozen as a |langs|-row
    * committed table. Exact `percentile` is safe here for the q154
    * reason (each language funnels to its own reducer) — and after
    * this commit, SERVING never pays it again.
    */
  def buildGateCuts(calibrationCorpus: DataFrame, modelRoot: String,
                    lmQ: Double = 0.25, lrQ: Double = 0.25,
                    batchId: Long = 0L): Unit = {
    val spark = calibrationCorpus.sparkSession
    val cuts = gateSignals(spark, modelRoot, calibrationCorpus)
      .groupBy(col("lang"))
      .agg(round(expr(s"percentile(lm_score, $lmQ)"), 6).as("lm_cut"),
        round(expr(s"percentile(lr_quality, $lrQ)"), 6).as("lr_cut"))
    // versioned by batchId, NOT by the key itself: a RECALIBRATION
    // ([[recalibrateGate]]) re-commits the same lang keys, and
    // key-as-version would tie nondeterministically in the merge's
    // max_by (the packing-state lesson) — the newest calibration must
    // win deterministically
    EventStreams.mergeBatchIntoTable(cuts.withColumn("__v", lit(batchId)),
      s"$modelRoot/cuts", Seq("lang"), "__v", nBuckets = 1, batchId = batchId)
  }

  /** RECALIBRATE the served gate — the "drifted → act" maintenance
    * transaction the monitors (q179/q183) point at: recompute the
    * per-language cuts AND the drift-reference histograms against a
    * NEW calibration corpus, committed as one batchId generation over
    * the same frozen LM/LR models (recalibration re-draws the
    * DECISION BOUNDARIES and the reference distribution; it never
    * retrains the models — that contract stays enforced by
    * [[buildLmModel]]). Serving picks up the new cuts on its next
    * read (the manifest flip); drift monitoring compares against the
    * new reference, so a post-recalibration self-check is exactly
    * zero again. Languages the new calibration does NOT cover are
    * RETIRED (committed deletes via EventStreams.deleteFromTable) —
    * an upsert alone would keep serving their STALE cuts silently,
    * and a gate must refuse what it cannot calibrate (the serving
    * inner-join convention: uncovered langs drop). Replays no-op per
    * table; consumes batchId AND batchId + 1 (the new generations,
    * then the retirements); as with every multi-commit operation (the
    * q177 sentence), a crashed recalibration must be replayed to
    * completion before trusting the gate.
    */
  def recalibrateGate(calibration: DataFrame, modelRoot: String,
                      batchId: Long, lmQ: Double = 0.25,
                      lrQ: Double = 0.25, nHistBuckets: Int = 8): Unit = {
    val spark = calibration.sparkSession
    buildGateCuts(calibration, modelRoot, lmQ, lrQ, batchId)
    buildScoreHistograms(calibration, modelRoot, nHistBuckets, batchId)
    val langs = calibration.select(col("lang")).distinct()
    EventStreams.deleteFromTable(spark, s"$modelRoot/cuts",
      EventStreams.readUpsertTable(spark, s"$modelRoot/cuts")
        .join(langs, Seq("lang"), "left_anti").select(col("lang")),
      Seq("lang"), nBuckets = 1, batchId = batchId + 1)
    EventStreams.deleteFromTable(spark, s"$modelRoot/hist",
      EventStreams.readUpsertTable(spark, s"$modelRoot/hist")
        .join(langs, Seq("lang"), "left_anti")
        .select(col("lang"), col("signal"), col("b")),
      Seq("lang", "signal", "b"), nBuckets = 1, batchId = batchId + 1)
  }

  // --------------------------------------------------------------------
  // Calibration drift monitor (PSI over fixed score buckets)
  // --------------------------------------------------------------------

  /** Fixed-grid histogram bucket for a learned score: `nB` equal-width
    * buckets over [lo, hi), clamped at both ends. The grid is FIXED
    * (not quantile-derived), so reference and arriving histograms are
    * comparable without recomputing any percentile — the one-aggregate-
    * each-side property that makes the monitor one narrow pass.
    */
  private def histBucket(signal: org.apache.spark.sql.Column, lo: Double,
                         hi: Double, nB: Int): org.apache.spark.sql.Column =
    least(greatest(floor((signal - lit(lo)) / lit((hi - lo) / nB)), lit(0.0)),
      lit((nB - 1).toDouble)).cast("long")

  /** The two learned signals in histogram-long form: one row per doc
    * per signal, bucketed on the fixed grids (LM avg-log-prob on
    * [-10, 0), LR probability on [0, 1)).
    */
  private def signalBuckets(spark: SparkSession, modelRoot: String,
                            docs: DataFrame, nB: Int): DataFrame = {
    val b = gateSignals(spark, modelRoot, docs)
      .select(col("lang"),
        histBucket(col("lm_score"), -10.0, 0.0, nB).as("lmb"),
        histBucket(col("lr_quality"), 0.0, 1.0, nB).as("lrb"))
    // ONE pass (optimization r17): the select+unionByName evaluated the
    // whole scoring chain TWICE (once per signal) — q179 doubled when
    // the LR features went narrow (no aggregate exchange left for
    // ReuseExchange to dedup). One explode of the two per-signal
    // structs reads the scored frame once; same rows.
    b.select(col("lang"), explode(array(
        struct(lit("lm").as("signal"), col("lmb").as("b")),
        struct(lit("lr").as("signal"), col("lrb").as("b")))).as("e"))
      .select(col("lang"), col("e.signal").as("signal"), col("e.b").as("b"))
  }

  /** Commit the CALIBRATION score histograms — the reference
    * distribution the drift monitor compares every arriving shard
    * against: per (lang, signal, bucket) counts over the fixed grids,
    * with the FULL grid materialized (zero buckets included), so
    * serving is a pure keyed join. |langs| × 2 × nB tiny rows.
    */
  def buildScoreHistograms(calibration: DataFrame, modelRoot: String,
                           nHistBuckets: Int = 8, batchId: Long = 0L): Unit = {
    val spark = calibration.sparkSession
    import spark.implicits._
    val counts = signalBuckets(spark, modelRoot, calibration, nHistBuckets)
      .groupBy(col("lang"), col("signal"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val grid = calibration.select(col("lang")).distinct()
      .crossJoin(Seq("lm", "lr").toDF("signal"))
      .crossJoin(spark.range(nHistBuckets).select(col("id").as("b")))
    EventStreams.mergeBatchIntoTable(
      grid.join(counts, Seq("lang", "signal", "b"), "left")
        .select(col("lang"), col("signal"), col("b"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .withColumn("__v", lit(batchId)),
      s"$modelRoot/hist", Seq("lang", "signal", "b"), "__v",
      nBuckets = 1, batchId = batchId)
  }

  /** "Is the calibration stale?" — the drift signal the frozen-model
    * serving story (q161/q166) was missing: Population Stability Index
    * per (language, signal) between the COMMITTED calibration
    * histogram and an arriving shard, over the same fixed buckets.
    * PSI = Σ_b (p_b − q_b)·ln(p_b / q_b) with add-one (Laplace)
    * smoothing on both sides, so empty buckets are well-defined and
    * the figure is engine-portable; the conventional alert threshold
    * is 0.2 (drifted) with 0.1 as "watch". One narrow scoring pass
    * over the shard + a broadcast-sized join against |langs|×2×nB
    * committed rows — at 100 TB the monitor costs one shard scan,
    * which the gating pass is already paying. Langs absent from the
    * calibration cannot be compared and are dropped (the serving-gate
    * inner-join convention).
    */
  def scoreDrift(spark: SparkSession, modelRoot: String, shard: DataFrame,
                 nHistBuckets: Int = 8, threshold: Double = 0.2): DataFrame = {
    val ref = EventStreams.readUpsertTable(spark, s"$modelRoot/hist")
      .select(col("lang"), col("signal"), col("b"), col("cnt"))
    val newCounts = signalBuckets(spark, modelRoot, shard, nHistBuckets)
      .groupBy(col("lang"), col("signal"), col("b"))
      .agg(count(lit(1)).as("ncnt"))
    // the committed grid is complete, so a left join pins every bucket
    val joined = ref.join(newCounts, Seq("lang", "signal", "b"), "left")
      .withColumn("ncnt", coalesce(col("ncnt"), lit(0L)))
      .localCheckpoint() // two consumers: the totals and the PSI terms
    val tot = joined.groupBy(col("lang"), col("signal"))
      .agg(sum(col("cnt")).as("n_ref"), sum(col("ncnt")).as("n_new"))
    joined.join(tot, Seq("lang", "signal"))
      .withColumn("p", (col("cnt") + 1).cast("double")
        / (col("n_ref") + lit(nHistBuckets)))
      .withColumn("q", (col("ncnt") + 1).cast("double")
        / (col("n_new") + lit(nHistBuckets)))
      .groupBy(col("lang"), col("signal"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_new")).as("n_new"),
        round(sum((col("p") - col("q")) * log(col("p") / col("q"))), 6)
          .as("psi"))
      .withColumn("drifted", col("psi") >= threshold)
  }

  /** SERVE the calibrated ensemble gate entirely from frozen state:
    * signals score against the committed models, cuts come from the
    * committed |langs|-row table as a broadcast — NO percentile
    * aggregate, no training anywhere in the plan (PlanSpec-guarded).
    * Same output shape and, for the calibration corpus itself, the
    * same decisions as the inline self-calibrating
    * [[TextAnalysis.ensembleQualityGate]] (q161's bit-identity
    * argument applied to the whole gate: scores and cuts round-trip
    * parquet exactly). New shards gate against the FROZEN calibration
    * — the production posture: a shard's keep decision must not
    * depend on which shard it arrived in.
    */
  def serveEnsembleGate(spark: SparkSession, modelRoot: String,
                        docs: DataFrame): DataFrame = {
    val cuts = EventStreams.readUpsertTable(spark, s"$modelRoot/cuts")
    gateSignals(spark, modelRoot, docs)
      .join(broadcast(cuts), Seq("lang"))
      .withColumn("keep",
        col("rule_pass") && col("lm_score") >= col("lm_cut") &&
          col("lr_quality") >= col("lr_cut"))
      .select(col("doc_id"), col("lang"), col("rule_pass"),
        col("lm_score"), col("lm_cut"), col("lr_quality"), col("lr_cut"),
        col("keep"))
  }
}
