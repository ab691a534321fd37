package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Models, Sampling, TextAnalysis}
import graft.streaming.{CurationStream, EventStreams}

/** Persisted quality-model serving (q161): score-only serving must be
  * bit-identical to the inline-trained scores on the training corpus,
  * generalize to unseen tokens by the add-one backoff, and wire into
  * the incremental (streaming) pipeline.
  */
class ModelsSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  private val corpus = docsDf(Seq(
    (0L, "the cat sat on the mat", "en"),
    (1L, "the dog sat on the log", "en"),
    (2L, "a cat and a dog", "en"),
    (3L, "le chat dort sur le tapis", "fr"),
    (4L, "the cat sat on the mat again and again", "en"),
    (5L, "der hund schläft auf dem teppich", "de")))

  test("LM serving scores are bit-identical to the inline-trained scores") {
    val dir = Files.createTempDirectory("graft-lm-model").toString
    Models.buildLmModel(corpus, dir)
    val inline = TextAnalysis.bigramLmScore(corpus)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val served = Models.scoreWithLmModel(spark, dir, corpus)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(served.toSeq === inline.toSeq)
  }

  test("LM serving backs off on unseen tokens: count-0 add-one smoothing, not a drop") {
    val dir = Files.createTempDirectory("graft-lm-unseen").toString
    Models.buildLmModel(corpus, dir)
    // "zzz qqq": neither token nor the bigram exists in the model →
    // lp = ln((0+1) / (0+V)) with V the committed vocab size
    val v = EventStreams.readUpsertTable(spark, s"$dir/meta")
      .head().getAs[Long]("vocab").toDouble
    val got = Models.scoreWithLmModel(spark, dir,
        docsDf(Seq((99L, "zzz qqq", "en"))))
      .head()
    assert(got.getLong(1) === 1L) // one bigram
    val expected = BigDecimal(math.log(1.0 / v))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getDouble(2) === expected)
  }

  test("LM retrain under a new batchId fails fast (train-once is enforced)") {
    val dir = Files.createTempDirectory("graft-lm-retrain").toString
    Models.buildLmModel(corpus, dir)
    // counts merge additively and never delete: a batch-1 retrain over a
    // different corpus would serve scores matching no corpus — refuse it
    val ex = intercept[IllegalArgumentException] {
      Models.buildLmModel(docsDf(Seq((9L, "totally different corpus", "en"))),
        dir, batchId = 1L)
    }
    assert(ex.getMessage.contains("refusing to retrain"))
    // the committed model is untouched by the refused retrain
    val served = Models.scoreWithLmModel(spark, dir, corpus)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    val inline = TextAnalysis.bigramLmScore(corpus)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(served.toSeq === inline.toSeq)
  }

  test("LR serving scores are bit-identical to the inline-trained scores") {
    val dir = Files.createTempDirectory("graft-lr-model").toString
    val target = corpus.filter(col("doc_id") < 3)
    val raw = corpus.filter(col("doc_id") >= 3)
    Models.buildLrModel(target, raw, dir, "doc_id", "text",
      nBuckets = 16, lrate = 0.5, rounds = 3)
    val inline = Sampling.lrQualityScores(target, raw, "doc_id", "text", 16, 0.5, 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val served = Models.scoreWithLrModel(spark, dir, raw, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.toSeq === inline.toSeq)
  }

  test("DSIR serving scores are bit-identical to the inline ratios") {
    val dir = Files.createTempDirectory("graft-dsir-model").toString
    val target = corpus.filter(col("doc_id") < 3)
    val raw = corpus.filter(col("doc_id") >= 3)
    Models.buildDsirModel(target, raw, dir, "doc_id", "text", nBuckets = 16)
    val inline = Sampling.dsirSelect(target, raw, "doc_id", "text", 16, keep = 10)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val served = Models.scoreWithDsirModel(spark, dir, raw, "doc_id", "text", 16)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.toSeq === inline.toSeq)
  }

  test("model build is idempotent per batchId (replay no-ops, scores unchanged)") {
    val dir = Files.createTempDirectory("graft-lm-replay").toString
    Models.buildLmModel(corpus, dir)
    val first = Models.scoreWithLmModel(spark, dir, corpus)
      .orderBy("doc_id").collect().toSeq
    Models.buildLmModel(corpus, dir) // replayed batch 0: must no-op
    val second = Models.scoreWithLmModel(spark, dir, corpus)
      .orderBy("doc_id").collect().toSeq
    assert(second === first)
  }

  test("served calibrated gate equals the inline self-calibrating gate") {
    val root = Files.createTempDirectory("graft-gate-model").toString
    val target = corpus.filter(col("doc_id") < 3)
    val gated = corpus.filter(col("doc_id") >= 3)
    // the inline gate trains its LM on target ∪ corpus and its LR on
    // target-vs-corpus (q154's convention) — build the same artifacts
    Models.buildLmModel(target.unionByName(gated), s"$root/lm")
    Models.buildLrModel(target, gated, s"$root/lr", "doc_id", "text",
      nBuckets = 64, lrate = 0.5, rounds = 3)
    Models.buildGateCuts(gated, root)
    val served = Models.serveEnsembleGate(spark, root, gated)
      .orderBy("doc_id").collect().toSeq
    val inline = TextAnalysis.ensembleQualityGate(gated, target)
      .orderBy("doc_id").collect().toSeq
    assert(served === inline)
    assert(served.nonEmpty)
  }

  test("shard-by-shard gating against the frozen gate equals the batch decisions") {
    val root = Files.createTempDirectory("graft-gate-stream").toString
    val decDir = s"$root/decisions"
    val target = corpus.filter(col("doc_id") < 3)
    val gated = corpus.filter(col("doc_id") >= 3)
    Models.buildLmModel(target.unionByName(gated), s"$root/lm")
    Models.buildLrModel(target, gated, s"$root/lr", "doc_id", "text",
      nBuckets = 64, lrate = 0.5, rounds = 3)
    Models.buildGateCuts(gated, root)
    // two shards, gated independently against the frozen calibration
    CurationStream.gateShard(gated.filter(col("doc_id") < 5), root, decDir, 0L)
    CurationStream.gateShard(gated.filter(col("doc_id") >= 5), root, decDir, 1L)
    val streamed = EventStreams.readUpsertTable(spark, decDir)
      .orderBy("doc_id").collect().toSeq
    val batch = Models.serveEnsembleGate(spark, root, gated)
      .orderBy("doc_id").collect().toSeq
    assert(streamed === batch)
    // replay of a committed batch is a no-op
    CurationStream.gateShard(gated.filter(col("doc_id") < 5), root, decDir, 0L)
    assert(EventStreams.readUpsertTable(spark, decDir)
      .orderBy("doc_id").collect().toSeq === streamed)
  }

  test("drift monitor: self-comparison is exactly zero; a shifted shard drifts; ledger per shard") {
    val root = Files.createTempDirectory("graft-drift").toString
    val target = corpus.filter(col("doc_id") < 3)
    val gated = corpus.filter(col("doc_id") >= 3)
    Models.buildLmModel(target.unionByName(gated), s"$root/lm")
    Models.buildLrModel(target, gated, s"$root/lr", "doc_id", "text",
      nBuckets = 64, lrate = 0.5, rounds = 3)
    Models.buildScoreHistograms(gated, root)
    // the calibration corpus against itself: every bucket count equal,
    // so every PSI term is (p - p)·ln(1) = 0 — exactly 0.0, not "small"
    val self = Models.scoreDrift(spark, root, gated).collect()
    assert(self.nonEmpty)
    assert(self.forall(r => r.getAs[Double]("psi") === 0.0))
    assert(self.forall(!_.getAs[Boolean]("drifted")))
    // a shard from a DIFFERENT distribution (the target slice, which the
    // calibration histograms never saw) moves mass across buckets
    val shifted = Models.scoreDrift(spark, root,
      target.withColumn("lang", lit("en"))).collect()
      .filter(_.getString(0) == "en")
    assert(shifted.nonEmpty)
    assert(shifted.exists(_.getAs[Double]("psi") > 0.0))
    // the streaming hook commits one verdict row set per shard batchId
    val driftDir = s"$root/drift"
    CurationStream.driftShard(gated.filter(col("doc_id") < 5), root, driftDir, 0L)
    CurationStream.driftShard(gated.filter(col("doc_id") >= 5), root, driftDir, 1L)
    val ledger = EventStreams.readUpsertTable(spark, driftDir).collect()
    assert(ledger.map(_.getAs[Long]("batch_id")).toSet === Set(0L, 1L))
    // replay no-ops
    CurationStream.driftShard(gated.filter(col("doc_id") < 5), root, driftDir, 0L)
    assert(EventStreams.readUpsertTable(spark, driftDir).count() === ledger.length)
  }

  test("recalibrateGate: cuts + drift reference re-land as one generation; serving follows") {
    val root = Files.createTempDirectory("graft-recal").toString
    val target = corpus.filter(col("doc_id") < 3)
    val gated = corpus.filter(col("doc_id") >= 3)
    Models.buildLmModel(target.unionByName(gated), s"$root/lm")
    Models.buildLrModel(target, gated, s"$root/lr", "doc_id", "text",
      nBuckets = 64, lrate = 0.5, rounds = 3)
    Models.buildGateCuts(gated, root)
    Models.buildScoreHistograms(gated, root)
    // recalibrate on a different slice, same frozen models, batch 1
    val calib2 = gated.filter(col("doc_id") >= 4)
    Models.recalibrateGate(calib2, root, batchId = 1L)
    // the served decisions now equal a gate calibrated on calib2 from
    // scratch (same models, fresh cut dir) — bit-identically
    val root2 = Files.createTempDirectory("graft-recal2").toString
    Models.buildLmModel(target.unionByName(gated), s"$root2/lm")
    Models.buildLrModel(target, gated, s"$root2/lr", "doc_id", "text",
      nBuckets = 64, lrate = 0.5, rounds = 3)
    Models.buildGateCuts(calib2, root2)
    val after = Models.serveEnsembleGate(spark, root, gated)
      .orderBy("doc_id").collect().toSeq
    val expected = Models.serveEnsembleGate(spark, root2, gated)
      .orderBy("doc_id").collect().toSeq
    assert(after === expected)
    assert(after.nonEmpty)
    // the language calib2 does NOT cover (fr, doc 3) is RETIRED, not
    // served against its stale batch-0 cut — a gate must refuse what
    // it cannot calibrate
    assert(!after.exists(_.getString(1) == "fr"))
    // the drift reference moved with the calibration: the NEW corpus
    // self-compares to exactly zero against the re-committed histograms
    val self = Models.scoreDrift(spark, root, calib2).collect()
    assert(self.nonEmpty)
    assert(self.forall(r => r.getAs[Double]("psi") === 0.0))
    // replayed recalibration no-ops (both tables)
    Models.recalibrateGate(calib2, root, batchId = 1L)
    assert(Models.serveEnsembleGate(spark, root, gated)
      .orderBy("doc_id").collect().toSeq === after)
  }

  test("committed tokenizer round-trips the inline train: merges, ids, separator") {
    val dir = Files.createTempDirectory("graft-tok-model").toString
    Models.buildTokenizer(corpus, dir, nMerges = 4)
    val (merges, vocab, sepId) = Models.readTokenizer(spark, dir)
    val inlineMerges = TextAnalysis.bpeTrainMerges(corpus, 4)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges === inlineMerges)
    val inlineVocab = TextAnalysis.bpeIdVocab(corpus, inlineMerges)
    assert(vocab === inlineVocab.zipWithIndex.toMap)
    assert(sepId === inlineVocab.size)
  }

  test("frozen-artifact incremental pipeline: gate -> encode -> materialize equals batch") {
    // the COMPOSED production loop, every trained artifact frozen:
    // committed LM/LR models + cuts gate each shard, the committed
    // tokenizer encodes the survivors, and the committed sequence
    // table grows through the carry — two shard passes must produce
    // exactly the batch pipeline's token layout
    val base = Files.createTempDirectory("graft-pipe-v2").toString
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.01")
    val target = docs.filter(col("doc_id") < 250)
    val gated = docs.filter(col("doc_id") >= 250)
    Models.buildLmModel(docs, s"$base/lm")
    Models.buildLrModel(target, gated, s"$base/lr", "doc_id", "text",
      nBuckets = 64, lrate = 0.5, rounds = 3)
    Models.buildGateCuts(gated, base)
    Models.buildTokenizer(gated, s"$base/tok", nMerges = 4)
    val (merges, vocab, sepId) = Models.readTokenizer(spark, s"$base/tok")
    def keptIds(df: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpeEncodeIds(
        df.join(Models.serveEnsembleGate(spark, base, df)
            .filter(col("keep")).select(col("doc_id")),
          Seq("doc_id"), "left_semi"),
        merges, vocab)
    val tableDir = s"$base/seqs"
    graft.operators.Packing.materializeShardIncremental(
      keptIds(gated.filter(col("doc_id") < 400)), tableDir,
      seqLen = 64, sepId = sepId, batchId = 0L)
    graft.operators.Packing.materializeShardIncremental(
      keptIds(gated.filter(col("doc_id") >= 400)), tableDir,
      seqLen = 64, sepId = sepId, batchId = 1L)
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).sortBy(_._1).toSeq
    val inc = canon(EventStreams.readUpsertTable(spark, tableDir)
      .select("seq_id", "tokens").collect())
    val batch = canon(graft.operators.Packing
      .materializeTokenSequences(keptIds(gated), seqLen = 64, sepId = sepId)
      .select("seq_id", "tokens").collect())
    assert(inc === batch)
    assert(inc.nonEmpty)
  }

  test("streaming shard scoring against committed models equals batch scoring") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-score-stream").toString
    val lmDir = s"$base/lm"
    val lrDir = s"$base/lr"
    val scoresDir = s"$base/scores"
    val srcDir = s"$base/src"
    Models.buildLmModel(corpus, lmDir)
    Models.buildLrModel(corpus.filter(col("doc_id") < 3),
      corpus.filter(col("doc_id") >= 3), lrDir, "doc_id", "text",
      nBuckets = 16, lrate = 0.5, rounds = 3)
    // two AvailableNow passes = two micro-batches, each scored against
    // the FROZEN models (the incremental-curation spec's shard pattern)
    corpus.filter(col("doc_id") < 3).coalesce(1)
      .write.mode("append").parquet(srcDir)
    CurationStream.startScoring(spark, srcDir, corpus.schema,
      lmDir, lrDir, scoresDir, s"$base/ckpt").awaitTermination()
    corpus.filter(col("doc_id") >= 3).coalesce(1)
      .write.mode("append").parquet(srcDir)
    CurationStream.startScoring(spark, srcDir, corpus.schema,
      lmDir, lrDir, scoresDir, s"$base/ckpt").awaitTermination()
    val streamed = EventStreams.readUpsertTable(spark, scoresDir)
      .orderBy("doc_id").collect().toSeq
    val batch = Models.scoreWithLmModel(spark, lmDir, corpus)
      .join(Models.scoreWithLrModel(spark, lrDir, corpus, "doc_id", "text"),
        Seq("doc_id"), "full")
      .orderBy("doc_id").collect().toSeq
    assert(streamed === batch)
    // replaying a shard under its batchId is exactly-once (no-op)
    CurationStream.scoreShard(corpus.filter(col("doc_id") < 3),
      lmDir, lrDir, scoresDir, batchId = 0L)
    assert(EventStreams.readUpsertTable(spark, scoresDir)
      .orderBy("doc_id").collect().toSeq === streamed)
  }
}
