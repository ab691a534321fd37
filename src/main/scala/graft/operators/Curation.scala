package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Texts

/** The corpus-curation pipeline stages (q136), factored so the BATCH
  * composition (`SparkEntry.q136CurationPipeline`, hash-checked against
  * the six-stage DuckDB oracle) and the INCREMENTAL composition
  * (`streaming.CurationStream`, the reference's `@daily` cadence —
  * ETL.py:20 — done right) run the SAME stage code. Stage order and
  * expressions are exactly the q136 body; see each member's notes for
  * the scale posture.
  */
object Curation {

  /** Stage 1 — quality gate: per-row feature thresholds projected
    * narrowly onto the corpus (one scan, no self-join). Returns the
    * (doc_id, text, lang, n_tokens) survivor projection.
    */
  def qualityGate(corpus: DataFrame): DataFrame =
    TextAnalysis.withQualityFeatures(corpus)
      .filter(col("n_tokens") >= 10 &&
        col("n_uniq_tokens").cast("double") / col("n_tokens") >= 0.3 &&
        col("stopword_ratio") <= 0.5)
      .select(col("doc_id"), col("text"), col("lang"), col("n_tokens"))

  /** Stage 2 — exact dedup: keep the min doc_id per content sha. The
    * shuffle carries the 32-byte sha, never text.
    */
  def exactUniqueIds(qual: DataFrame): DataFrame =
    qual.groupBy(sha2(col("text"), 256))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))

  /** Stage 3 — portable MinHash-LSH near-dup assignment (q89's rule):
    * 8-slot portable signatures → 2 banded keys → per-(band, key)
    * anchor = min doc_id → candidates verified by exact token-set
    * Jaccard >= 0.8 against their bucket anchors → rep = min verified
    * anchor. Candidates are O(docs × bands), never bucket-quadratic.
    *
    * explode+groupBy signatures, NO checkpoint — deliberate asymmetry
    * with q113: here every consumer sits in ONE plan, so ReuseExchange
    * serves the sig aggregate to both band branches for free, and an
    * eager checkpoint barrier measured SLOWER (0.57 s -> 0.83 s at
    * sf0.1); q113's eval/corpus split filters defeat reuse, which is
    * why it checkpoints and derives narrow array_min signatures instead.
    */
  def lshAssignments(docs: DataFrame): DataFrame = {
    val cand = Dedup.bandedAnchorCandidates(Dedup.portableMinhashSignatures(docs))
    val tsets = docs.select(col("doc_id"),
      array_distinct(Texts.tokens(col("text"))).as("ts"))
    Dedup.verifiedAnchorPairs(cand, tsets, minJaccard = 0.8)
      .groupBy(col("doc_id"))
      .agg(min(col("anchor")).as("rep_id"), max(col("jaccard")).as("jaccard"))
  }

  /** Word n-grams of a (doc_id, text) frame — the decontamination unit
    * (stage 4). Docs shorter than n grams produce no row.
    */
  def grams(d: DataFrame, n: Int): DataFrame = d
    .select(col("doc_id"), Texts.tokens(col("text")).as("toks"))
    .filter(size(col("toks")) >= n)
    .select(col("doc_id"), explode(expr(
      s"transform(sequence(1, size(toks) - ${n - 1}), i -> concat_ws(' ', slice(toks, i, $n)))"))
      .as("gram"))

  /** THRESHOLDED n-gram decontamination — the published recipe's
    * fraction form (Brown et al. 2020 appendix C remove training docs
    * overlapping eval; the modern open reports threshold on the
    * FRACTION of a document's distinct n-grams that hit the eval set,
    * so a long article quoting one eval sentence survives while a
    * paraphrased near-copy drops — the binary any-hit gate, stage 4 /
    * q132, is the conservative tau → 0+ LIMIT: dropped =
    * contam_frac >= tau, so any positive tau below 1/max_grams drops
    * exactly the any-hit docs, while tau = 0 itself drops EVERY doc,
    * including uncontaminated ones). Per corpus doc:
    * distinct-gram count, contaminated-gram count, their ratio (6 dp,
    * the rounding convention), and the decision at `tau`.
    *
    * Scale shape: one gram explode per side; the eval side collapses
    * to DISTINCT grams and BROADCASTS (eval suites are small by
    * construction — the stage-4 argument); the per-doc aggregate is
    * map-side combinable, and the shuffle carries (doc_id, gram)
    * pairs of the corpus side only. Nothing is all-pairs.
    */
  def thresholdedDecontamination(corpus: DataFrame, evalSlice: DataFrame,
                                 n: Int = 5, tau: Double = 0.2): DataFrame = {
    val evalGrams = grams(evalSlice, n).select(col("gram")).distinct()
      .withColumn("__hit", lit(1))
    grams(corpus, n)
      .select(col("doc_id"), col("gram")).distinct()
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_contaminated"))
      .withColumn("contam_frac",
        round(col("n_contaminated").cast("double") / col("n_grams"), 6))
      .withColumn("dropped", col("contam_frac") >= tau)
  }

  /** Stage 1 ALTERNATIVE — the learned ensemble gate
    * ([[TextAnalysis.ensembleQualityGate]], q154): rule pass + two
    * per-language-calibrated learned scores, with `target` as the LR
    * positives / LM co-training slice. Same (doc_id, text, lang,
    * n_tokens) survivor contract as [[qualityGate]], so it drops into
    * [[curate]]'s `stage1` seat unchanged.
    */
  def ensembleGate(target: DataFrame)(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), col("text"), col("lang"),
        graft.functions.Texts.tokenCount(col("text")).as("n_tokens"))
      .join(TextAnalysis.ensembleQualityGate(corpus, target)
        .filter(col("keep")).select(col("doc_id")), Seq("doc_id"), "left_semi")

  /** Stages 1–5 composed as ONE batch plan: quality gate (the rule
    * default, or any same-contract `stage1` — e.g.
    * [[ensembleGate]]) → exact dedup → LSH near-dup over the
    * survivors → n-gram decontamination against the eval slice
    * (broadcast eval grams) → portable split. Returns the survivor
    * frame (doc_id, text, lang, n_tokens, split) — q136 aggregates it
    * into the accounting table; the incremental spec compares survivor
    * SETS against it.
    *
    * `keepBest = true` switches stage 3's SURVIVOR POLICY from
    * keep-the-anchor (min doc_id — detection's internal convention) to
    * keep-the-BEST cluster member (the q171
    * [[Dedup.canonicalByQuality]] production policy: RefinedWeb/
    * FineWeb keep the longest copy): LSH rep edges close transitively
    * ([[Dedup.connectedComponents]] — a doc may link to its cluster
    * through a chain of band buckets), and each closed cluster keeps
    * its max-n_tokens member, ties to the smaller doc_id. Same scale
    * shape plus the closure's bounded pointer-jumping rounds and one
    * per-cluster argmax aggregate — still nothing all-pairs.
    *
    * Keep-best is a BATCH policy by construction: a later, better
    * cluster member would have to RETRACT an already-committed
    * survivor, which the incremental pipeline's append-only sink
    * cannot express — this is why `CurationStream.curateShard` keeps
    * the first-seen/min-id rule (a new arrival matching history can
    * only be dropped, never replace it), and why production systems
    * that want keep-best run it as a periodic batch re-selection over
    * the committed clusters (exactly [[Dedup.canonicalByQuality]] over
    * the accumulated closure — the q171 path).
    */
  def curate(corpus: DataFrame, evalSlice: DataFrame, n: Int = 5,
             stage1: DataFrame => DataFrame = qualityGate,
             keepBest: Boolean = false): DataFrame = {
    val qual = stage1(corpus)
    // materialize the quality+exact-dedup survivors ONCE (q113 pattern):
    // d1 feeds the LSH signature build, both verification token-set
    // sides, the gram explode, and the final accounting — five subtrees
    // that differ above the scan, so without the barrier the whole
    // quality+dedup lineage (scan, tokenize, hash, semi-join) re-derives
    // per consumer (measured: 57 scan appearances in the logical plan,
    // best-of-5 2.55 -> 2.10 s at sf0.1 from this one barrier)
    val d1 = qual.join(exactUniqueIds(qual), Seq("doc_id"), "left_semi").localCheckpoint()
    val d2 =
      if (!keepBest)
        d1.join(lshAssignments(d1).select(col("doc_id")),
          Seq("doc_id"), "left_anti")
      else {
        val cc = Dedup.connectedComponents(
            lshAssignments(d1).select(col("doc_id"), col("rep_id")),
            "doc_id", "rep_id")
          .select(col("node").as("doc_id"), col("cluster_id"))
        val canon = Dedup.canonicalByQuality(cc,
          d1.select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens")),
          "n_tokens")
        d1.join(canon.filter(col("is_canonical")).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
      }
    val evalGrams = grams(evalSlice, n).select(col("gram")).distinct()
    val contaminated = grams(d2, n).join(broadcast(evalGrams), Seq("gram"))
      .select(col("doc_id")).distinct()
    val d3 = d2.join(contaminated, Seq("doc_id"), "left_anti")
    Sampling.withSplitPortable(d3, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
  }
}
