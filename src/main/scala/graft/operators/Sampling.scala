package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines ([ext]): corpus
  * downsampling and split assignment. Both are seed-deterministic and
  * partition-parallel (per-row hash decisions — no shuffle, no
  * coordination), which is what makes them usable at 100 TB: the same
  * row always lands in the same sample/split regardless of cluster
  * layout, because the decision hashes row CONTENT, not position.
  */
object Sampling {

  /** Stratified downsampling: per-stratum keep-fractions, decided by a
    * seeded hash of a stable id column (content-deterministic, unlike
    * `DataFrame.sample`, whose result depends on partitioning).
    */
  def stratified(df: DataFrame, stratumCol: String, idCol: String,
                 fractions: Map[String, Double], defaultFraction: Double = 0.0,
                 seed: Long = 42L): DataFrame = {
    val u = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") / 1000000.0
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, f).otherwise(acc)
    }
    df.filter(u < frac)
  }

  /** Weighted corpus mixing: downsample each source to its target
    * fraction and union — the standard way training mixtures are built
    * (e.g. 70% web, 20% code, 10% curated). Deterministic per id; pure
    * narrow ops + union, no shuffle.
    */
  def mixCorpora(sources: Seq[(DataFrame, String, Double)], idCol: String,
                 seed: Long = 42L): DataFrame =
    sources.map { case (df, name, fraction) =>
      val u = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") / 1000000.0
      df.filter(u < fraction).withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)

  /** [[mixCorpora]] on the portable md5 hash (per-source salt, so each
    * source's keep-decision is an independent uniform draw) — the
    * auditable form: any md5-capable engine re-derives exactly which
    * rows entered the mixture.
    */
  def mixCorporaPortable(sources: Seq[(DataFrame, String, Double)],
                         idCol: String): DataFrame =
    sources.map { case (df, name, fraction) =>
      df.filter(portableUnit(col(idCol), s"mix:$name") < fraction)
        .withColumn("mix_source", lit(name))
    }.reduce(_ unionByName _)

  /** Engine-portable uniform hash in [0,1): integer value of the first 8
    * hex chars of md5(id || ':' || salt), over 16^8. Any engine with md5
    * (DuckDB, Trino, BigQuery, ...) reproduces it bit-for-bit — which
    * makes sampling/split membership AUDITABLE outside Spark: the same
    * SQL predicate re-derives exactly which rows were kept. Slightly
    * slower than xxhash64 (md5 + string round-trip) but still a pure
    * narrow per-row expression — no shuffle, no state, scale-free.
    */
  def portableUnit(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("double") / 4294967296.0 // 16^8

  /** [[stratified]], decided by the portable md5 hash instead of
    * xxhash64 — use when the sample must be reproducible by other
    * engines (e.g. a DuckDB/Trino audit of corpus membership).
    */
  def stratifiedPortable(df: DataFrame, stratumCol: String, idCol: String,
                         fractions: Map[String, Double],
                         defaultFraction: Double = 0.0): DataFrame = {
    val u = portableUnit(col(idCol), "sample")
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, f).otherwise(acc)
    }
    df.filter(u < frac)
  }

  /** [[withSplit]] on the portable md5 hash (independent salt, so
    * sampling and splitting decisions stay uncorrelated).
    */
  def withSplitPortable(df: DataFrame, idCol: String,
                        weights: Seq[(String, Double)]): DataFrame = {
    val total = weights.map(_._2).sum
    val u = portableUnit(col(idCol), "split")
    val (chain, _) = weights.foldLeft((Option.empty[Column], 0.0)) {
      case ((acc, cum), (name, w)) =>
        val hi = cum + w / total
        val cond = u < hi
        (Some(acc.fold(when(cond, name))(_.when(cond, name))), hi)
    }
    df.withColumn("split", chain.get.otherwise(weights.last._1))
  }

  /** CCNet perplexity-bucket sampling (Wenzek et al. 2020): per
    * LANGUAGE, split scored documents into head / middle / tail by the
    * score's within-language terciles (CCNet's Wikipedia-LM perplexity
    * thirds — here any quality score column; higher = better, so head
    * is the top tercile), then keep each bucket at its own fraction —
    * the published recipe keeps the head aggressively and samples the
    * tail thin rather than hard-dropping it (tail data still carries
    * signal; a hard gate is q154's job). Membership is the portable
    * md5 draw, so the kept set is engine-reproducible.
    *
    * Scale shape: the |langs|-row tercile-cut aggregate is the only
    * extra action (exact `percentile` is per-language — each language
    * funnels to its own reducer, the q154 argument); cuts broadcast
    * back and bucket + keep are narrow row-local expressions over ONE
    * scan of the scored frame. Callers whose `scored` frame is itself
    * a plan (not a table) should pass it materialized (the q113
    * barrier rule: the cut aggregate and the decision join are two
    * consumers).
    *
    * Returns the KEPT rows: input columns + (ppl_bucket, keep_frac).
    */
  def perplexityBucketSample(scored: DataFrame, langCol: String,
                             idCol: String, scoreCol: String,
                             headFrac: Double = 1.0, midFrac: Double = 0.5,
                             tailFrac: Double = 0.1,
                             salt: String = "ppl"): DataFrame = {
    val cuts = scored.groupBy(col(langCol))
      .agg(round(expr(s"percentile($scoreCol, ${1.0 / 3})"), 6).as("__c1"),
        round(expr(s"percentile($scoreCol, ${2.0 / 3})"), 6).as("__c2"))
    scored.join(broadcast(cuts), Seq(langCol))
      .withColumn("ppl_bucket",
        when(col(scoreCol) >= col("__c2"), "head")
          .when(col(scoreCol) >= col("__c1"), "middle")
          .otherwise("tail"))
      .withColumn("keep_frac",
        when(col("ppl_bucket") === "head", headFrac)
          .when(col("ppl_bucket") === "middle", midFrac)
          .otherwise(tailFrac))
      .filter(portableUnit(col(idCol), salt) < col("keep_frac"))
      .drop("__c1", "__c2")
  }

  /** Temperature-scaled domain mixing — the training-recipe op that
    * UPWEIGHTS low-resource domains: sampling probability p_d ∝ n_d^alpha
    * (alpha < 1 flattens the natural distribution; alpha = 1 is
    * proportional, alpha = 0 uniform across domains), then per-domain
    * keep fraction f_d = min(1, targetN * p_d / n_d) so the mixture
    * totals ≈ targetN docs. Unlike [[mixCorporaPortable]] (caller-chosen
    * fractions), the fractions here are DERIVED from corpus statistics —
    * the published multilingual/multi-source recipe shape.
    *
    * Clamping is renormalized by exact WATERFILLING (the published
    * recipe's shape): when targetN * p_d / n_d > 1 for a small domain,
    * that domain contributes ALL its n_d docs and the leftover mass is
    * redistributed across the unclamped domains by their renormalized
    * p ∝ n^alpha — iterated until no new domain clamps — so the mixture
    * genuinely totals ≈ targetN instead of silently undershooting by
    * the clamped excess.
    *
    * Scale shape: ONE tiny aggregate action derives the |domains|-row
    * count table (a column-pruned scan of just the domain column); the
    * waterfilling and the per-domain fractions are driver-side over
    * those |domains| rows, and membership is applied via a BROADCAST
    * join of the |domains|-row fraction table — so the RETURNED plan
    * scans the corpus exactly once. (A literal CASE chain was tried and
    * reverted: it builds an O(|domains|)-deep expression, which for a
    * high-cardinality domain column — hostnames, not languages — risks
    * codegen blowup and analysis-time stack overflow where the
    * broadcast-hash-join shape stays flat.) Null-domain rows match no
    * fraction row and are dropped, exactly as before. The membership
    * test is the same narrow portable-md5 predicate as every sampler
    * here, so any engine re-derives exactly which rows entered the
    * mixture. Fractions are rounded to 6 dp BEFORE the membership test
    * so the kept set is reproducible bit-for-bit cross-engine.
    */
  def temperatureMix(df: DataFrame, domainCol: String, idCol: String,
                     alpha: Double, targetN: Long,
                     salt: String = "tempmix"): DataFrame = {
    val counts = df.groupBy(col(domainCol).cast("string").as("__d"))
      .agg(count(lit(1)).as("__n"))
      .collect().filter(!_.isNullAt(0)).map(r => (r.getString(0), r.getLong(1)))
    val fracs = temperatureFractions(counts.toSeq, alpha, targetN)
    val spark = df.sparkSession
    import spark.implicits._
    val fracTable = fracs.toDF("__d", "keep_frac")
    df.join(broadcast(fracTable), col(domainCol).cast("string") === col("__d"))
      .drop("__d")
      .filter(portableUnit(col(idCol), salt) < col("keep_frac"))
  }

  /** [[temperatureMix]] budgeted in TOKENS rather than documents — the
    * form the published recipes actually state (mixture proportions
    * are fractions of the TRAINING-TOKEN budget; a doc-count budget
    * over-weights domains with short documents): p_d ∝ T_d^alpha over
    * per-domain token masses, keep fraction f_d = waterfilled
    * min(1, targetTokens · p_d / T_d), membership drawn per DOCUMENT
    * at f_d — so each domain contributes ≈ f_d · T_d tokens in
    * expectation (the standard doc-level sampling of a token budget;
    * exact-token packing is downstream's job, q153/q165). Same scale
    * shape as [[temperatureMix]]: one tiny aggregate (now summing the
    * token column), driver-side waterfilling on |domains| rows, a
    * broadcast fraction table, one narrow portable-md5 membership
    * predicate.
    */
  def temperatureMixByTokens(df: DataFrame, domainCol: String, idCol: String,
                             nTokensCol: String, alpha: Double,
                             targetTokens: Long,
                             salt: String = "tokmix"): DataFrame = {
    val counts = df.groupBy(col(domainCol).cast("string").as("__d"))
      .agg(sum(col(nTokensCol)).cast("long").as("__n"))
      .collect().filter(!_.isNullAt(0)).map(r => (r.getString(0), r.getLong(1)))
    val fracs = temperatureFractions(counts.toSeq, alpha, targetTokens)
    val spark = df.sparkSession
    import spark.implicits._
    val fracTable = fracs.toDF("__d", "keep_frac")
    df.join(broadcast(fracTable), col(domainCol).cast("string") === col("__d"))
      .drop("__d")
      .filter(portableUnit(col(idCol), salt) < col("keep_frac"))
  }

  /** Exact waterfilling over the (domain, count) table: walk domains in
    * DECREASING keep-fraction potential n^(alpha-1) — ascending count
    * for alpha <= 1 (small domains upweight, so they clamp first),
    * DESCENDING count for alpha > 1 (large domains upweight) — ties by
    * name; the q134 oracle SQL's window uses the identical total order
    * (its alpha is 0.5), so prefix sums agree bit-for-bit. The order
    * key is the integer count, never the float power, so both engines
    * sort identically. While the first unclamped domain's share
    * c * n^alpha exceeds its n, clamp it to 1.0 and redistribute; the
    * walk order makes every later fraction <= the first unclamped one,
    * so no returned fraction exceeds 1.0 for ANY alpha > 0. The
    * returned fractions are HALF_UP-rounded to 6 dp (Spark's and
    * DuckDB's ROUND convention). Driver-side on |domains| rows — the
    * same bounded-collect contract as IVF centroids and PQ codebooks.
    */
  private[graft] def temperatureFractions(counts: Seq[(String, Long)], alpha: Double,
                                          targetN: Long): Seq[(String, Double)] = {
    require(alpha > 0.0, s"temperature alpha must be > 0, got $alpha")
    val sorted =
      if (alpha <= 1.0) counts.sortBy { case (d, n) => (n, d) }
      else counts.sortBy { case (d, n) => (-n, d) }
    val n = sorted.map(_._2.toDouble)
    val pn = n.map(math.pow(_, alpha))
    var k = 0
    while (k < sorted.size && {
      val c = (targetN.toDouble - n.take(k).sum) / pn.drop(k).sum
      c * pn(k) > n(k) // the highest-potential unclamped domain still clamps
    }) k += 1
    val c = if (k < sorted.size) (targetN.toDouble - n.take(k).sum) / pn.drop(k).sum
            else 0.0 // every domain clamped: targetN >= the whole corpus
    sorted.zipWithIndex.map { case ((d, _), i) =>
      d -> (if (i < k) 1.0
            else BigDecimal(c * pn(i) / n(i))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  /** One selected row of a weighted sample (object-level for implicit
    * Encoder resolution in [[weightedTopKPortable]]).
    */
  final case class WeightedPick(stratum: String, id: Long, aes_key: Double)

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES),
    * k rows per stratum: each row draws u = portableUnit(id, salt) and
    * gets key = −ln(u) / w (an Exp(w) draw — the exponential form of
    * A-ES's u^(1/w)); the k SMALLEST keys per stratum are an exact
    * weighted sample without replacement. This is how a curation
    * pipeline takes "20 docs per language, longer docs proportionally
    * more likely" in ONE pass: the bounded topK aggregator prunes to k
    * rows per partition map-side — no per-stratum window sort, no
    * global shuffle of the corpus. Keys are rounded to 6 dp BEFORE
    * ranking (ties broken by id) so selection and order are
    * reproducible bit-for-bit in any md5+ln-capable engine.
    *
    * CONTRACT: weights must be non-null and > 0 (enforced with
    * `raise_error`, codegen'd — free on the valid path). A-ES keys are
    * −ln(u)/w: w = 0 would yield +Inf (row silently never sampled),
    * w < 0 a negative key ranking FIRST (selection silently inverts),
    * null a null key (row silently dropped) — all three are caller
    * bugs that must fail loudly, not skew the sample.
    */
  def weightedTopKPortable(df: DataFrame, stratumCol: String, idCol: String,
                           weightCol: String, k: Int, salt: String = "aes"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    implicit val ord: Ordering[WeightedPick] = Ordering.by(r => (r.aes_key, r.id))
    val w = col(weightCol).cast("double")
    val checkedW = when(w.isNull || w <= 0.0,
        raise_error(concat(lit("weightedTopKPortable: weight must be > 0, got "),
          coalesce(w.cast("string"), lit("null")), lit(" at "), col(stratumCol).cast("string"),
          lit("/"), col(idCol).cast("string"))))
      .otherwise(w)
    df.select(col(stratumCol).cast("string").as("stratum"),
        col(idCol).cast("long").as("id"),
        round(-log(portableUnit(col(idCol), salt)) / checkedW, 6)
          .as("aes_key"))
      .as[WeightedPick]
      .groupByKey(_.stratum)
      .agg(graft.functions.TypedAggs.topK[WeightedPick](k).toColumn.name("top"))
      .toDF("key", "top")
      .select(posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("r.stratum"), col("r.id"), col("r.aes_key"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Dense contiguous global row index 0..n-1 in total `orderCols`
    * order — WITHOUT the single-partition sort a global
    * `row_number() OVER (ORDER BY ...)` window costs (one task holding
    * 100 TB). Distributed shape: range-repartition on the order key
    * (total order across partitions), sort within each partition, then
    * `zipWithIndex` — one lightweight count job (one Long per
    * partition back to the driver) to compute partition offsets,
    * then a narrow per-partition assignment. This is how a training
    * pipeline assigns stable contiguous sample ids for sharding and
    * curriculum ordering. `orderCols` must be a total order (include a
    * unique tiebreaker) or the index is nondeterministic across runs.
    * Range-partition sampling in Spark SQL is seeded per-partition, so
    * the two internal jobs see identical boundaries.
    */
  def denseGlobalIndex(df: DataFrame, idxName: String,
                       orderCols: Seq[Column], nParts: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
    val spark = df.sparkSession
    val parted = df.repartitionByRange(nParts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = parted.schema.add(idxName, org.apache.spark.sql.types.LongType, nullable = false)
    // stay on InternalRow: toRdd + a projection appends the Long without
    // the external-Row decode/encode round-trip (three materializations
    // per row) that .rdd/createDataFrame would pay
    val indexed = parted.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val proj = UnsafeProjection.create(schema)
      val joined = new JoinedRow
      val idxRow = new GenericInternalRow(1)
      it.map { case (row, i) =>
        idxRow.update(0, i)
        proj(joined(row, idxRow)): InternalRow
      }
    }
    org.apache.spark.sql.graft.ColumnBridge.ofInternalRows(spark, indexed, schema)
  }

  /** Deterministic train/val/test split assignment as a column. Weights
    * are normalized; same id -> same split, always.
    */
  def withSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    val total = weights.map(_._2).sum
    val u = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") / 1000000.0
    val (chain, _) = weights.foldLeft((Option.empty[org.apache.spark.sql.Column], 0.0)) {
      case ((acc, cum), (name, w)) =>
        val hi = cum + w / total
        val cond = u < hi
        (Some(acc.fold(when(cond, name))(_.when(cond, name))), hi)
    }
    df.withColumn("split", chain.get.otherwise(weights.last._1))
  }

  /** DSIR-style data selection (the published recipe: Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every RAW-pool document by how target-like its hashed
    * unigram features are, and keep the highest-scoring ones. Feature
    * space = `nBuckets` hash buckets over tokens (md5-derived, the
    * portable convention); both corpora reduce to bucket count vectors;
    * per-bucket importance log-ratio
    * ln( (c_target[b]+1)/(N_t+B) / ((c_raw[b]+1)/(N_r+B) ) )
    * (add-one smoothing); a doc's score is the MEAN ratio over its
    * tokens (length-normalized). Returns the `keep` top raw docs by
    * (score DESC, doc_id).
    *
    * Scale shape: two token-bucket aggregates (each one corpus pass,
    * map-side combined into at most `nBuckets` rows), a `nBuckets`-row
    * ratio table broadcast onto the raw side's exploded tokens, one
    * per-doc average, and a TakeOrdered top-k — no shuffle ever
    * carries more than (doc_id, bucket) pairs, and the model state is
    * O(nBuckets) regardless of corpus size. md5 bucketing makes every
    * score re-derivable in any engine (the q145 oracle re-computes the
    * full chain).
    */
  def dsirSelect(target: DataFrame, raw: DataFrame, idCol: String,
                 textCol: String, nBuckets: Int, keep: Int): DataFrame = {
    val ratios = dsirRatioTable(target, raw, idCol, textCol, nBuckets)
    dsirScoreAgainst(raw, idCol, textCol, nBuckets, ratios)
      .orderBy(col("dsir_score").desc, col(idCol))
      .limit(keep)
  }

  /** Per-token md5 hash buckets (id, w, b) — the shared feature space
    * of DSIR and the LR quality classifier (portable: any md5 engine
    * re-derives the buckets).
    */
  private[operators] def hashBuckets(df: DataFrame, idCol: String,
                                     textCol: String, nBuckets: Int): DataFrame = {
    import graft.functions.Texts
    df.select(col(idCol), explode(Texts.tokens(col(textCol))).as("w"))
      .withColumn("b",
        pmod(conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"),
          lit(nBuckets.toLong)))
  }

  /** DSIR's entire MODEL: the `nBuckets`-row per-bucket importance
    * log-ratio table (b, lr) — what [[graft.operators.Models]]
    * persists for score-only serving.
    */
  private[operators] def dsirRatioTable(target: DataFrame, raw: DataFrame,
                                        idCol: String, textCol: String,
                                        nBuckets: Int): DataFrame = {
    def counts(df: DataFrame): DataFrame =
      hashBuckets(df, idCol, textCol, nBuckets)
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
    val tc = counts(target).withColumnRenamed("c", "ct")
    val rc = counts(raw).withColumnRenamed("c", "cr")
    // nBuckets rows: totals ride along as window-free scalar aggregates
    val totals = tc.agg(sum(col("ct")).as("nt")).crossJoin(rc.agg(sum(col("cr")).as("nr")))
    tc.join(rc, Seq("b"), "full")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        log(((coalesce(col("ct"), lit(0L)) + 1).cast("double")
              / (col("nt") + nBuckets))
          / ((coalesce(col("cr"), lit(0L)) + 1).cast("double")
              / (col("nr") + nBuckets))).as("lr"))
  }

  /** Score docs against a (b, lr) ratio table — DSIR's SERVING half:
    * one narrow token-bucket explode, a broadcast join of the
    * nBuckets-row model, one per-doc average. Shared by the inline
    * [[dsirSelect]] and the persisted-model path, so the two produce
    * bit-identical scores.
    */
  private[operators] def dsirScoreAgainst(docs: DataFrame, idCol: String,
                                          textCol: String, nBuckets: Int,
                                          ratios: DataFrame): DataFrame =
    hashBuckets(docs, idCol, textCol, nBuckets).join(broadcast(ratios), Seq("b"))
      .groupBy(col(idCol))
      .agg(round(avg(col("lr")), 6).as("dsir_score"))

  /** LEARNED quality classifier — logistic regression over hashed
    * unigram features, the published "quality filter" recipe (GPT-3,
    * Brown et al. 2020 appendix A: an LR classifier trained to
    * separate a curated positive corpus from raw crawl, used to score
    * and select the crawl; LLaMA and PaLM run the same shape with a
    * fastText-style linear model). Complements the HEURISTIC gates
    * ([[TextAnalysis.gopherQualityGate]]), the self-trained LM score
    * ([[TextAnalysis.bigramLmScore]]), and importance RESAMPLING
    * ([[dsirSelect]]): this is the supervised member of the family.
    *
    * Features: each doc's hashed-unigram term frequencies over
    * `nBuckets` buckets ([[dsirSelect]]'s portable md5 bucket), plus a
    * constant bias feature. Training: `rounds` full-batch gradient
    * steps from w=0 with learning rate `lrate` — deterministic by
    * construction (no SGD sampling, no init randomness), so an oracle
    * can replay the entire trajectory. Weights are quantized to 9
    * decimals after each step and scores to 6 (the repo's ROUND
    * convention): double-sum reorder drift across engines is ~1e-12,
    * so quantization makes the trajectory engine-portable without
    * changing what the model learns.
    *
    * Scale shape: the corpus text is read ONCE into the per-doc
    * feature table — (id, y, bucket array, tf array), arrays ≤
    * nBuckets entries, text dropped — cut from the corpus lineage by a
    * checkpoint barrier (the q136/bigramLmScore scan-once pattern).
    * Each round is then one narrow scoring projection (weights ride as
    * an O(nBuckets) literal — the IVF-centroid / PQ-codebook
    * bounded-constant convention) plus one explode→aggregate whose
    * map-side partials shrink to nBuckets rows before the shuffle; the
    * driver collects exactly nBuckets+1 doubles per round. Total:
    * 1 text pass + `rounds` feature-table passes, model state O(64)
    * — nothing grows with the corpus.
    *
    * Returns the `keep` highest-scoring raw docs as (id,
    * lr_quality), ordered (score DESC, id).
    */
  def lrQualitySelect(target: DataFrame, raw: DataFrame, idCol: String,
                      textCol: String, nBuckets: Int, lrate: Double,
                      rounds: Int, keep: Int): DataFrame =
    lrQualityScores(target, raw, idCol, textCol, nBuckets, lrate, rounds)
      .orderBy(col("lr_quality").desc, col(idCol))
      .limit(keep)

  /** The trained classifier's score for EVERY raw doc (no top-k cut) —
    * [[lrQualitySelect]] minus the selection, for consumers that
    * threshold rather than rank (the ensemble gate's per-language
    * calibrated cuts). Same training recurrence, bit-identical scores.
    */
  def lrQualityScores(target: DataFrame, raw: DataFrame, idCol: String,
                      textCol: String, nBuckets: Int, lrate: Double,
                      rounds: Int): DataFrame = {
    val labeled =
      target.select(col(idCol), lit(1.0).as("y"), col(textCol).as("t"))
        .unionByName(raw.select(col(idCol), lit(0.0).as("y"), col(textCol).as("t")))
    val feats = lrFeatures(labeled, idCol, nBuckets, barrier = true)
    val w = lrFit(feats, nBuckets, lrate, rounds)
    feats.filter(col("y") === 0.0)
      .select(col(idCol), round(lrSigmoid(w), 6).as("lr_quality"))
  }

  /** The classifier's feature frame: one row per doc — (id, y, bs, xs)
    * with bucket -1 the bias feature (tf 1.0), so the bias gradient
    * falls out of the same aggregation as the weights. `barrier`
    * checkpoints the frame (training consumes it `rounds`+1 times;
    * score-only serving consumes it once and skips the
    * materialization).
    */
  private[graft] def lrFeatures(labeled: DataFrame, idCol: String,
                                nBuckets: Int, barrier: Boolean): DataFrame = {
    import graft.functions.Texts
    // NARROW per-row histogram (optimization r17, guide §2.4 — remove
    // shuffles outright): the original explode(tokens) + two groupBys
    // shuffled token-count rows twice just to build a per-doc sparse
    // (bucket, tf) list. The md5-bucket histogram is a per-row fact —
    // graft.plans.HashedBow computes it in one codegen'd pass (same md5
    // family, integer counts as exact doubles), and the sparse (bs, xs)
    // arrays fall out of a bounded O(nBuckets) scan. Value-identical:
    // nonzero buckets ascending == sort_array of the grouped counts
    // (buckets are unique per doc); n = Σ counts is an exact integer
    // sum either way; the division is the same c / n. Zero-token docs
    // produce no row in either form (explode emitted nothing; here the
    // n > 0 filter drops them). SamplingSpec pins narrow ≡ explode+agg.
    val feats = labeled
      .select(col(idCol), col("y"),
        graft.plans.HashedBow.hashedBow(Texts.tokens(col("t")), nBuckets)
          .as("h"))
      .withColumn("n", aggregate(col("h"), lit(0.0), (a, v) => a + v))
      .filter(col("n") > 0.0)
      .select(col(idCol), col("y"),
        concat(array(lit(-1L)),
          filter(transform(col("h"),
            (v, i) => when(v > 0.0, i.cast("long"))), x => x.isNotNull))
          .as("bs"),
        concat(array(lit(1.0)),
          filter(transform(col("h"),
            v => when(v > 0.0, v / col("n"))), x => x.isNotNull))
          .as("xs"))
    if (barrier) feats.localCheckpoint() else feats
  }

  /** The original explode + two-groupBy formulation — kept as the
    * executable parity reference for the narrow HashedBow form above
    * (SamplingSpec replays both over real corpus text and asserts
    * identical feature frames). Not the production path.
    */
  private[graft] def lrFeaturesExplode(labeled: DataFrame, idCol: String,
                                       nBuckets: Int): DataFrame = {
    import graft.functions.Texts
    val bc = labeled
      .select(col(idCol), col("y"), explode(Texts.tokens(col("t"))).as("w"))
      .withColumn("b",
        pmod(conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long"),
          lit(nBuckets.toLong)))
      .groupBy(col(idCol), col("y"), col("b"))
      .agg(count(lit(1)).cast("double").as("c"))
    bc
      .groupBy(col(idCol), col("y"))
      .agg(sort_array(collect_list(struct(col("b"), col("c")))).as("bcs"),
        sum(col("c")).as("n"))
      .select(col(idCol), col("y"),
        concat(array(lit(-1L)),
          transform(col("bcs"), e => e.getField("b"))).as("bs"),
        concat(array(lit(1.0)),
          transform(col("bcs"), e => e.getField("c") / col("n"))).as("xs"))
  }

  /** The sigmoid scoring expression over (bs, xs) feature columns —
    * weights ride as an O(nBuckets) literal (the bounded-constant
    * convention). w(0) = bias, w(j+1) = bucket j, matching the b+2
    * element_at shift.
    */
  private[operators] def lrSigmoid(wCur: Array[Double]): Column = {
    val wlit = array(wCur.map(lit(_)).toSeq: _*)
    val z = aggregate(
      zip_with(col("bs"), col("xs"),
        (b, x) => element_at(wlit, (b + lit(2L)).cast("int")) * x),
      lit(0.0), (acc, v) => acc + v)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** The deterministic full-batch gradient loop — returns the trained
    * weight vector (nBuckets + 1 doubles, quantized to 9 dp per step;
    * see [[lrQualityScores]]' doc for why). This IS the model
    * [[graft.operators.Models]] persists.
    */
  private[operators] def lrFit(feats: DataFrame, nBuckets: Int, lrate: Double,
                               rounds: Int): Array[Double] = {
    val nDocs = feats.count().toDouble
    // w(0) = bias, w(j+1) = bucket j — matching the b+2 element_at shift
    val w = Array.fill(nBuckets + 1)(0.0)
    for (_ <- 1 to rounds) {
      val grad = feats
        .select(explode(arrays_zip(col("bs"), col("xs"))).as("e"),
          (lrSigmoid(w) - col("y")).as("coef"))
        .groupBy(col("e.bs").as("b"))
        .agg(sum(col("coef") * col("e.xs")).as("g"))
        .collect() // bounded by contract: nBuckets + 1 rows
      grad.foreach { r =>
        val j = r.getLong(0).toInt + 1
        // java BigDecimal.valueOf = Spark Round's own double→decimal
        // path, so this quantization is bit-identical to an engine-side
        // round(col, 9)
        w(j) = java.math.BigDecimal.valueOf(w(j) - lrate * r.getDouble(1) / nDocs)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      }
    }
    w
  }

  /** SCORE-ONLY serving for the LR classifier: given trained weights
    * (a bounded driver-side constant — the persisted-model read), one
    * feature aggregation + one narrow sigmoid projection per doc. No
    * gradient rounds, no label column, no checkpoint barrier (single
    * consumer). Bit-identical to the scores the training run produces
    * for the same docs.
    */
  def lrScoreWith(docs: DataFrame, idCol: String, textCol: String,
                  weights: Array[Double]): DataFrame = {
    val nBuckets = weights.length - 1
    lrFeatures(
        docs.select(col(idCol), lit(0.0).as("y"), col(textCol).as("t")),
        idCol, nBuckets, barrier = false)
      .select(col(idCol), round(lrSigmoid(weights), 6).as("lr_quality"))
  }

  /** LEAKAGE-SAFE train/eval split: the split is decided per
    * DUP-CLUSTER, not per document, so near-duplicates can never
    * straddle train and eval (the standard eval-contamination failure:
    * doc-level hashing puts a document in train and its near-copy in
    * eval, and the benchmark leaks). `clusters` is a (node,
    * cluster_id) closure — [[Dedup.connectedComponents]] over any
    * near-dup edge set — and docs absent from it are singleton
    * clusters keyed by their own id. The md5 [[portableUnit]] draw on
    * the CLUSTER key makes membership auditable in any engine, and the
    * whole assignment is one broadcast-or-shuffle join + a narrow
    * predicate: nothing new materializes at 100 TB beyond the closure
    * itself.
    *
    * Returns (doc_id, group_key, split) with split in {train, eval}.
    */
  def leakageSafeSplit(docs: DataFrame, clusters: DataFrame,
                       trainFrac: Double, salt: String = "lsplit"): DataFrame =
    docs.select(col("doc_id"))
      .join(clusters.select(col("node").as("doc_id"), col("cluster_id")),
        Seq("doc_id"), "left")
      .withColumn("group_key", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(portableUnit(col("group_key"), salt) < trainFrac, "train")
          .otherwise("eval"))
      .select(col("doc_id"), col("group_key"), col("split"))
}
