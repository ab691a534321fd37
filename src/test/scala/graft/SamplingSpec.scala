package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Sampling}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = (0L until 2000L).map(i =>
    (i, if (i % 2 == 0) "en" else "de", s"doc content $i")).toDF("doc_id", "lang", "text")

  test("stratified keeps roughly the per-stratum fraction, deterministically") {
    val s1 = Sampling.stratified(corpus, "lang", "doc_id", Map("en" -> 0.5, "de" -> 0.1))
    val s2 = Sampling.stratified(corpus, "lang", "doc_id", Map("en" -> 0.5, "de" -> 0.1))
    assert(s1.collect().map(_.getLong(0)).toSet === s2.collect().map(_.getLong(0)).toSet)
    val byLang = s1.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") > 400 && byLang("en") < 600)   // ~500 of 1000
    assert(byLang("de") > 50 && byLang("de") < 150)    // ~100 of 1000
  }

  test("withSplit assigns every row to exactly one split with ~weights") {
    val split = Sampling.withSplit(corpus, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1500 && counts("train") < 1700)
    assert(counts.keySet === Set("train", "val", "test"))
  }

  test("denseGlobalIndex is contiguous 0..n-1 in total order, stable across runs") {
    val shuffled = corpus.repartition(7)   // destroy any incidental order
    val idx = Sampling.denseGlobalIndex(
      shuffled, "idx", Seq(col("lang"), col("doc_id")), 5)
    val rows = idx.collect().sortBy(_.getAs[Long]("idx"))
    assert(rows.map(_.getAs[Long]("idx")).toSeq === (0L until 2000L))
    // index order must equal the (lang, doc_id) total order
    val keys = rows.map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id")))
    assert(keys.toSeq === keys.sortBy(identity).toSeq)
    // stable: a second run assigns identical indices
    val again = Sampling.denseGlobalIndex(
      shuffled, "idx", Seq(col("lang"), col("doc_id")), 5)
    assert(again.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("idx"))).toSet ===
      rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("idx"))).toSet)
  }

  test("mixCorpora unions weighted samples with source labels") {
    val web = corpus.withColumn("text", concat(lit("web "), col("text")))
    val code = corpus.withColumn("text", concat(lit("code "), col("text")))
    val mixed = Sampling.mixCorpora(Seq((web, "web", 0.7), (code, "code", 0.1)), "doc_id")
    val bySource = mixed.groupBy("mix_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("web") > 1200 && bySource("web") < 1600)  // ~1400 of 2000
    assert(bySource("code") > 100 && bySource("code") < 300)  // ~200 of 2000
  }

  test("portableUnit is uniform-ish on [0,1) and salt-independent") {
    val u = corpus.select(Sampling.portableUnit(col("doc_id"), "sample").as("u"))
      .collect().map(_.getDouble(0))
    assert(u.forall(x => x >= 0.0 && x < 1.0))
    assert(math.abs(u.sum / u.length - 0.5) < 0.02) // mean ~0.5
    // different salts decorrelate: same ids, different member sets
    val a = corpus.filter(Sampling.portableUnit(col("doc_id"), "sample") < 0.5)
      .collect().map(_.getLong(0)).toSet
    val b = corpus.filter(Sampling.portableUnit(col("doc_id"), "split") < 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(a !== b)
  }

  test("stratifiedPortable + withSplitPortable keep fractions and are total") {
    val s = Sampling.stratifiedPortable(corpus, "lang", "doc_id", Map("en" -> 0.5, "de" -> 0.1))
    val byLang = s.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") > 400 && byLang("en") < 600)
    assert(byLang("de") > 50 && byLang("de") < 150)
    val split = Sampling.withSplitPortable(corpus, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 2000L)
    assert(counts("train") > 1500 && counts("train") < 1700)
  }

  test("temperatureMix upweights small domains and lands near targetN") {
    // skewed domains: 1800 'web' docs, 200 'books' docs
    val skewed = corpus.withColumn("source",
      when(col("doc_id") < 1800, "web").otherwise("books"))
    val out = Sampling.temperatureMix(skewed, "source", "doc_id",
      alpha = 0.5, targetN = 500L)
    val byDomain = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=0.5: p ∝ sqrt(n) → web:books mass ratio 3:1 instead of the
    // natural 9:1 — books lands near 125 of 500 (keep_frac ~0.625 of 200)
    assert(byDomain("books") > 90 && byDomain("books") < 160)
    assert(byDomain("web") > 300 && byDomain("web") < 450)
    val total = byDomain.values.sum
    assert(total > 400 && total < 600) // mixture totals ≈ targetN
    // deterministic: same fractions + portable hash → identical member set
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.temperatureMix(skewed, "source", "doc_id", 0.5, 500L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
    // alpha = 1 is proportional sampling: keep fractions equalize across
    // domains (both ≈ targetN / total), so books gets ~its natural share
    val prop = Sampling.temperatureMix(skewed, "source", "doc_id", 1.0, 500L)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prop("books") > 25 && prop("books") < 80) // ~50 = 200 * 0.25
  }

  test("temperatureMixByTokens budgets the mixture in token mass, not doc count") {
    import spark.implicits._
    // 'web': 100 docs of 100 tokens (10k tokens); 'books': 100 docs of
    // 10 tokens (1k tokens). Equal DOC counts — a doc-count budget would
    // treat the domains identically; the token budget must not.
    val df = (0L until 200L).map(i =>
        (i, if (i < 100) "web" else "books", if (i < 100) 100L else 10L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.temperatureMixByTokens(df, "source", "doc_id",
      "n_tokens", alpha = 0.5, targetTokens = 5000L)
    val fracs = out.select("source", "keep_frac").distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // alpha=0.5 over masses (10k, 1k): p ∝ (100, ~31.6); books' raw
    // share 5000·0.24/1000 > 1 clamps to 1.0 and web absorbs the rest
    assert(fracs("books") === 1.0)
    assert(fracs("web") > 0.3 && fracs("web") < 0.5)
    // expected kept token mass ≈ the 5000-token target
    val mass = out.groupBy("source").sum("n_tokens")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mass("books") === 1000L) // clamped domain keeps every doc
    val total = mass.values.sum
    assert(total > 4000L && total < 6000L)
  }

  test("temperatureMix waterfills: clamped domains keep everything, total still ≈ targetN") {
    // 1800 web / 200 books, targetN=1500: books' unclamped share would be
    // 1500·sqrt(200)/(sqrt(1800)+sqrt(200))/200 ≈ 1.87 → clamps to 1.0,
    // and the 1300 leftover must ALL go to web (frac 1300/1800 ≈ 0.722) —
    // the one-shot clamp undershot to ~1325 here
    val skewed = corpus.withColumn("source",
      when(col("doc_id") < 1800, "web").otherwise("books"))
    val fr = Sampling.temperatureFractions(
      Seq("web" -> 1800L, "books" -> 200L), alpha = 0.5, targetN = 1500L).toMap
    assert(fr("books") === 1.0)
    assert(math.abs(fr("books") * 200 + fr("web") * 1800 - 1500.0) < 1.0)
    val out = Sampling.temperatureMix(skewed, "source", "doc_id", 0.5, 1500L)
    val byDomain = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDomain("books") === 200L) // clamped: every books doc kept
    assert(byDomain.values.sum > 1400 && byDomain.values.sum < 1600)
    // everything clamps when targetN exceeds the corpus: all fracs 1.0
    val all = Sampling.temperatureFractions(
      Seq("web" -> 1800L, "books" -> 200L), 0.5, 5000L)
    assert(all.forall(_._2 === 1.0))
  }

  test("temperatureFractions waterfills correctly for alpha > 1 (large domains clamp first)") {
    // alpha=2 UPweights large domains: p ∝ n², so B (100 docs) wants
    // 105·10000/10100 ≈ 104 > 100 → clamps to 1.0, and A keeps the
    // leftover 5 of its 10 (frac 0.5). The ascending-count walk (valid
    // only for alpha ≤ 1) returned B → 1.04 (> 1!) and A → 0.104 here.
    val fr = Sampling.temperatureFractions(
      Seq("A" -> 10L, "B" -> 100L), alpha = 2.0, targetN = 105L).toMap
    assert(fr("B") === 1.0)
    assert(fr("A") === 0.5)
    // no fraction may ever exceed 1.0, for any alpha on either side of 1
    for (a <- Seq(0.3, 0.7, 1.0, 1.5, 3.0);
         t <- Seq(50L, 105L, 109L, 500L)) {
      val f = Sampling.temperatureFractions(
        Seq("A" -> 10L, "B" -> 100L, "C" -> 40L), a, t)
      assert(f.forall(_._2 <= 1.0), s"alpha=$a target=$t gave $f")
      assert(f.forall(_._2 >= 0.0), s"alpha=$a target=$t gave $f")
      // mixture mass hits targetN whenever the corpus can supply it
      val mass = f.map { case (d, fr0) =>
        fr0 * Map("A" -> 10L, "B" -> 100L, "C" -> 40L)(d) }.sum
      assert(math.abs(mass - math.min(t.toDouble, 150.0)) < 0.01,
        s"alpha=$a target=$t mass=$mass")
    }
  }

  test("mixCorporaPortable honors per-source fractions, deterministic, tagged") {
    val en = corpus.filter(col("lang") === "en")
    val de = corpus.filter(col("lang") === "de")
    val mix = Sampling.mixCorporaPortable(
      Seq((en, "web", 0.7), (de, "curated", 1.0)), "doc_id")
    val counts = mix.groupBy("mix_source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nEn = en.count().toDouble
    assert(counts("web") > nEn * 0.6 && counts("web") < nEn * 0.8)
    assert(counts("curated") === de.count()) // fraction 1.0 keeps everything
    // deterministic: the same call reproduces the exact member set
    val ids1 = mix.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Sampling.mixCorporaPortable(
      Seq((en, "web", 0.7), (de, "curated", 1.0)), "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2)
  }

  test("weightedTopKPortable takes exactly k per stratum, deterministically, ranked by key") {
    val weighted = corpus.withColumn("w", col("doc_id") % 100 + 1)
    val s1 = Sampling.weightedTopKPortable(weighted, "lang", "doc_id", "w", 25)
    val rows = s1.collect()
    val byLang = rows.groupBy(_.getString(0))
    assert(byLang.keySet === Set("en", "de"))
    assert(byLang.values.forall(_.length === 25))
    // within a stratum, rn follows (aes_key, id) ascending
    byLang.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(3))
      val keys = sorted.map(r => (r.getDouble(2), r.getLong(1))).toSeq
      assert(keys === keys.sorted)
    }
    // deterministic across runs
    val s2 = Sampling.weightedTopKPortable(weighted, "lang", "doc_id", "w", 25)
    assert(s2.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      rows.map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("weightedTopKPortable favors heavy rows: E[inclusion] tracks weight") {
    // two weight classes, 100x apart, split WITHIN each lang stratum
    // (lang follows doc_id parity, so key off doc_id/2's parity)
    val weighted = corpus.withColumn("w",
      when((col("doc_id") / 2).cast("long") % 2 === 0, 100.0).otherwise(1.0))
    val picked = Sampling.weightedTopKPortable(weighted, "lang", "doc_id", "w", 50)
      .collect().map(_.getLong(1))
    val heavy = picked.count(i => (i / 2) % 2 == 0)
    assert(heavy > 85, s"heavy rows picked $heavy of 100 — weighting not applied?")
  }

  test("weightedTopKPortable fails fast on null/zero/negative weights") {
    // a zero weight means +Inf key (row silently never sampled), a
    // negative weight a key that ranks FIRST (selection inverts), null a
    // dropped row — all contract violations that must raise, not skew
    for (bad <- Seq(lit(0.0), lit(-1.5), lit(null).cast("double"))) {
      val weighted = corpus.withColumn("w",
        when(col("doc_id") === 7, bad).otherwise(lit(1.0)))
      val e = intercept[Exception] {
        Sampling.weightedTopKPortable(weighted, "lang", "doc_id", "w", 5).collect()
      }
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(e).exists(_.getMessage != null) &&
        causes(e).map(c => Option(c.getMessage).getOrElse("")).mkString
          .contains("weight must be > 0"), s"wrong error for $bad: $e")
    }
    // the guard costs nothing on the valid path: same selection as before
    val weighted = corpus.withColumn("w", col("doc_id") % 100 + 1)
    assert(Sampling.weightedTopKPortable(weighted, "lang", "doc_id", "w", 5)
      .count() === 10L)
  }

  test("decontaminate removes exactly the blocklisted contents") {
    val block = corpus.filter(col("doc_id") < 10).select(col("text"))
    val clean = Dedup.decontaminate(corpus, block)
    assert(clean.count() === 1990L)
    assert(clean.filter(col("doc_id") < 10).count() === 0L)
  }

  test("lrQualitySelect learns to rank target-like raw docs above junk") {
    import spark.implicits._
    // positives share the alpha/beta vocabulary; the raw pool has two
    // target-like docs and two junk docs — after 3 full-batch rounds
    // the classifier must rank both target-like docs above both junk
    // docs (it has seen the junk vocabulary only with label 0)
    val target = Seq(
      (0L, "alpha beta alpha beta"),
      (1L, "beta alpha beta alpha alpha"),
      (2L, "alpha alpha beta")).toDF("doc_id", "text")
    val raw = Seq(
      (10L, "alpha beta alpha"),
      (11L, "beta alpha"),
      (12L, "zulu yankee xray zulu"),
      (13L, "xray xray yankee")).toDF("doc_id", "text")
    val got = Sampling.lrQualitySelect(target, raw, "doc_id", "text",
        nBuckets = 16, lrate = 0.5, rounds = 3, keep = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === Set(10L, 11L, 12L, 13L))
    assert(math.min(got(10L), got(11L)) > math.max(got(12L), got(13L)),
      s"target-like must outscore junk: $got")
    // scores are probabilities, and the quantized trajectory keeps them
    // in (0, 1) strictly
    assert(got.values.forall(s => s > 0.0 && s < 1.0))
  }

  test("dsirSelect ranks target-like raw docs above off-distribution ones") {
    import spark.implicits._
    val target = Seq((0L, "alpha beta alpha beta alpha"))
      .toDF("doc_id", "text")
    val raw = Seq(
      (10L, "alpha beta alpha"),      // matches the target distribution
      (11L, "alpha zulu zulu"),       // partial
      (12L, "zulu yankee xray zulu")  // off-distribution
    ).toDF("doc_id", "text")
    val got = Sampling.dsirSelect(target, raw, "doc_id", "text",
        nBuckets = 16, keep = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // the purely-target-like doc wins outright and strictly outscores
    // both mixed docs (the relative order of 11 vs 12 is a smoothing
    // artifact at this fixture size — not the property DSIR promises)
    assert(got.head._1 === 10L, s"order: ${got.toSeq}")
    val scores = got.toMap
    assert(scores(10L) > scores(11L) && scores(10L) > scores(12L))
    assert(scores(10L) > 0 && scores(12L) < 0) // signs: toward/away from target
  }

  test("perplexityBucketSample: per-language terciles, head kept whole, tail sampled thin") {
    import spark.implicits._
    // 2 langs x 90 docs with distinct strictly-increasing scores: the
    // within-language terciles are exact, so bucket membership is
    // fully determined (30/30/30 per language)
    val scored = (for {
      (lang, base) <- Seq(("en", 0L), ("fr", 1000L))
      i <- 0 until 90
    } yield (base + i, lang, i.toDouble / 100.0)).toDF("doc_id", "lang", "s")
    val kept = Sampling.perplexityBucketSample(scored, "lang", "doc_id", "s")
      .collect()
    val byBucket = kept.groupBy(_.getAs[String]("ppl_bucket"))
      .view.mapValues(_.length).toMap
    // head keeps ALL 30 per language (frac 1.0); middle/tail are
    // md5-thinned below their bucket sizes
    assert(byBucket("head") === 60)
    assert(byBucket.getOrElse("middle", 0) < 60 && byBucket.getOrElse("middle", 0) > 0)
    assert(byBucket.getOrElse("tail", 0) < byBucket("middle"))
    // bucket assignment respects the per-language terciles: scores in
    // the top third (i >= 60) are head, bottom third (i < 30) tail
    kept.foreach { r =>
      val i = (r.getAs[Double]("s") * 100).round
      val b = r.getAs[String]("ppl_bucket")
      if (i >= 60) assert(b === "head")
      else if (i < 30) assert(b === "tail", s"doc $i in $b")
    }
    // deterministic: a second invocation returns the identical set
    val again = Sampling.perplexityBucketSample(scored, "lang", "doc_id", "s")
      .collect().map(_.getAs[Long]("doc_id")).sorted
    assert(again === kept.map(_.getAs[Long]("doc_id")).sorted)
  }

  test("lrFeatures narrow histogram form matches the explode+agg reference on real text") {
    import org.apache.spark.sql.functions._
    // parity proof for the r17 HashedBow-based feature builder: both
    // forms over real corpus documents must agree row for row — same
    // (bs, xs) arrays in the same bucket order, same doc set.
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val labeled = docs.filter(col("doc_id") < 100)
      .select(col("doc_id"), lit(1.0).as("y"), col("text").as("t"))
      .unionByName(docs.filter(col("doc_id") >= 100)
        .select(col("doc_id"), lit(0.0).as("y"), col("text").as("t")))
    def featMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getSeq[Long](2), r.getSeq[Double](3)))).toMap
    val narrow = featMap(
      Sampling.lrFeatures(labeled, "doc_id", 64, barrier = false)
        .select("doc_id", "y", "bs", "xs"))
    val reference = featMap(
      Sampling.lrFeaturesExplode(labeled, "doc_id", 64)
        .select("doc_id", "y", "bs", "xs"))
    assert(narrow.nonEmpty)
    assert(narrow === reference)
  }
}
