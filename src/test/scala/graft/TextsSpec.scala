package graft

import org.apache.spark.sql.functions._
import graft.functions.Texts

class TextsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empty tokens from trailing/double spaces") {
    val got = Seq("a b  c ").toDF("t")
      .select(Texts.tokens(col("t"))).head().getSeq[String](0)
    assert(got === Seq("a", "b", "c"))
  }

  test("repeatedSegmentScrub removes exactly the cross-doc repeated segments") {
    import graft.operators.TextAnalysis
    // 16-token boilerplate banner shared by docs 0 and 1; unique tails
    val banner = (1 to 16).map(i => s"cookie$i").mkString(" ")
    val docs = Seq(
      (0L, s"$banner alpha beta gamma"),
      (1L, s"$banner delta epsilon"),
      (2L, "completely unrelated text")).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSegmentScrub(docs, segTokens = 16, minDocs = 2L)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(0L).getAs[Long]("n_segments") === 2L)
    assert(out(0L).getAs[Long]("n_boilerplate") === 1L)
    assert(out(2L).getAs[Long]("n_boilerplate") === 0L)
    // scrubbed doc 0 reassembles to just its unique tail
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta gamma".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(out(0L).getAs[String]("scrubbed_hash") === expected)
  }

  test("bigramLmScore matches a hand-computed add-one-smoothed model") {
    import graft.operators.TextAnalysis
    // corpus: "a b" x2, "a c" x1, "d" (no bigram, filtered out)
    val docs = Seq(
      (0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "d")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(docs)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(3L)) // single-token doc has no bigrams
    // vocab V = {a,b,c,d} = 4; C(a)=3 (corpus unigram frequency)
    // P(b|a) = (2+1)/(3+4), P(c|a) = (1+1)/(3+4)
    val pAB = math.log(3.0 / 7.0)
    val pAC = math.log(2.0 / 7.0)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L).getAs[Long]("n_bigrams") === 1L)
    assert(out(0L).getAs[Double]("lm_score") === r6(pAB))
    assert(out(1L).getAs[Double]("lm_score") === r6(pAB))
    assert(out(2L).getAs[Double]("lm_score") === r6(pAC))
    // the rarer continuation scores lower — the filtering decision
    assert(out(2L).getAs[Double]("lm_score") < out(0L).getAs[Double]("lm_score"))
  }

  test("shingles produce n-grams; short docs yield empty array") {
    val df = Seq("a b c d", "a").toDF("t")
    val got = df.select(Texts.shingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq())
  }

  test("langId picks marker-lexicon argmax, und on no hits") {
    val df = Seq(
      "the cat is on the mat",
      "el gato es un animal en la casa",
      "xyzzy plugh").toDF("t")
    val got = df.select(Texts.langId(col("t"))).collect().map(_.getString(0))
    assert(got(0) === "en")
    assert(got(1) === "es")
    assert(got(2) === "und")
  }

  test("fingerprint is SHA-256 hex") {
    val got = Seq("abc").toDF("t")
      .select(Texts.fingerprintSha(col("t"))).head().getString(0)
    assert(got === "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("regexTokens splits words, digit runs, and punctuation") {
    val got = Seq("Hello, world42! x").toDF("t")
      .select(Texts.regexTokens(col("t"))).head().getSeq[String](0)
    assert(got === Seq("hello", ",", "world", "42", "!", "x"))
  }

  test("minShingleFingerprint: equal docs collide, short docs are null") {
    val df = Seq("a b c d", "a b c d", "totally different words here", "a b").toDF("t")
    val fps = df.select(Texts.minShingleFingerprint(col("t"), 3)).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
    assert(fps(3) === None) // 2 tokens < shingle width 3
  }

  test("wordHitCount preserves multiplicity") {
    val got = Seq("the the a x").toDF("t")
      .select(Texts.wordHitCount(col("t"), Seq("the", "a"))).head().getInt(0)
    assert(got === 3)
  }

  test("bpeTrainMerges learns the canonical Sennrich merges") {
    import spark.implicits._
    // the worked example from the BPE paper: vocab {low:5, lower:2,
    // newest:6, widest:3} learns es(9), est(9), lo(7), low(7)
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((0L, words.mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.bpeTrainMerges(docs, nMerges = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "l", "o", "lo", 7L),
      (4, "lo", "w", "low", 7L)))
  }

  test("gopherQualityGate: each rule fires on its designed violation") {
    import spark.implicits._
    val mk = (id: Long, t: String) => (id, t, "en", "s", 0L)
    val fiftyGood = ("word " * 48).trim + " the of" // 50 words, 2 stopwords
    val docs = Seq(
      mk(0L, fiftyGood),                              // passes every rule
      mk(1L, "too short to pass the word count"),     // words_ok false
      mk(2L, ("a b " * 25).trim + " the of"),         // mean_word_len 1.2ish < 3
      mk(3L, (("## " * 50).trim + " the of"))         // symbols, no alpha majority
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.gopherQualityGate(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Boolean]("pass"), "the designed-good doc must pass")
    assert(got(0L).getAs[Long]("n_words") === 50L)
    assert(!got(1L).getAs[Boolean]("words_ok") && !got(1L).getAs[Boolean]("pass"))
    assert(!got(2L).getAs[Boolean]("mean_len_ok")) // mostly 1-char words
    assert(!got(3L).getAs[Boolean]("alpha_ok"))    // '##' words
    assert(!got(3L).getAs[Boolean]("symbol_ok"))   // 2 '#' per word
    assert(got(0L).getAs[Long]("stop_hits") >= 2L)
  }

  test("gopherQualityGate thresholds each symbol's ratio separately (Rae A.1)") {
    import spark.implicits._
    // 100 words with 6 '#' and 6 '...': per-symbol ratios 0.06 and 0.06
    // — the paper passes this doc; a SUMMED ratio (0.12 > 0.1) wrongly
    // failed it before the split into hash_ratio/ellipsis_ratio
    val bothUnder = ("w# " * 6 + "w... " * 6 + "word " * 86).trim + " the of"
    val hashOver = ("w## " * 30 + "word " * 68).trim + " the of" // hash 0.6 alone
    val docs = Seq((0L, bothUnder, "en", "s", 0L), (1L, hashOver, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.gopherQualityGate(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(0L).getAs[Double]("hash_ratio") === 0.06)
    assert(got(0L).getAs[Double]("ellipsis_ratio") === 0.06)
    assert(got(0L).getAs[Boolean]("symbol_ok"), "0.06 + 0.06 must PASS per-symbol")
    assert(got(0L).getAs[Boolean]("pass"))
    assert(got(1L).getAs[Double]("hash_ratio") === 0.6)
    assert(got(1L).getAs[Double]("ellipsis_ratio") === 0.0)
    assert(!got(1L).getAs[Boolean]("symbol_ok"))
  }

  test("bpeEncode applies learned merges in rank order, word by word") {
    import spark.implicits._
    // Sennrich merges (es, est, lo, low) applied to fresh words:
    //   "lowest" -> [low, est] (2), "low" -> [low] (1),
    //   "widest" -> [w, i, d, est] (4), "xesty" -> [x, est, y] (3):
    //   rank order matters — (e,s) then (es,t) builds est inside xesty
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"))
    val docs = Seq(
      (0L, "lowest low", "en", "s", 0L),
      (1L, "widest xesty", "en", "s", 0L),
      (2L, "", "en", "s", 0L)) // empty doc: no output row
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.operators.TextAnalysis.bpeEncode(docs, merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bpe_tokens"), r.getAs[String]("bpe_md5"))).toMap
    assert(got.keySet === Set(0L, 1L))
    assert(got(0L)._1 === 3L) // [low, est] + [low]
    assert(got(1L)._1 === 7L) // [w, i, d, est] + [x, est, y]
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got(0L)._2 === md5("low est low"))
    assert(got(1L)._2 === md5("w i d est x est y"))
  }

  test("bpeEncode native kernel matches the HOF recurrence on real corpus data") {
    // parity proof for graft.plans.BpeEncodeTokens: both forms over the
    // sf0.001 documents table under merges LEARNED from that corpus
    // (real rank interactions, multi-char symbols), plus the Sennrich
    // fixture's chained merges. Row-for-row identical (count + md5).
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val merges = graft.operators.TextAnalysis.bpeTrainMerges(docs, nMerges = 6)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val native = graft.operators.TextAnalysis.bpeEncode(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val hof = graft.operators.TextAnalysis.bpeEncodeHof(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(native.nonEmpty)
    assert(native === hof)
  }

  test("slidingChunks covers every token with the stride-overlap shape") {
    import spark.implicits._
    // 10 tokens, window 4, stride 3 -> starts 0,3,6,9:
    //   [t1..t4] [t4..t7] [t7..t10] [t10]
    val docs = Seq(
      (0L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"),
      (1L, "a b c"), // nt <= stride: exactly one chunk
      (2L, "")) // empty doc: no rows
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.slidingChunks(docs, window = 4, stride = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(got.keySet === Set(0L -> 0L, 0L -> 1L, 0L -> 2L, 0L -> 3L, 1L -> 0L))
    assert(got(0L -> 0L) === ((4L, md5("t1 t2 t3 t4"))))
    assert(got(0L -> 1L) === ((4L, md5("t4 t5 t6 t7"))))
    assert(got(0L -> 2L) === ((4L, md5("t7 t8 t9 t10"))))
    assert(got(0L -> 3L) === ((1L, md5("t10"))))
    assert(got(1L -> 0L) === ((3L, md5("a b c"))))
  }

  test("bpe merge rewrite is right-boundary-safe (no substring fusion)") {
    import spark.implicits._
    // corpus {ab x6, bc x10, abc x3}: round 1 merges (b,c) [count 13],
    // so "abc" becomes symbols [a, bc]; round 2 merges (a,b) [count 6].
    // A substring replace of " a b" would also fire on the PREFIX of
    // " a bc", minting a bogus "abc" symbol — the fold must leave
    // [a, bc] alone and fuse only real (a, b) pairs.
    val words = Seq.fill(6)("ab") ++ Seq.fill(10)("bc") ++ Seq.fill(3)("abc")
    val docs = Seq((0L, words.mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val merges = graft.operators.TextAnalysis.bpeTrainMerges(docs, nMerges = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(merges.toSeq === Seq((1, "b", "c", 13L), (2, "a", "b", 6L)))
    // the vocab proves the rewrite: "abc" must survive as {a, bc} —
    // weighted counts: ab 6, bc 10(+3 from abc) = 13, a 3; NO "abc"
    val vocab = graft.operators.TextAnalysis.bpeSubwordVocab(docs, 2, 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(vocab === Map("bc" -> 13L, "ab" -> 6L, "a" -> 3L))
  }

  test("thresholded decontamination counts distinct-gram overlap fractions exactly") {
    import spark.implicits._
    // eval holds one 6-token sentence (two distinct 5-grams).
    // doc 10: a 7-token quote of it inside unique text — its two
    //   eval grams out of many -> small fraction, kept at tau 0.5
    // doc 11: the eval sentence verbatim -> 2/2 grams hit, dropped
    // doc 12: disjoint text -> 0 hits
    val evalSlice = Seq((0L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "one two three alpha beta gamma delta epsilon zeta four five six"),
      (11L, "alpha beta gamma delta epsilon zeta"),
      (12L, "entirely different words with no overlap at all here"))
      .toDF("doc_id", "text")
    val got = graft.operators.Curation
      .thresholdedDecontamination(corpus, evalSlice, n = 5, tau = 0.5)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(4)))
      .toMap
    // doc 10: 12 tokens -> 8 distinct 5-grams, 2 contaminated, kept
    assert(got(10L) === ((8L, 2L, false)))
    // doc 11: 6 tokens -> 2 grams, both contaminated, dropped
    assert(got(11L) === ((2L, 2L, true)))
    // doc 12: 9 tokens -> 5 grams, none contaminated
    assert(got(12L) === ((5L, 0L, false)))
  }
}
