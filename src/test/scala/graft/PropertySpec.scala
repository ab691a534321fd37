package graft

import org.apache.spark.sql.functions._
import scala.util.Random

import graft.functions.Winds
import graft.operators.Validation

/** Property tests (SURVEY.md §5.3), seeded-random style (the
  * scalatest/scalacheck bridge isn't in the offline cache): totality and
  * monotonicity of Beaufort bucketing, dedup idempotence, gate soundness.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)
  private val labels = Winds.beaufortScale.map(_._2) :+ Winds.beaufortTop

  test("beaufort bucketing is total and monotone in speed") {
    for (_ <- 1 to 10) {
      val speeds = Seq.fill(25)(rnd.nextDouble() * 65.0 - 5.0).sorted
      val idx = speeds.toDF("s").select(Winds.windStrength(col("s")))
        .collect().map(r => labels.indexOf(r.getString(0))).toSeq
      assert(idx.forall(_ >= 0), s"unmapped speed in $speeds")
      assert(idx.zip(idx.tail).forall { case (a, b) => a <= b },
        s"non-monotone buckets $idx for $speeds")
    }
  }

  test("dropDuplicates is idempotent and matches Scala distinct") {
    for (_ <- 1 to 10) {
      val xs = List.fill(30)(rnd.nextInt(6))
      val once = xs.toDF("x").dropDuplicates()
      val twice = once.dropDuplicates()
      assert(once.collect().map(_.getInt(0)).sorted.toSeq ===
        twice.collect().map(_.getInt(0)).sorted.toSeq)
      assert(once.count() === xs.distinct.size)
    }
  }

  test("validation gate passes iff no violating row exists") {
    val checks = Seq(Validation.InRange("t", 0, 10): Validation.Check)
    for (_ <- 1 to 10) {
      val ts = List.fill(10)(rnd.nextDouble() * 20.0 - 5.0)
      val hasViolation = ts.exists(t => t < 0 || t > 10)
      val threw =
        try { Validation.enforce(ts.toDF("t"), checks); false }
        catch { case _: Validation.ValidationException => true }
      assert(threw === hasViolation, s"gate mismatch for $ts")
    }
  }

  test("topK aggregator equals sorted-take for random data and any k") {
    implicit val ord: Ordering[TopKRec] = Ordering.by(r => (-r.v, r.g))
    for (trial <- 1 to 5) {
      val k = trial
      val data = List.fill(60)(TopKRec(s"g${rnd.nextInt(3)}", rnd.nextInt(100)))
      val got = spark.createDataset(data).repartition(7)
        .groupByKey(_.g)
        .agg(graft.functions.TypedAggs.topK[TopKRec](k).toColumn.name("top"))
        .collect().toMap
      val expect = data.groupBy(_.g).view.mapValues(_.sorted(ord).take(k)).toMap
      assert(got.view.mapValues(_.toList).toMap === expect.toMap, s"k=$k")
    }
  }

  test("portableUnit is in [0,1) for arbitrary ids incl. negatives") {
    val ids = List.fill(50)(rnd.nextLong()) ++ List(0L, -1L, Long.MinValue, Long.MaxValue)
    val us = ids.toDF("id")
      .select(graft.operators.Sampling.portableUnit(col("id"), "x").as("u"))
      .collect().map(_.getDouble(0))
    assert(us.forall(u => u >= 0.0 && u < 1.0))
    // deterministic: same ids, same values
    val us2 = ids.toDF("id")
      .select(graft.operators.Sampling.portableUnit(col("id"), "x").as("u"))
      .collect().map(_.getDouble(0))
    assert(us.toSeq === us2.toSeq)
  }

  test("fingerprintNearDups finds EVERY pair within the pigeonhole bound") {
    // pigeonhole: hamming <= bands-1 guarantees a shared band, and the
    // anchor pattern assigns every non-minimal member of a dup set — so
    // any doc with hamming <= maxHamming to a SMALLER id must be
    // assigned (to that doc's anchor or a better one)
    for (trial <- 1 to 5) {
      val base = List.fill(20)(rnd.nextLong())
      val planted = base.zipWithIndex.collect { case (h, i) if i % 3 == 0 =>
        h ^ (1L << rnd.nextInt(64)) // hamming 1 from base(i) (or 0 if same bit twice)
      }
      val fps = (base ++ planted).zipWithIndex.map { case (h, i) => (i.toLong, h) }
      val out = graft.operators.Dedup
        .fingerprintNearDups(fps.toDF("doc_id", "simhash"), 16, 4, 3)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      // every doc with a smaller-id neighbor within the bound must appear
      val mustAssign = fps.filter { case (id, h) =>
        fps.exists { case (id2, h2) => id2 < id && java.lang.Long.bitCount(h ^ h2) <= 3 }
      }.map(_._1).toSet
      assert(mustAssign.subsetOf(out.keySet),
        s"missed assignments: ${mustAssign -- out.keySet}")
      assert(out.values.forall(_ <= 3))
    }
  }

  test("connectedComponents matches a union-find reference on random graphs") {
    def unionFind(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
      // canonical label = min id of the component
      nodes.groupBy(find).flatMap { case (_, c) => c.map(_ -> c.min) }
    }
    for (trial <- 1 to 5) {
      val n = 12 + trial * 3
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodes = edges.flatMap(t => Seq(t._1, t._2)).toSet
      val expected = unionFind(nodes, edges)
      val got = graft.operators.Dedup.connectedComponents(
          edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"trial $trial: edges=$edges")
    }
  }

  test("native as-of join matches a reference model on random frames " +
      "(duplicate right timestamps, empty partitions, one-sided keys)") {
    // r6 fallback-completeness property: 10 trials x 30 left rows = 300
    // random cases over a SMALL (key, ts) domain, so duplicate right
    // timestamps per key and keys existing on only one side are frequent;
    // repartition counts exceed row counts, so empty partitions always
    // exist on both sides of the zipPartitions merge
    for (trial <- 1 to 10) {
      val nKeys = 1 + rnd.nextInt(5)
      val lRows = Seq.tabulate(30)(i =>
        (i.toLong, rnd.nextInt(nKeys).toLong, rnd.nextInt(8).toLong))
      val rRows = Seq.tabulate(30)(i =>
        (1000L + i, rnd.nextInt(nKeys + 2).toLong, rnd.nextInt(8).toLong))
      val left = lRows.toDF("event_id", "user_id", "err_us").repartition(37)
      val right = rRows.toDF("r_id", "s_user", "signup_us").repartition(41)
      val got = graft.operators.Joins.asOfJoinNative(
          left, right, "user_id", "err_us", "s_user", "signup_us")
        .select("event_id", "user_id", "err_us", "r_id", "signup_us")
        .collect()
      assert(got.length === 30, s"trial $trial: fan-out or row loss")
      got.foreach { r =>
        val (id, k, ts) = (r.getLong(0), r.getLong(1), r.getLong(2))
        // reference model: the right rows of the same key at the max
        // rts <= lts (payload among ties is any of that set — the
        // window form pins only the timestamp too)
        val cands = rRows.filter { case (_, rk, rts) => rk == k && rts <= ts }
        if (cands.isEmpty) {
          assert(r.isNullAt(3) && r.isNullAt(4), s"trial $trial id=$id: expected no match")
        } else {
          val best = cands.map(_._3).max
          assert(!r.isNullAt(4) && r.getLong(4) === best,
            s"trial $trial id=$id: got ts ${r.get(4)}, want $best")
          val tieIds = cands.filter(_._3 == best).map(_._1).toSet
          assert(tieIds.contains(r.getLong(3)),
            s"trial $trial id=$id: matched r_id ${r.getLong(3)} not among ties $tieIds")
        }
      }
      // and the matched TIMESTAMP agrees with the composed window form
      // (asOfBackward over the unioned frames, right rows sorting first
      // on ties via a negative tiebreak id — the q22 construction)
      val unioned = lRows.map { case (id, k, ts) => (id, k, ts, false) }
        .++(rRows.map { case (id, k, ts) => (-id, k, ts, true) })
        .toDF("uid", "user_id", "us", "is_right")
      val viaWindow = graft.operators.Joins.asOfBackward(
          unioned, "user_id", "us", "uid", col("is_right"), "asof")
        .filter(!col("is_right"))
        .select("uid", "asof")
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      got.foreach { r =>
        val winTs = viaWindow(r.getLong(0))
        val natTs = if (r.isNullAt(4)) None else Some(r.getLong(4))
        assert(natTs === winTs,
          s"trial $trial id=${r.getLong(0)}: native $natTs vs window $winTs")
      }
    }
  }

  test("pointer-jumping closure: log-round convergence on chains, union-find parity") {
    // a 300-node path has diameter 299: plain min-label propagation
    // moves the min one hop per round and must exceed a 12-round
    // budget, while the path-halving term covers distance 2^r — the
    // SAME budget suffices (log2(300) ~ 8.2 plus slack)
    val chain = (0L until 299L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.connectedComponents(chain, "a", "b", maxIter = 12)
    }
    val cc = graft.operators.Dedup.connectedComponents(
      chain, "a", "b", maxIter = 12, pointerJump = true)
    val labs = cc.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labs.length === 300)
    assert(labs.forall(_._2 == 0L), "all chain nodes must collapse to cluster 0")
    // and on random graphs the jumped variant matches union-find exactly
    def unionFind(nodes: Set[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
      nodes.groupBy(find).flatMap { case (_, c) => c.map(_ -> c.min) }
    }
    for (trial <- 1 to 3) {
      val n = 15 + trial * 5
      val edges = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodes = edges.flatMap(t => Seq(t._1, t._2)).toSet
      val got = graft.operators.Dedup.connectedComponents(
          edges.toDF("a", "b"), "a", "b", pointerJump = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === unionFind(nodes, edges), s"trial $trial: edges=$edges")
    }
  }

  test("minhash jaccard estimate tracks exact jaccard") {
    import graft.plans.MinHashSig.minhash_sig_est
    for (trial <- 1 to 5) {
      val common = Seq.tabulate(20)(i => s"c$i")
      val aOnly = Seq.tabulate(trial * 4)(i => s"a$i")
      val bOnly = Seq.tabulate(trial * 4)(i => s"b$i")
      val exact = common.size.toDouble / (common.size + aOnly.size + bOnly.size)
      val df = Seq((common ++ aOnly, common ++ bOnly)).toDF("a", "b")
      val est = df.select(minhash_sig_est(col("a"), col("b"), 256)).head().getDouble(0)
      assert(math.abs(est - exact) < 0.15, s"estimate $est vs exact $exact")
    }
  }

  test("leakage-safe split: no near-dup edge straddles train and eval") {
    // THE guard property q141 exists for: both endpoints of every LSH
    // near-dup assignment (and hence, through the closure, every
    // transitive dup pair) draw the same split — on real testdata with
    // real planted dups, not a toy fixture
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val split = SparkEntry.queries("q141_leakage_split")(spark, sf)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val docs = graft.sources.Tables.documents(spark, sf)
    val edges = graft.operators.Curation.lshAssignments(docs)
      .select("doc_id", "rep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty, "testdata should contain planted near-dups")
    val straddling = edges.filter { case (a, b) => split(a) != split(b) }
    assert(straddling.isEmpty,
      s"near-dup pairs split across train/eval: ${straddling.take(5).toSeq}")
    // and both splits are actually populated (the draw is not degenerate)
    assert(split.values.toSet === Set("train", "eval"))
  }

  test("ensemble stage-1 drops into curate: survivors are exactly ensemble-kept docs " +
      "minus downstream stages") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/documents.parquet").exists())
    val docs = graft.sources.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") >= 250)
    val target = docs.filter(col("doc_id") < 250)
    val kept = graft.operators.TextAnalysis.ensembleQualityGate(corpus, target)
      .filter(col("keep")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty, "the ensemble gate should keep some corpus docs")
    val survivors = graft.operators.Curation.curate(corpus, target,
        stage1 = graft.operators.Curation.ensembleGate(target))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // stages 2-5 only ever DROP: every survivor cleared the ensemble
    assert(survivors.subsetOf(kept))
    assert(survivors.nonEmpty)
    // and the gate actually bites vs the rule-only stage-1
    val ruleSurvivors = graft.operators.Curation.curate(corpus, target)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors !== ruleSurvivors)
  }

  test("segmented span merge: bit-equal to the flat window, bounded per-task groups " +
      "on a planted mega-dup doc") {
    // the q139 skew guard: one pathological document that is a single
    // giant repeated span (every position marked) funnels all its marked
    // positions through ONE gaps-and-islands task under the flat window;
    // the segment-salted two-level merge bounds every level-1 task group
    // by segmentTokens and must still produce the IDENTICAL span set
    val k = 5
    val seg = 64
    val boiler = Seq.fill(120)("dup padding tokens repeat endlessly").mkString(" ")
    val normal = (0 until 30).map { i =>
      (100L + i, (0 until 40).map(j => s"w${rnd.nextInt(50)}_$i" + (j % 3)).mkString(" "))
    }
    // two copies of the boilerplate (ids 0, 1) -> every gram duplicated;
    // plus normal docs sharing a smaller pasted phrase with each other
    val docs = ((0L -> boiler) +: (1L -> boiler) +: normal).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "span_start").collect().map(_.toSeq).toSeq
    val flat = canon(graft.operators.Dedup.duplicatedSpans(docs, k))
    val salted = canon(graft.operators.Dedup.duplicatedSpans(docs, k, segmentTokens = seg))
    assert(flat === salted)
    assert(flat.nonEmpty)
    // the mega-dup doc's marked positions exceed one segment many times
    // over, and the guard's level-1 group bound holds structurally:
    // no (doc_id, seg) group can exceed segmentTokens marked positions
    val megaSpan = flat.filter(_.head == 0L)
    assert(megaSpan.size === 1, "the boilerplate doc should be one maximal span")
    assert(megaSpan.head(3).asInstanceOf[Long] > seg * 3,
      "planted doc must be large enough to straddle several segments")
    // scrub parity through the segmented path too
    val scrubFlat = graft.operators.Dedup.scrubDuplicatedSpans(docs, k)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val scrubSalted = graft.operators.Dedup.scrubDuplicatedSpans(docs, k, segmentTokens = seg)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(scrubFlat === scrubSalted)
  }
}
