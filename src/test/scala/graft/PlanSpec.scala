package graft

/** Plan-shape regression guards (the properties PLANS.md documents):
  * losing any of these silently would be a scale regression even if
  * results stay correct.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q09 star join broadcasts all dimensions (no shuffle joins)") {
    val p = planOf("q09_revenue_by_region")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q09 fact scan prunes to the 3 needed columns") {
    val p = planOf("q09_revenue_by_region")
    val scanLine = p.linesIterator.find(l => l.contains("parquet") && l.contains("lineitem")).get
    assert(scanLine.contains("l_orderkey") && scanLine.contains("l_extendedprice"))
    assert(!scanLine.contains("l_comment") && !scanLine.contains("l_shipdate"))
  }

  test("q10 top-k prunes map-side: partial agg before the shuffle, no window sort") {
    val p = planOf("q10_topk_window")
    // bounded topK aggregator: partial + final ObjectHashAggregate around
    // the exchange — the shuffle carries <=k rows per (partition, group)
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2)
    assert(!p.contains("Window("), "full window sort would shuffle the whole table")
  }

  test("q47 pushes the date filter into the parquet scan") {
    val p = planOf("q47_pricing_summary")
    assert(p.contains("PushedFilters") && p.contains("LessThanOrEqual(l_shipdate"))
  }

  test("q01 aggregates partially before the exchange") {
    val p = planOf("q01_daily_agg")
    // partial + final pattern: two HashAggregates around one Exchange
    assert("HashAggregate".r.findAllIn(p).size >= 2)
    assert(p.contains("Exchange"))
  }

  test("q24 broadcasts the one-row query vector side") {
    assert(planOf("q24_cosine_topk").contains("BroadcastExchange"))
  }

  test("q27 operator contains no pairwise document self-join (anchor pattern)") {
    // the gate query is a verdict harness since r13 (it adds a CAPPED
    // exact-recall re-derivation); the plan contract is the OPERATOR's
    val p = operators.Dedup.minhashNearDups(
      sources.Tables.documents(spark, sf)).queryExecution.executedPlan.toString
    // the only joins are band-bucket anchor + fingerprint verification —
    // a pairwise self-join would show a join condition on doc_a/doc_b
    // ranges; structurally we assert there is no cartesian/NLJ fallback
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("q61 simhash near-dups use the anchor pattern (no bucket self-join)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    // the gate query is a verdict harness since r13 (its capped recall
    // re-derivation deliberately joins banded frames on a 300-doc cap);
    // the production plan contract is the OPERATOR's
    val qe = operators.Dedup.simhashNearDups(
      sources.Tables.documents(spark, sf), maxHamming = 3).queryExecution
    // anchor pattern: every join has an Aggregate on one side (the
    // bucket-anchor or the rep assignment) or joins candidates back to
    // the per-doc fingerprints on doc_id — a banded-vs-banded self-join
    // (the O(bucket^2) shape) would join two explode subtrees directly
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val joins = qe.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    val explodeBothSides = joins.count { j =>
      def hasExplode(pl: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
        pl.collectFirst { case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }.isDefined
      hasExplode(j.left) && hasExplode(j.right) &&
        j.left.collectFirst { case a: Aggregate => a }.isEmpty &&
        j.right.collectFirst { case a: Aggregate => a }.isEmpty
    }
    assert(explodeBothSides === 0,
      "banded-vs-banded self-join found — quadratic on skewed buckets")
  }

  test("q76 tokenizes the corpus exactly once (df via window, no tf recompute)") {
    val p = planOf("q76_tfidf")
    assert("Generate explode".r.findAllIn(p).size === 1,
      "tf subtree planned more than once — the df branch recomputes tokenization")
  }

  test("q89 portable minhash uses the anchor pattern (no banded self-join)") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val qe = SparkEntry.queries("q89_minhash_lsh_portable")(spark, sf).queryExecution
    val joins = qe.optimizedPlan.collect { case j: Join => j }
    assert(joins.nonEmpty)
    // every band-key join must have the anchor Aggregate on one side
    val bandJoins = joins.filter(_.condition.exists(_.references.exists(_.name == "bk")))
    assert(bandJoins.forall(j =>
      j.left.collectFirst { case a: Aggregate => a }.isDefined ||
        j.right.collectFirst { case a: Aggregate => a }.isDefined))
  }

  test("q90 window runs over the pre-aggregated frame, not the raw scan") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val qe = SparkEntry.queries("q90_rank_dense")(spark, sf).queryExecution
    val windows = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty)
    assert(windows.forall(_.child.collectFirst { case a: Aggregate => a }.isDefined),
      "window input must be the groupBy(flag, quantity) aggregate")
  }

  test("q72 derives percent_rank without any window over the raw table") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("q72_percent_rank")(spark, sf).queryExecution
    assert(qe.optimizedPlan.collectFirst { case w: LWindow => w }.isEmpty,
      "q72 must use the topK aggregator + derived pr/cd, not a window sort")
  }

  test("ANN top-k paths (q29, q43, q99) use the bounded aggregator, not a probe window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    for (name <- Seq("q29_ann_lsh", "q43_ivf_ann", "q99_ivf_recall")) {
      val qe = SparkEntry.queries(name)(spark, sf).queryExecution
      assert(qe.optimizedPlan.collectFirst { case w: LWindow => w }.isEmpty,
        s"$name: a window partitioned by probe_id sorts the whole candidate set " +
          "on #probes tasks — use topKPerProbe")
    }
  }

  test("co-bucketed tables join with no shuffle exchange; unbucketed control shuffles") {
    import org.apache.spark.sql.functions.col
    // q104 writes graft_bkt_customer / graft_bkt_orders bucketed(8) on
    // the join key as a side effect
    SparkEntry.queries("q104_bucketed_join")(spark, sf).count()
    val bucketed = operators.Joins.bucketedJoin(
      spark, "graft_bkt_customer", "graft_bkt_orders", "c_custkey")
    val p = bucketed.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"))
    assert(!p.contains("Exchange"),
      "bucketed-on-key tables must satisfy the join distribution without a shuffle")
    // control: identical join on the raw (unbucketed) parquet DOES pay
    // a shuffle on both sides — the cost bucketing moved to load time
    val cust = sources.Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment"))
    val ord = sources.Tables.orders(spark, sf)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val control = cust.hint("merge").join(ord, Seq("c_custkey"))
    assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("partitioned fact scan is dynamically pruned by the dim filter at runtime") {
    import org.apache.spark.sql.functions.col
    // q116 writes graft_part_customer partitioned on c_nationkey as a
    // side effect; force execution so the scan node is final
    val df = SparkEntry.queries("q116_dynamic_pruning")(spark, sf)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      "partitioned-scan ⋈ filtered-broadcast-dim must inject a runtime partition filter")
    // control: the same scan with no join-side filter lists every partition
    val control = spark.table("graft_part_customer").groupBy(col("c_nationkey")).count()
    control.count()
    assert(!control.queryExecution.executedPlan.toString.contains("dynamicpruningexpression"))
  }

  test("aggregation on the bucketed key also needs no exchange") {
    import org.apache.spark.sql.functions.{col, sum}
    // the bucketed layout pays its shuffle ONCE at write; every join AND
    // aggregation on the bucket key afterwards is exchange-free
    val ord = sources.Tables.orders(spark, sf)
      .select(col("o_custkey").as("c_custkey"), col("o_totalprice"))
    operators.Load.bucketedTable(ord, "graft_bkt_agg", "c_custkey", 8)
    val agg = spark.table("graft_bkt_agg")
      .groupBy(col("c_custkey")).agg(sum(col("o_totalprice")))
    val p = agg.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      "groupBy on the bucketed key must satisfy its distribution from the layout")
    // control: same aggregation over raw parquet shuffles
    val control = ord.groupBy(col("c_custkey")).agg(sum(col("o_totalprice")))
    assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("runtime bloom filter prunes the probe side of a shuffle join") {
    import org.apache.spark.sql.functions.col
    // DPP's row-level sibling: when a selective dim filter feeds a
    // SHUFFLE join, Catalyst builds a bloom filter over the surviving
    // build keys and pushes might_contain onto the probe-side scan —
    // at 100 TB most probe rows die before the exchange. Thresholds are
    // sized for real tables; lower them to demonstrate at test scale.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = sources.Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
      val dim = sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      val j = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"expected an injected bloom-filter runtime filter, got:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("native as-of join plans two-pointer merge: no window, no union blowup") {
    val df = SparkEntry.queries("q121_asof_native")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), "must plan through AsOfJoinExec")
    assert(!p.contains("Window"), "native operator must not fall back to the window composition")
    assert(!p.contains("Union"))
    // exactly the SMJ-style cost: one hash exchange per side
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
  }

  test("native as-of join over bucketed-sorted layout plans with zero exchange") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    // both sides written bucketed on the join key and sorted (key, ts):
    // the as-of exec's ClusteredDistribution comes from the bucketing
    // metadata — a 100 TB recurring as-of enrichment pays NO shuffle
    val ev = sources.Tables.events(spark, sf)
    operators.Load.bucketedTable(
      ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("err_us")),
      "graft_bkt_errors", "user_id", 4, Seq("user_id", "err_us"))
    operators.Load.bucketedTable(
      ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), unix_micros(col("ts")).as("signup_us")),
      "graft_bkt_signups", "s_user", 4, Seq("s_user", "signup_us"))
    val joinedBkt = operators.Joins.asOfJoinNative(
      spark.table("graft_bkt_errors"), spark.table("graft_bkt_signups"),
      "user_id", "err_us", "s_user", "signup_us")
    val p = joinedBkt.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"))
    assert(!p.contains("Exchange"),
      "bucketed-on-key layouts must satisfy the as-of distribution without a shuffle")
    // and the result matches the shuffled plan over the raw frames
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("err_us"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), unix_micros(col("ts")).as("signup_us"))
    val control = operators.Joins.asOfJoinNative(
      errors, signups, "user_id", "err_us", "s_user", "signup_us")
    assert(joinedBkt.select("event_id", "signup_us").collect().toSet ===
      control.select("event_id", "signup_us").collect().toSet)
  }

  test("q124 weighted sample prunes map-side: bounded aggregator, no per-stratum window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("q124_weighted_sample")(spark, sf).queryExecution
    assert(qe.optimizedPlan.collectFirst { case w: LWindow => w }.isEmpty,
      "a row_number window per lang sorts the whole corpus on #langs tasks")
    assert("ObjectHashAggregate".r.findAllIn(qe.executedPlan.toString).size >= 2,
      "topK aggregator must plan partial + final")
  }

  test("q125 CMS estimate broadcasts the sketch (depth x width rows, never shuffled)") {
    val p = planOf("q125_cms_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q126 funnel is one pass over events: no joins, no per-stage rescans") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val qe = SparkEntry.queries("q126_funnel")(spark, sf).queryExecution
    assert(qe.optimizedPlan.collectFirst { case j: Join => j }.isEmpty,
      "the join-per-stage funnel shape rescans and reshuffles the fact per step")
    assert("events\\.parquet".r.findAllIn(qe.executedPlan.toString).size === 1,
      "events must be scanned exactly once")
  }

  test("q127 concurrency sweep never plans a global single-partition window") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("q127_concurrency")(spark, sf).queryExecution
    val globalWindows = qe.optimizedPlan.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }
    assert(globalWindows.isEmpty,
      "running concurrency must be the distributed prefix sum, not SUM() OVER (ORDER BY t)")
  }

  test("q136 curation pipeline: no cartesian product, eval grams broadcast") {
    val p = planOf("q136_curation_pipeline")
    // the six-stage composition must stay join-shaped: a cartesian
    // anywhere means a stage lost its equi-join key
    assert(!p.contains("CartesianProduct"),
      "curation pipeline plans a cartesian product")
    // the decontamination stage joins corpus grams against the SMALL
    // eval-gram set — that side must broadcast, never shuffle the corpus
    assert(p.contains("BroadcastHashJoin"),
      "eval-gram side of the decontamination join is not broadcast")
  }

  test("pqTopK scans the encoded corpus ONCE for a 50-probe batch") {
    // the serving shape: per-probe LUTs ride in on one broadcast side, so
    // probe-batch size never multiplies corpus scans — the previous
    // one-branch-per-probe plan scanned the codes O(probes) times
    val e = sources.Tables.embeddings(spark, sf)
    val cbs = operators.Similarity.ensurePqCodebooks(e, s"pq-planspec:$sf", 8, 16, 64)
    val df = operators.Similarity.pqTopK(e, 0L until 50L, k = 5, codebooks = Some(cbs))
    val p = df.queryExecution.executedPlan.toString
    val scanLines = p.linesIterator.count(l => l.contains("FileScan") && l.contains("embeddings"))
    assert(scanLines === 1, s"expected exactly one embeddings scan, got $scanLines")
  }

  test("q138 semantic dedup forms within-cluster pairs only (no cross-cluster candidates)") {
    // SemDeDup's candidate set is the pair join keyed on the k-means
    // cell — no cartesian/nested-loop anywhere means no cross-cluster
    // pair can exist in the plan, and the equi-join keyed on cell is
    // the only pair-former
    val p = planOf("q138_semantic_dedup")
    assert(!p.contains("CartesianProduct"), "cross-cluster cartesian pairing")
    assert(!p.contains("BroadcastNestedLoopJoin"), "non-equi pair join")
    val pairJoins = p.linesIterator.filter(l =>
      (l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")) && l.contains("vec_a")).toSeq
    assert(pairJoins.nonEmpty, "expected the within-cell pair join")
    assert(pairJoins.forall(_.contains("cell")),
      s"pair join not keyed on the cluster cell:\n${pairJoins.mkString("\n")}")
  }

  test("q142 span scrub never explodes or shuffles tokens") {
    // the token side stays array-valued end-to-end (narrow positional
    // filter lambda): every generator in the plan must be the gram-side
    // md5-fingerprint posexplode (it appears twice — the grams subtree
    // feeds both the frequency aggregate and the join-back probe). If
    // the scrub ever regressed to the explode-tokens-and-anti-join
    // shape, a raw-token Generate (no md5 in its expression) would
    // appear and the corpus's every token would ride a shuffle
    val p = planOf("q142_span_scrub")
    val generates = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(generates.nonEmpty, "expected the gram-side Generate")
    assert(generates.forall(_.contains("xxhash64")),
      s"a non-fingerprint generator leaks tokens:\n${generates.mkString("\n")}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q153 export reads only the committed shard table — curation never re-runs") {
    // the flagship's serving contract: the pipeline (curate -> pack ->
    // shuffle -> shard write) committed once; the registered query is
    // the read-back aggregate. A documents FileScan appearing here
    // means re-invocation re-pays the whole pipeline
    val p = planOf("q153_training_export")
    assert(!p.contains("documents"), s"export read-back re-scans the corpus:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan"))
    assert(scans === 1, s"expected exactly one shard-table scan, got $scans")
  }

  test("q160 token export reads only the committed shard table") {
    // same serving contract as q153, token-granular: the BPE train +
    // encode + materialize + shuffle chain committed once; the
    // registered query reads the artifact back. A documents scan here
    // means the whole tokenizer pipeline re-runs per invocation
    val p = planOf("q160_token_shards")
    assert(!p.contains("documents"), s"token export re-scans the corpus:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan"))
    assert(scans === 1, s"expected exactly one shard-table scan, got $scans")
  }

  test("token materialization explodes sequences, never tokens; no window") {
    // the build plan's scale contract: the ONLY Generate is the bounded
    // per-doc explode over the sequences a doc touches (each output row
    // carries an array SLICE); a Generate over the token arrays would
    // be the one-row-per-token shape, and a Window would be the
    // one-task prefix sum — both are 100 TB regressions
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, sf)
    val merges = operators.TextAnalysis.bpeTrainMerges(docs, nMerges = 2)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = operators.TextAnalysis.bpeIdVocab(docs, merges)
    val seqs = operators.Packing.materializeTokenSequences(
      operators.TextAnalysis.bpeEncodeIds(docs, merges, vocab.zipWithIndex.toMap),
      seqLen = 128, sepId = vocab.size)
    val p = seqs.queryExecution.executedPlan.toString
    val generates = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(generates.size === 1,
      s"expected exactly the seq-range Generate:\n${generates.mkString("\n")}")
    assert(generates.head.contains("sequence("),
      s"the Generate must fan out seq ids, not tokens:\n${generates.head}")
    assert(!p.contains("Window"), s"no window may appear in the build:\n$p")
  }

  test("q175 spans keep the single-Generate shape; q178 reads only the provenance table") {
    // doc_spans ride the piece rows the layout already computes: adding
    // them (and the padded tail) must not introduce a second Generate
    // (one-row-per-token or per-span fanout) or a Window
    import org.apache.spark.sql.functions._
    val docs = sources.Tables.documents(spark, sf)
    val merges = operators.TextAnalysis.bpeTrainMerges(docs, nMerges = 2)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = operators.TextAnalysis.bpeIdVocab(docs, merges)
    val seqs = operators.Packing.materializeTokenSequences(
      operators.TextAnalysis.bpeEncodeIds(docs, merges, vocab.zipWithIndex.toMap),
      seqLen = 128, sepId = vocab.size, withSpans = true,
      padId = Some(vocab.size + 1))
    val p = seqs.queryExecution.executedPlan.toString
    val generates = p.linesIterator.filter(_.contains("Generate")).toSeq
    assert(generates.size === 1,
      s"spans/padding added a Generate:\n${generates.mkString("\n")}")
    assert(!p.contains("Window"), s"no window may appear in the build:\n$p")
    // the provenance read-back is a pure committed-table scan — a
    // documents scan would mean the whole lineage chain re-runs
    val pp = planOf("q178_shard_provenance")
    assert(!pp.contains("documents"), s"provenance re-derives the chain:\n$pp")
    assert(pp.linesIterator.count(_.contains("FileScan")) === 1,
      s"expected exactly one provenance-table scan:\n$pp")
  }

  test("q179 drift plan: one materialized bucket-join frame, no quantile anywhere") {
    // the q154 convention: the (committed-histogram ⟕ shard-counts)
    // frame — whose lineage holds the ONLY corpus/model scans —
    // materializes ONCE behind a checkpoint and feeds both the totals
    // and the PSI terms; a FileScan in the returned plan would mean a
    // scoring pass re-derives per consumer. Fixed grids mean no
    // percentile may appear in ANY drift plan (the whole point of not
    // calibrating buckets per shard).
    val p = planOf("q179_score_drift")
    assert(!p.contains("FileScan"),
      s"bucket-join frame not materialized once:\n$p")
    assert(!p.toLowerCase.contains("percentile"),
      s"fixed grids must not recompute any quantile:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q154 ensemble decision plan: one materialized signal frame, broadcast cuts") {
    // the signal frame (three joined signals) materializes ONCE behind
    // a checkpoint; the returned plan joins it with the |langs|-row cut
    // aggregate via broadcast. A parquet FileScan here would mean a
    // signal recomputes per consumer; a shuffle join on lang would mean
    // the tiny cut table shuffles the corpus
    val p = planOf("q154_ensemble_gate")
    assert(!p.contains("FileScan"), s"signal frame not materialized once:\n$p")
    assert(p.contains("BroadcastHashJoin"), "cuts should broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("persistent PQ probe reads only the codes table — no embeddings scan, no KMeans") {
    // the serving contract the committed index exists for: a cold
    // session answers probes from the compressed codes alone. Any
    // embeddings FileScan (re-encode) or vector column in the plan
    // means the index stopped paying for itself
    val e = sources.Tables.embeddings(spark, sf)
    val idxDir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_pq_idx_${math.abs(sf.hashCode)}").toString
    operators.Similarity.ensurePqIndex(e, idxDir)
    val probes = e.selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .filter("vec_id in (0, 1)").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    val df = operators.Similarity.queryPqIndex(spark, idxDir, probes, k = 5)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("embeddings"), s"probe plan scans the embeddings:\n$p")
    val scans = p.linesIterator.count(_.contains("FileScan"))
    assert(scans === 1, s"expected exactly one codes-table scan, got $scans")
  }

  test("model serving plans read only model tables + corpus — no training aggregates") {
    // the q161 contract: scoring against COMMITTED models must not
    // re-derive them. LM: exactly 3 scans (documents + unigrams +
    // bigrams) — a 4th scan or a count-aggregate over a second corpus
    // read means training leaked into serving. LR: the weights are plan
    // LITERALS (bounded driver-side read), so the ONLY scan is the
    // corpus. DSIR: corpus + the nBuckets-row ratio table.
    val root = java.nio.file.Files
      .createTempDirectory("graft-models-planspec").toString
    val docs = sources.Tables.documents(spark, sf)
    operators.Models.buildLmModel(docs, s"$root/lm")
    operators.Models.buildLrModel(docs.filter("doc_id < 250"),
      docs.filter("doc_id >= 250"), s"$root/lr", "doc_id", "text",
      nBuckets = 16, lrate = 0.5, rounds = 1)
    operators.Models.buildDsirModel(docs.filter("doc_id < 250"),
      docs.filter("doc_id >= 250"), s"$root/dsir", "doc_id", "text",
      nBuckets = 16)
    val pLm = operators.Models.scoreWithLmModel(spark, s"$root/lm", docs)
      .queryExecution.executedPlan.toString
    assert(pLm.linesIterator.count(_.contains("FileScan")) === 3,
      s"LM serving should scan documents + 2 model tables only:\n$pLm")
    val pLr = operators.Models
      .scoreWithLrModel(spark, s"$root/lr", docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val lrScans = pLr.linesIterator.filter(_.contains("FileScan")).toSeq
    assert(lrScans.size === 1 && lrScans.head.contains("documents"),
      s"LR serving should scan ONLY the corpus (weights are literals):\n$pLr")
    val pDs = operators.Models.scoreWithDsirModel(spark, s"$root/dsir",
        docs, "doc_id", "text", nBuckets = 16)
      .queryExecution.executedPlan.toString
    assert(pDs.linesIterator.count(_.contains("FileScan")) === 2,
      s"DSIR serving should scan documents + the ratio table only:\n$pDs")
  }

  test("q166 served gate: no percentile, no training — cuts from the committed table") {
    val p = planOf("q166_gate_serving")
    // the calibration aggregate must be absent from the serving plan:
    // cuts come from the committed |langs|-row table as a broadcast
    assert(!p.toLowerCase.contains("percentile"),
      s"serving must not recompute calibration cuts:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("FileScan") && l.contains("graft-models")),
      "expected committed model/cut table scans")
    // every documents scan is a signal pass over the GATED slice — the
    // pushed bound proves no hidden full-corpus training read
    val docScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents")).toSeq
    assert(docScans.nonEmpty)
    assert(docScans.forall(_.contains("GreaterThanOrEqual(doc_id,250")),
      s"a documents scan without the slice bound:\n${docScans.mkString("\n")}")
  }

  test("q170 thresholded decontam broadcasts the eval grams — corpus never joins corpus") {
    val p = planOf("q170_threshold_decontam")
    // the eval side must reach the join as a broadcast (eval suites are
    // small by construction); a shuffle join here would move the corpus
    // gram set against the eval gram set symmetrically
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"eval gram side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
  }

  test("q173 data card aggregates partially before its one per-language rollup") {
    val p = planOf("q173_corpus_data_card")
    // partial + final pattern on the rollup; no window anywhere (the
    // dup flag comes from the sha aggregate join, not a row_number)
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"expected partial aggs:\n$p")
    assert(!p.contains("Window("), s"data card must not sort the corpus:\n$p")
  }

  test("q140 gopher gate is one narrow projection — no Exchange at all") {
    // the gate's whole point: every feature and flag is a per-row
    // codegen'd expression over the scan, so it composes into any
    // pipeline for free; a shuffle appearing here means someone turned
    // a projection into an aggregation
    val p = planOf("q140_gopher_gate")
    assert(!p.contains("Exchange"), s"gopher gate should not shuffle:\n$p")
  }

  test("q146 bpe encode is one narrow projection — no Exchange, no Generate") {
    // the merge table is a bounded driver-side constant, so tokenizer
    // APPLICATION must be a pure per-row map over the documents scan:
    // a shuffle or an explode appearing here means the encode stopped
    // being streaming-composable
    val p = planOf("q146_bpe_encode")
    assert(!p.contains("Exchange"), s"bpe encode should not shuffle:\n$p")
    assert(!p.contains("Generate"), s"bpe encode should not explode:\n$p")
  }

  test("q147 packing shuffles only Longs — text never leaves the scan") {
    // the global offsets come from the two-job prefix sum, so the plan
    // this query RETURNS starts at an all-Long RDD (doc_id, cost, fin);
    // the corpus text died at the eager counting scan. A string column
    // (or the parquet relation itself) reappearing here means packing
    // started shuffling text
    val p = planOf("q147_pack_sequences")
    assert(p.contains("Generate explode"), s"bounded per-doc fan-out missing:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"per-seq agg should be partial+final around the exchange:\n$p")
    assert(!p.contains("parquet") && !p.contains("text"),
      s"packing plan must not carry the corpus text:\n$p")
  }

  test("q148 sliding chunks never shuffle — narrow projection + bounded explode") {
    val p = planOf("q148_sliding_chunks")
    assert(!p.contains("Exchange"), s"chunking should not shuffle:\n$p")
    assert(p.contains("Generate explode"), s"per-doc chunk fan-out missing:\n$p")
  }

  test("q145 DSIR broadcasts the ratio table; no shuffle carries tokens") {
    // the nBuckets-row importance-ratio side must ride a broadcast onto
    // the exploded raw tokens — a sort-merge/shuffled-hash join there
    // would shuffle every (doc_id, token-bucket) row against a 64-row
    // table
    val p = planOf("q145_dsir_select")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast ratio join")
    val merges = p.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin")).toSeq
    // the only allowed non-broadcast join is the bucket-count FULL join
    // (nBuckets rows per side)
    assert(merges.forall(_.contains("FullOuter")),
      s"token-side shuffle join:\n${merges.mkString("\n")}")
  }

  test("q137 incremental dedup never scans historical text") {
    val p = planOf("q137_incremental_dedup")
    // every scan of the documents table must carry the shard's pushed
    // doc_id bound — the history side comes exclusively from the store
    val docScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents")).toSeq
    assert(docScans.nonEmpty, "expected a shard-side documents scan")
    assert(docScans.forall(_.contains("GreaterThanOrEqual(doc_id,250")),
      s"a documents scan without the shard filter reads historical rows:\n${docScans.mkString("\n")}")
    // the store scan reads signature columns only (text doesn't exist there)
    val storeScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft-sigstore")).toSeq
    assert(storeScans.nonEmpty, "expected a signature-store scan")
    assert(storeScans.forall(!_.contains("text")))
  }

  test("q163 incremental RAG retrieval never re-embeds the corpus") {
    val p = planOf("q163_incremental_rag")
    // the corpus side must come exclusively from the committed chunk
    // index: the RETURNED plan has NO documents FileScan at all (the
    // probe side is a one-shot materialized chunk-vector frame — the
    // embedding-asset barrier), no text column anywhere, and the only
    // parquet scan is the committed index
    val docScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents")).toSeq
    assert(docScans.isEmpty,
      s"retrieval must not re-read the corpus text:\n${docScans.mkString("\n")}")
    assert(!p.contains("text#"), s"retrieval plan carries document text:\n$p")
    val idxScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft-ragidx")).toSeq
    assert(idxScans.nonEmpty, "expected a committed chunk-index scan")
    assert(idxScans.forall(!_.contains("text")))
    // the index BUILD reads only its shard's slice: the pushed doc_id
    // bound reaches the documents scan (nothing re-embeds history)
    val docs = sources.Tables.documents(spark, sf)
    val buildPlan = operators.Rag.chunkVectors(
        docs.filter("doc_id >= 400"), window = 32, stride = 24, dim = 64)
      .queryExecution.executedPlan.toString
    val buildScans = buildPlan.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents")).toSeq
    assert(buildScans.nonEmpty &&
      buildScans.forall(_.contains("GreaterThanOrEqual(doc_id,400")),
      s"shard build must push its doc_id bound:\n$buildPlan")
  }

  test("no query windows a non-aggregated input by a tiny-cardinality key") {
    // the scale-killer class VERDICT r3 flagged: Window.partitionBy on a
    // <=10-cardinality column directly over the scan sorts the whole
    // table on that many tasks. Post-aggregate windows are fine (input
    // is already collapsed).
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val tinyKeys = Set("l_returnflag", "l_linestatus", "o_orderpriority",
      "o_orderstatus", "lang", "source", "event_type", "r_name")
    for ((name, f) <- SparkEntry.queries) {
      val plan = f(spark, sf).queryExecution.optimizedPlan
      val bad = plan.collect {
        case w: LWindow
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).forall(tinyKeys) &&
            w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(bad.isEmpty, s"$name: tiny-key window over a non-aggregated input")
    }
  }

  test("q213 SQL read plans a V2 BatchScan of the graft format (vectorized parquet, pushed filters)") {
    // the DataSourceV2 surface must stay Spark's own columnar parquet
    // scan — a row-based reader here would be a silent 10x at 100 TB
    val base = java.nio.file.Files.createTempDirectory("graft-plan-dsv2").toString
    val t = s"$base/t"
    import spark.implicits._
    graft.streaming.EventStreams.mergeBatchIntoTable(
      (0L until 8L).map(k => (k, k * 10L, 0L)).toDF("doc_id", "n", "__v"),
      t, Seq("doc_id"), "__v", nBuckets = 1, batchId = 0L,
      statsCols = Some(Seq("n")))
    val d = spark.read.format("graft").load(t)
      .filter(org.apache.spark.sql.functions.col("n") <= 30L)
    d.collect()
    val fin = d.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    val scan = fin.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scan.isDefined, s"expected a BatchScanExec:\n$fin")
    assert(scan.get.toString.contains("graft"),
      "the scan must identify as the graft format")
    assert(fin.toString.contains("ColumnarToRow"),
      "the V2 read must stay columnar (vectorized parquet)")
  }
}
