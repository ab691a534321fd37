package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{Joins, Validation}
import graft.plans.GraftExtensions

/** Specs for the scale-posture operators: bucketed range join, salted
  * join, observe()-based validation, bucketed co-located joins,
  * session_window vs composed sessionize parity, SQL function
  * registration.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("rangeJoinBucketed equals the naive range join") {
    val l = Seq((1L, "2024-01-01 10:01:00"), (2L, "2024-01-01 11:00:00"))
      .toDF("e_id", "ts_s").withColumn("e_ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val r = Seq(
      (10L, "2024-01-01 10:00:30"), // within 60s of e1
      (11L, "2024-01-01 10:01:00"), // equal boundary -> match
      (12L, "2024-01-01 10:00:00"), // exactly -60s boundary -> match
      (13L, "2024-01-01 10:02:00"), // after e1 -> no
      (14L, "2024-01-01 10:59:30")  // within 60s of e2
    ).toDF("p_id", "ts_s").withColumn("p_ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val got = Joins.rangeJoinBucketed(l, "e_ts", r, "p_ts", 60L)
      .select("e_id", "p_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val naive = l.crossJoin(r)
      .filter(unix_micros(col("p_ts")).between(
        unix_micros(col("e_ts")) - 60000000L, unix_micros(col("e_ts"))))
      .select("e_id", "p_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got === naive)
    assert(got === Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 14L)))
  }

  test("saltedJoin equals the plain join") {
    val fact = (1 to 100).map(i => (i % 3, i.toLong)).toDF("k", "v")
    val dim = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k")).groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Joins.saltedJoin(fact, dim, "k", "v", 8).groupBy("name").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("observe()-based validation gates on the sink action itself") {
    val dir = Files.createTempDirectory("graft-obs").toString + "/out"
    val dirty = Seq((10.0, 1.0), (99.0, 2.0)).toDF("t", "w")
    val checks = Seq(Validation.InRange("t", -50, 50): Validation.Check)
    val (observed, obs) = Validation.observed(dirty, checks)
    observed.write.mode("overwrite").parquet(dir) // the ONLY scan
    val e = intercept[Validation.ValidationException] {
      Validation.assertClean(obs, checks)
    }
    assert(e.getMessage.contains("range_t: 1"))
    // data still landed (observe is monitoring, not a filter) — caller
    // decides whether to quarantine the written output
    assert(spark.read.parquet(dir).count() === 2)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "av")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "bv")
    a.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_a")
    b.write.bucketBy(8, "k").sortBy("k").saveAsTable("graft_bkt_b")
    val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), Seq("k"))
    assert(joined.count() === 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
    spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
  }

  test("built-in session_window agrees with composed sessionize") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:10:00", 2L),
      (1L, "2024-01-01 12:00:00", 3L), // clear gap -> session 2
      (2L, "2024-01-01 09:00:00", 4L)
    ).toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val builtIn = df.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val composed = Joins.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .groupBy("user_id", "session_id").agg(count(lit(1)).as("n"))
      .select("user_id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(builtIn === composed)
  }

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a','b')) AS h, minhash_sig(array('a','b'), 4) AS s")
      .head()
    assert(r.getLong(0) !== 0L)
    assert(r.getSeq[Long](1).size === 4)
    // same fingerprint via SQL and via the Column API
    import graft.plans.SimHash64.simhash64
    val viaCol = Seq(Seq("a", "b")).toDF("t").select(simhash64(col("t"))).head().getLong(0)
    assert(r.getLong(0) === viaCol)
  }

  test("CollapseRound removes idempotent double-round towers from the plan") {
    GraftExtensions.register(spark)
    // parquet-backed input: a literal-backed LocalRelation would be
    // constant-folded before the rule could be observed
    val base = sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select((col("l_extendedprice") / 3.0).as("x"))
    val df = base.select(
      round(round(col("x"), 6), 6).as("r66"), // equal scales -> collapse
      round(round(col("x"), 2), 6).as("r26"), // finer outer -> collapse
      round(round(col("x"), 6), 2).as("r62")) // coarser outer -> must STAY
    val rounds = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case r: org.apache.spark.sql.catalyst.expressions.Round => r })
    assert(rounds.size === 4, s"expected r66->1, r26->1, r62->2 rounds, got $rounds")
    // the collapsed columns compute exactly the single-round values
    // (r62 is intentionally left out: coarser re-rounding is genuine
    // double rounding, which is why the rule must not collapse it)
    val viaSingle = base.select(round(col("x"), 6).as("a"), round(col("x"), 2).as("b"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val viaTower = df.collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(viaTower.toSeq === viaSingle.toSeq)
  }

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    // one hot key holding 10% of the left side — the declarative plan
    // stays a plain equi join; AQE detects the oversized partition at
    // the shuffle boundary and splits it (the runtime answer to skew
    // that q96's explicit salting solves statically)
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000)
        .select(when(col("id") % 2 === 0, 0L).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val right = spark.range(64).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = left.join(right, "k")
      // collect() executes THIS QueryExecution (count() would plan a
      // separate aggregated query and leave this adaptive plan unrun)
      val n = joined.collect().length
      assert(n === 100032) // hot key 0: 100000 matches; the 32 odd keys in 1..63
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(plan.contains("skew=true"),
        "AQE did not mark the join skewed:\n" + plan.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("closure super-node: propagation join skew-splits and clusters stay correct") {
    // adversarial fixture: node 0 adjacent to a huge share of the corpus
    // (viral boilerplate cluster) — after symmetrization one join key
    // carries ~n edge rows while every other key carries one
    val n = 40000L
    val star = spark.range(1L, n).select(lit(0L).as("a"), col("id").as("b"))
    // production posture: the label side is O(nodes) at 100 TB, so no
    // broadcast; thresholds lowered so local-scale data crosses them
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // (a) the exact per-round propagation shape connectedComponents
      // runs (CHECKPOINTED sym ⋈ labels on b, then min per a): AQE must
      // split the skewed b=0 partition instead of stalling one task.
      // The checkpoints are load-bearing: they erase the label side's
      // aggregate partitioning, so both join children arrive through
      // plain ENSURE_REQUIREMENTS exchanges — the only shape
      // OptimizeSkewedJoin splits (verified: the same join without the
      // checkpoints is NOT split, the labels side flows in
      // pre-partitioned through its agg with no shuffle stage to cut)
      val sym = star.unionByName(star.select(col("b").as("a"), col("a").as("b")))
        .localCheckpoint()
      val labels = sym.groupBy(col("a")).agg(min(col("b")).as("nmin"))
        .select(col("a").as("node"), least(col("a"), col("nmin")).as("lab"))
        .localCheckpoint()
      val round = sym
        .join(labels.select(col("node").as("b"), col("lab").as("blab")), Seq("b"))
        .groupBy(col("a")).agg(min(col("blab")).as("nlab"))
      assert(round.collect().length === n.toInt) // every node got a neighbor-min
      val plan = round.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE did not skew-split the propagation join:\n" + plan.take(1200))
      Seq(sym, labels).foreach(df =>
        df.queryExecution.logical.collectLeaves().foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
          case _ => ()
        })
      // (b) end-to-end under the same confs: the closure converges and
      // assigns every node to the super-node's cluster
      val cc = graft.operators.Dedup.connectedComponents(star, "a", "b")
      val clusters = cc.select("cluster_id").distinct().collect().map(_.getLong(0)).toSeq
      assert(clusters === Seq(0L))
      assert(cc.count() === n)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("connectedComponents reliable checkpoint: identical clusters, lineage cut") {
    spark.sparkContext.setCheckpointDir(
      Files.createTempDirectory("graft-cc-ckpt").toString)
    // two chains + a triangle: multi-round convergence on both paths
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (20L, 21L), (21L, 22L), (22L, 20L)).toDF("a", "b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = asMap(graft.operators.Dedup.connectedComponents(edges, "a", "b"))
    val rel = graft.operators.Dedup.connectedComponents(edges, "a", "b", reliable = true)
    assert(asMap(rel) === local)
    // lineage is cut: however many rounds ran, the result plan is a thin
    // projection over ONE checkpointed leaf — not a tree growing per round
    val nodes = rel.queryExecution.optimizedPlan.collect { case p => p }
    assert(nodes.size <= 3, s"plan grew with rounds:\n${rel.queryExecution.optimizedPlan}")
    assert(rel.queryExecution.optimizedPlan.collectLeaves().size === 1)
  }

  test("connectedComponents frees every superseded round's checkpoint blocks") {
    // chain graph: min-label needs ~diameter rounds, so several
    // checkpoints are created and must be retired as they are superseded
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val cc = graft.operators.Dedup.connectedComponents(edges, "a", "b")
    assert(cc.select("cluster_id").distinct().count() === 1L)
    val after = spark.sparkContext.getPersistentRDDs.size
    // only the returned frame's own checkpoint may remain: the
    // drop("chg") projection previously hid the LogicalRDD from the
    // root-only unpersist match and leaked one O(nodes) RDD per round
    assert(after - before <= 1,
      s"superseded checkpoint blocks leaked: before=$before after=$after")
  }

  test("runtime bloom filter injects into the contamination-probe semi join") {
    // the 100 TB decontamination lever Catalyst provides FOR FREE: for
    // the corpus ⋈ blocklist SEMI probe ("which docs are contaminated"),
    // InjectRuntimeFilter builds a bloom filter from the small filtered
    // blocklist and pre-filters the corpus BEFORE its shuffle — the
    // shuffle then carries candidate rows only, not the corpus. (The
    // LEFT ANTI "drop contaminated" direction cannot be bloom-prefiltered
    // without changing semantics: rows the bloom rejects are exactly the
    // rows an anti join must KEEP.) Thresholds lowered so local-scale
    // data qualifies; at real scale the defaults (10 GB application
    // side) gate it to where it pays.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1024",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val corpus = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), sha2(col("text"), 256).as("fp"))
      val block = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 20)
        .select(sha2(col("text"), 256).as("fp"))
      val flagged = corpus.join(block, Seq("fp"), "left_semi")
      val n = flagged.collect().length
      assert(n >= 20) // the 20 blocklisted docs (+ any exact dups of them)
      val plan = flagged.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        "runtime bloom filter not injected into the probe side:\n" + plan.take(1200))
      assert(plan.contains("bloom_filter_agg"),
        "bloom creation side missing:\n" + plan.take(1200))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("portable_unit is callable from SQL and matches the Column API") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT portable_unit(42, 'sample') AS u").head().getDouble(0)
    val viaCol = Seq(42L).toDF("id")
      .select(graft.operators.Sampling.portableUnit(col("id"), "sample").as("u"))
      .head().getDouble(0)
    assert(viaSql === viaCol)
    assert(viaSql >= 0.0 && viaSql < 1.0)
  }
}
