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
}
