package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64

  // zipfian-ish token stream: token t_i appears 200/i times
  private lazy val items = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"t$i"))
    .toDF("tok")

  test("CMS never underestimates and stays within the eN/width bound") {
    val sketch = Sketches.countMinSketch(items, "tok", depth, width)
    val exact = items.groupBy(col("tok")).agg(count(lit(1)).as("exact_n"))
    val est = Sketches.cmsEstimate(sketch, exact, "tok", depth, width).collect()
    val total = items.count()
    val bound = math.E * total / width
    est.foreach { r =>
      val (exactN, cms) = (r.getLong(1), r.getLong(2))
      assert(cms >= exactN, s"${r.getString(0)}: estimate $cms < exact $exactN")
      assert(cms - exactN <= bound,
        s"${r.getString(0)}: overcount ${cms - exactN} above eN/width=$bound")
    }
  }

  test("sketch depth x width cardinality is bounded regardless of input size") {
    val sketch = Sketches.countMinSketch(items, "tok", depth, width).collect()
    assert(sketch.length <= depth * width)
    assert(sketch.map(r => (r.getInt(0), r.getLong(1))).distinct.length === sketch.length)
    // total mass per depth row equals the item count
    val total = items.count()
    sketch.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sum === total)
    }
  }

  test("merging shard sketches equals the sketch of the union") {
    val shardA = items.filter(substring(col("tok"), 2, 10).cast("int") % 2 === 0)
    val shardB = items.filter(substring(col("tok"), 2, 10).cast("int") % 2 === 1)
    val merged = Sketches.mergeSketches(Seq(
        Sketches.countMinSketch(shardA, "tok", depth, width),
        Sketches.countMinSketch(shardB, "tok", depth, width)))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = Sketches.countMinSketch(items, "tok", depth, width)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged === full)
  }

  test("estimate for a never-seen item is bounded by collisions (possibly 0)") {
    val sketch = Sketches.countMinSketch(items, "tok", depth, width)
    val unseen = Seq("never-seen-token").toDF("tok")
    val est = Sketches.cmsEstimate(sketch, unseen, "tok", depth, width).collect()
    assert(est.length === 1)
    assert(est.head.getLong(1) >= 0L)
  }
}
