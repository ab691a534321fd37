package graft

import org.apache.spark.sql.functions._
import graft.operators.Aggregates

final case class TopKRec(g: String, v: Int)

class AggregatesSpec extends SparkSpec {
  import spark.implicits._

  test("topK aggregator keeps k best per group across partition merges") {
    implicit val ord: Ordering[TopKRec] = Ordering.by(r => (-r.v, r.g))
    val ds = spark.createDataset(
      (1 to 100).map(i => TopKRec(if (i % 2 == 0) "a" else "b", i))).repartition(8)
    val got = ds.groupByKey(_.g)
      .agg(graft.functions.TypedAggs.topK[TopKRec](3).toColumn.name("top"))
      .collect().toMap
    assert(got("a").map(_.v) === Seq(100, 98, 96)) // best-first, pruned to k
    assert(got("b").map(_.v) === Seq(99, 97, 95))
  }

  test("deterministicMode picks most frequent, smallest value on ties") {
    val df = Seq(
      (1, "b"), (1, "b"), (1, "a"), // b wins by count
      (2, "z"), (2, "y"),           // tie -> smallest = y
      (3, "x")
    ).toDF("g", "v")
    val got = Aggregates.deterministicMode(df, col("g"), col("v"), "g", "m")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(got === Map(1 -> "b", 2 -> "y", 3 -> "x"))
  }

  test("deterministicMode drops null values like pandas mode()") {
    val df = Seq((1, Option("a")), (1, None), (1, None), (2, None))
      .toDF("g", "v")
    val got = Aggregates.deterministicMode(df, col("g"), col("v"), "g", "m")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // group 2 is all-null -> no row at all (the monthly agg joins it back as null)
    assert(got === Map(1 -> "a"))
  }

  test("medians are exact, NA-skipping, interpolating on even counts") {
    val df = Seq(
      (Option(1.0), Option(10.0)),
      (Option(2.0), None),
      (Option(3.0), Option(20.0)),
      (Option(4.0), Option(30.0))
    ).toDF("a", "b")
    val m = Aggregates.medians(df, Seq("a", "b"))
    assert(m("a") === 2.5) // even count interpolates
    assert(m("b") === 20.0) // null skipped
  }

  test("imputeMedians fills only nulls") {
    val df = Seq(Option(1.0), None, Option(3.0)).toDF("a")
    val got = Aggregates.imputeMedians(df, Seq("a"))
      .collect().map(_.getDouble(0)).sorted.toSeq
    assert(got === Seq(1.0, 2.0, 3.0))
  }

  test("daily/monthly agg skip nulls in avg like pandas mean") {
    val df = Seq(
      ("2024-01-01 10:00:00", Option(2.0)),
      ("2024-01-01 11:00:00", None),
      ("2024-01-01 12:00:00", Option(4.0))
    ).toDF("ts_s", "value").withColumn("ts", to_timestamp(col("ts_s")))
    val d = Aggregates.daily(df, "ts", Seq("value")).head()
    assert(d.getAs[Double]("avg_value") === 3.0) // (2+4)/2, null skipped
    assert(d.getAs[Long]("n") === 3L)            // count(*) counts the row
  }
}
