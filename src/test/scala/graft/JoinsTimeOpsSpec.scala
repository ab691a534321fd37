package graft

import org.apache.spark.sql.functions._
import graft.operators.{Joins, TimeOps}

class JoinsTimeOpsSpec extends SparkSpec {
  import spark.implicits._

  test("fanoutLeft keeps aggregate rows and fans out to detail granularity") {
    val agg = Seq(("d1", 10.0), ("d2", 20.0)).toDF("d", "avg_v")
    val detail = Seq(("d1", "a"), ("d1", "b")).toDF("d", "k")
    val got = Joins.fanoutLeft(agg, detail, "d")
    assert(got.count() === 3) // d1 fans out to 2, d2 survives with null k
    assert(got.filter(col("d") === "d2" && col("k").isNull).count() === 1)
  }

  test("asOfJoinNative picks latest prior-or-equal right row, nulls when none") {
    val errors = Seq((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 100L), (4L, 30L, 10L))
      .toDF("event_id", "user_id", "err_us").repartition(5)
    val signups = Seq((10L, 60L), (10L, 90L), (20L, 100L))
      .toDF("s_user", "signup_us").repartition(3)
    val got = Joins.asOfJoinNative(errors, signups, "user_id", "err_us", "s_user", "signup_us")
      .select("event_id", "signup_us")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L) === Some(90L))   // latest of 60, 90
    assert(got(2L) === None)        // earliest signup is after err_us=50
    assert(got(3L) === Some(100L))  // equal timestamps match (<=)
    assert(got(4L) === None)        // key with no right rows at all
  }

  test("asOfJoinNative: NULL keys/timestamps never match, on either side") {
    val errors = Seq(
      (1L, Some(10L), Some(100L)),
      (2L, Some(10L), None),        // null ts -> no match even though signups exist
      (3L, None, Some(100L)))       // null key -> no match
      .toDF("event_id", "user_id", "err_us")
    val signups = Seq(
      (Some(10L), Some(90L)),
      (Some(10L), None),            // null ts right row must be skipped, not match
      (None, Some(1L)))             // null key right row must be skipped
      .toDF("s_user", "signup_us")
    val got = Joins.asOfJoinNative(errors, signups, "user_id", "err_us", "s_user", "signup_us")
      .select("event_id", "signup_us")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L) === Some(90L))
    assert(got(2L) === None)
    assert(got(3L) === None)
  }

  test("asOfJoinNative output stays clustered: downstream groupBy adds no exchange") {
    val errors = Seq((1L, 10L, 100L), (2L, 10L, 50L)).toDF("event_id", "user_id", "err_us")
    val signups = Seq((10L, 60L)).toDF("s_user", "signup_us")
    val agg = Joins.asOfJoinNative(errors, signups, "user_id", "err_us", "s_user", "signup_us")
      .groupBy(col("user_id")).count()
    val p = agg.queryExecution.executedPlan.toString
    // exactly the join's own two input exchanges — outputPartitioning
    // advertises the left clustering, so the aggregate reuses it
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2, p)
  }

  test("asOfBackward finds latest prior-or-equal right event per key") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "signup"),
      (1L, "2024-01-01 11:00:00", 2L, "error"),  // asof = 10:00
      (1L, "2024-01-01 12:00:00", 3L, "signup"),
      (1L, "2024-01-01 12:00:00", 4L, "error"),  // equal ts, later id -> 12:00
      (2L, "2024-01-01 09:00:00", 5L, "error")   // no signup -> null
    ).toDF("user_id", "ts_s", "event_id", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Joins.asOfBackward(df, "user_id", "ts", "event_id",
        col("event_type") === "signup", "asof")
      .filter(col("event_type") === "error")
      .select(col("event_id"), hour(col("asof")).as("h"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(2L) === Some(10))
    assert(got(4L) === Some(12))
    assert(got(5L) === None)
  }

  test("sessionize splits on gaps strictly greater than the threshold") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L),
      (1L, "2024-01-01 10:30:00", 2L), // gap == 1800s -> same session
      (1L, "2024-01-01 11:00:01", 3L), // gap 1801s -> new session
      (2L, "2024-01-01 10:00:00", 4L)
    ).toDF("user_id", "ts_s", "event_id")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Joins.sessionize(df, "user_id", "ts", "event_id", 1800L)
      .select(col("event_id"), col("session_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === 1L && got(2L) === 1L)
    assert(got(3L) === 2L)
    assert(got(4L) === 1L) // sessions are per-key
  }

  test("tumbling and sliding windows cover each event the right number of times") {
    val df = Seq(
      (1L, "2024-01-01 10:10:00", 5.0, "a"),
      (2L, "2024-01-01 10:50:00", 7.0, "a")
    ).toDF("event_id", "ts_s", "value", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val tumb = TimeOps.tumblingHourly(df)
    assert(tumb.agg(sum("n")).head().getLong(0) === 2L) // each event once
    val slide = TimeOps.slidingHourly(df)
    assert(slide.agg(sum("n")).head().getLong(0) === 4L) // each event twice
  }

  test("funnelStageTimes enforces strict ordering across stages") {
    val df = Seq(
      // u1: full ordered funnel
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "click", "2024-01-01 10:05:00"),
      (1L, "purchase", "2024-01-01 10:10:00"),
      // u2: purchase BEFORE the click -> stage 3 not reached
      (2L, "view", "2024-01-01 10:00:00"),
      (2L, "purchase", "2024-01-01 10:01:00"),
      (2L, "click", "2024-01-01 10:02:00"),
      // u3: click with no prior view -> stages 2 and 3 not reached
      (3L, "click", "2024-01-01 10:00:00"),
      (3L, "purchase", "2024-01-01 10:01:00"),
      // u4: click at the SAME instant as view -> strictly-after excludes it
      (4L, "view", "2024-01-01 10:00:00"),
      (4L, "click", "2024-01-01 10:00:00"))
      .toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val t = TimeOps.funnelStageTimes(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (1 to 3).map(i => !r.isNullAt(i)).toSeq).toMap
    assert(t(1L) === Seq(true, true, true))
    assert(t(2L) === Seq(true, true, false))
    assert(t(3L) === Seq(false, false, false))
    assert(t(4L) === Seq(true, false, false))
    val counts = TimeOps.funnelCounts(df, Seq("view", "click", "purchase")).head()
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2)) === ((3L, 2L, 1L)))
  }

  test("runningTotalDistributed equals the single-partition window running sum") {
    val df = (1L to 500L).map(t => (t, (t % 7) - 3)).toDF("t", "d").repartition(9)
    val got = TimeOps.runningTotalDistributed(df, "t", "d", 6, "cc")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    var run = 0L
    (1L to 500L).foreach { t =>
      run += (t % 7) - 3
      assert(got(t) === run, s"prefix sum diverges at t=$t")
    }
  }

  test("maxConcurrencyPerDay counts overlapping sessions") {
    // two users whose sessions overlap 10:00-10:05, one solo afternoon session
    val df = Seq(
      (1L, 10L, "2024-01-01 10:00:00"), (2L, 10L, "2024-01-01 10:05:00"),
      (3L, 20L, "2024-01-01 10:03:00"), (4L, 20L, "2024-01-01 10:04:00"),
      (5L, 30L, "2024-01-01 15:00:00"))
      .toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = TimeOps.maxConcurrencyPerDay(df)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(got("2024-01-01") === 2L)
  }
}
