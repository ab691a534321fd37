package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Joins

/** Event-time operators over the events table: tumbling/sliding windows
  * (the batch twins of the streaming aggregations in graft.streaming),
  * as-of join, sessionization.
  *
  * Window starts are exported as epoch microseconds (BIGINT) — timestamp
  * columns round-trip poorly across engines (ns vs µs precision), epoch
  * integers are unambiguous.
  */
object TimeOps {

  /** Tumbling 1-hour aggregate — same expression works under readStream
    * (graft.streaming.EventStreams reuses it).
    */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        unix_micros(col("w.start")).as("ws"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding window: 1 hour wide, 30-minute slide — each event lands in
    * two windows; Spark's `window()` enumerates them without a self-union.
    */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("ws"), col("n"))

  /** Backward as-of join: each 'error' event annotated with the most
    * recent prior-or-equal 'signup' time of the same user. One shuffle on
    * user_id, O(1) state per key (SURVEY.md §2.3 [ext] row).
    */
  def errorAsOfSignup(events: DataFrame): DataFrame =
    Joins.asOfBackward(
        events.filter(col("event_type").isin("error", "signup"))
          .select(col("event_id"), col("user_id"), col("ts"), col("event_type")),
        "user_id", "ts", "event_id",
        col("event_type") === "signup", "signup_ts")
      .filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), unix_micros(col("signup_ts")).as("signup_us"))

  /** Gap-based sessions (30-minute inactivity) rolled up to one row per
    * (user, session).
    */
  def userSessions(events: DataFrame, gapSeconds: Long = 1800L): DataFrame =
    Joins.sessionize(events, "user_id", "ts", "event_id", gapSeconds)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("start_us"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("dur_us"))

  /** Per-user stage times of an ORDERED funnel in one pass / one
    * shuffle: each step's event times collect into a per-user sorted
    * array (bounded by that user's own event count — document the skew
    * caveat, not a table-sized state), then stage i's time chains as
    * "first step-i time STRICTLY after stage i−1's" through array
    * higher-order functions, with null flowing through unreached
    * stages. The usual join-per-stage formulation rescans the fact once
    * per step and shuffles it as many times; this shape scans once and
    * shuffles only (user → arrays) partials. `get()` (not element_at)
    * keeps empty-array access null under ANSI mode.
    */
  def funnelStageTimes(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val lists = steps.zipWithIndex.map { case (s, i) =>
      sort_array(collect_list(when(col("event_type") === s, col("ts")))).as(s"l$i")
    }
    val perUser = events.groupBy(col("user_id")).agg(lists.head, lists.tail: _*)
    steps.indices.foldLeft(perUser) { (acc, i) =>
      val t =
        if (i == 0) get(col("l0"), lit(0))
        else get(filter(col(s"l$i"), x => x > col(s"t${i - 1}")), lit(0))
      acc.withColumn(s"t$i", t)
    }.select(col("user_id") +: steps.indices.map(i => col(s"t$i")): _*)
  }

  /** [[funnelStageTimes]] rolled up to the conversion counts: one row,
    * one count per stage (users whose stage time is non-null).
    */
  def funnelCounts(events: DataFrame, steps: Seq[String]): DataFrame =
    funnelStageTimes(events, steps)
      .agg(
        count(col("t0")).as(s"n_${steps.head}"),
        steps.indices.tail.map(i => count(col(s"t$i")).as(s"n_${steps(i)}")): _*)

  /** Distributed prefix sum over a (time, delta) series — the scalable
    * replacement for `SUM(d) OVER (ORDER BY t)`, whose unpartitioned
    * window funnels the WHOLE series through one task. Shape: range-
    * partition by `t` (total order across partitions), sort within each
    * partition, one lightweight job collects per-partition sums (one
    * Long each) to the driver, their prefix sums broadcast back as
    * partition offsets, and the running total becomes a narrow
    * per-partition pass. Two jobs total, same determinism contract as
    * [[Sampling.denseGlobalIndex]] (range boundaries are seeded
    * per-partition, so both jobs see identical partitioning).
    */
  def runningTotalDistributed(df: DataFrame, tCol: String, valCol: String,
                              nParts: Int, outCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df.select(col(tCol).cast("long"), col(valCol).cast("long"))
      .as[(Long, Long)]
      .repartitionByRange(nParts, col(tCol))
      .sortWithinPartitions(col(tCol))
      // barrier: BOTH jobs below consume this frame (per-partition sums,
      // then the offset pass) — without it the whole input lineage runs
      // twice per call; for token packing that lineage is the tokenize/
      // BPE-encode projection. Two Longs per row — the cheapest possible
      // materialization (no measurable cost at sf0.1; the win is the
      // halved lineage evaluation, which grows with the input's cost).
      .localCheckpoint()
    val partSums = parted.rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L; it.foreach(s += _._2); Iterator((pid, s))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    val out = parted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offsets.value(pid)
      it.map { case (t, d) => run += d; (t, d, run) }
    }
    spark.createDataFrame(out).toDF(tCol, valCol, outCol)
  }

  /** Max concurrent sessions per day, by interval sweep: each session's
    * closed [start, end] interval becomes a +1 delta at start and a −1
    * delta just past end; deltas aggregate per distinct boundary
    * instant (the series shrinks from events to boundary points), and
    * concurrency is the running total of deltas in time order — a
    * distributed prefix sum, never a single-partition global window.
    */
  def maxConcurrencyPerDay(events: DataFrame, gapSeconds: Long = 1800L,
                           nParts: Int = 8): DataFrame = {
    val deltas = userSessions(events, gapSeconds)
      .select(explode(array(
        struct(col("start_us").as("t"), lit(1L).as("d")),
        struct((col("start_us") + col("dur_us") + 1L).as("t"), lit(-1L).as("d")))).as("b"))
      .select(col("b.t").as("t"), col("b.d").as("d"))
      .groupBy(col("t")).agg(sum(col("d")).as("d"))
    runningTotalDistributed(deltas, "t", "d", nParts, "cc")
      .withColumn("day", to_date(timestamp_micros(col("t"))))
      .groupBy(col("day"))
      .agg(max(col("cc")).as("max_concurrent"))
  }
}
