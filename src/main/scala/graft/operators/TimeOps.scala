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
}
