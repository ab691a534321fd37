package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming analog of the reference's `@daily` batch recurrence
  * (SURVEY.md §2.8 / milestone 3): the same declarative transforms bound
  * to `readStream` instead of `read` — the payoff of keeping operators as
  * `DataFrame => DataFrame`.
  *
  * State posture at scale: watermarks bound all aggregation state;
  * `dropDuplicatesWithinWatermark` bounds dedup state; the custom
  * stateful op keeps O(1) state per key via mapGroupsWithState.
  */
object EventStreams {

  /** Events-shaped schema with µs timestamps (what a streaming file
    * source of this table looks like after ns-truncation).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 1h counts with late-data handling — works identically on a
    * batch frame (no watermark effect) and a stream (10 min watermark
    * bounds state; append mode emits finalized windows only).
    */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming dedup on event_id with bounded state. */
  def dedupedWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  final case class UserRunning(user_id: Long, n: Long, total: Double)

  /** Custom stateful operator: per-user running (count, sum) via
    * mapGroupsWithState — the KeyValueGroupedDataset state API
    * (SURVEY.md §2.8 streaming row).
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n
          var tot = prev.total
          rows.foreach { r => n += 1; tot += r._2 }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }
}
