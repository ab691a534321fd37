package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents() = Seq(
    (1L, "2024-01-01 10:10:00", 1L, "a", 5.0, "{}"),
    (2L, "2024-01-01 10:50:00", 1L, "a", 7.0, "{}"),
    (2L, "2024-01-01 10:50:00", 1L, "a", 7.0, "{}"), // dup event_id
    (3L, "2024-01-01 11:20:00", 2L, "b", 1.0, "{}")
  ).toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
    .withColumn("ts", to_timestamp(col("ts_s")))
    .select("event_id", "ts", "user_id", "event_type", "value", "props")

  private def streamDir(): String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    mkEvents().coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly agg matches the batch run of the same transform") {
    val dir = streamDir()
    val q = EventStreams.hourlyByType(EventStreams.readEventStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("hourly").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("hourly")
        .select("ws", "event_type", "n", "sum_value").collect().toSet
      val batch = EventStreams.hourlyByType(mkEvents())
        .select("ws", "event_type", "n", "sum_value").collect().toSet
      assert(stream === batch)
      assert(stream.exists(r => r.getLong(2) === 3L)) // 10:00 window has 3 events
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark removes the duplicate event") {
    val dir = streamDir()
    val q = EventStreams.dedupedWithinWatermark(EventStreams.readEventStream(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup").select("event_id").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq === Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("stateful running totals accumulate across micro-batches") {
    val dir = streamDir()
    val q = EventStreams.runningUserTotals(spark, EventStreams.readEventStream(spark, dir))
      .writeStream.outputMode("update").format("memory").queryName("running").start()
    try {
      q.processAllAvailable()
      // write a second batch into the same source dir -> new micro-batch
      Seq((9L, "2024-01-01 12:00:00", 1L, "a", 10.0, "{}"))
        .toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
        .withColumn("ts", to_timestamp(col("ts_s")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val last = spark.table("running").filter(col("user_id") === 1L)
        .orderBy(col("n").desc).head()
      assert(last.getAs[Long]("n") === 4L) // 3 first batch + 1 second
      assert(math.abs(last.getAs[Double]("total") - 29.0) < 1e-9)
    } finally q.stop()
  }
}
