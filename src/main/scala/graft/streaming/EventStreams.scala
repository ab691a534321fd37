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

  /** Stream-static enrichment join: the static side is a dimension
    * lookup, re-read per micro-batch by Spark (so dim updates between
    * batches are picked up); broadcast automatically when small.
    */
  def enrichedWithDim(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(dim, Seq(key), "left")

  /** Stream-STREAM inner join with an event-time interval condition:
    * errors matched to same-user purchases in the preceding `gapSeconds`.
    * Both sides carry watermarks + the time-range predicate, so Spark
    * can bound the join state (rows age out once the watermark passes
    * the interval) — the streaming twin of `Joins.rangeJoinBucketed`.
    */
  def errorPurchaseIntervalJoin(events: DataFrame, gapSeconds: Long = 60L): DataFrame = {
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("e_ts"), col("event_id").as("e_id"))
      .withWatermark("e_ts", "10 minutes")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    errors.join(purchases,
      col("user_id") === col("p_user") &&
        col("p_ts") >= col("e_ts") - expr(s"interval $gapSeconds seconds") &&
        col("p_ts") <= col("e_ts"))
      .select(col("e_id"), col("p_id"), col("user_id"))
  }

  /** Native session windows (`session_window`): dynamic-gap event-time
    * sessions as a first-class groupBy key — the built-in alternative
    * to [[closedSessions]] when per-session aggregates suffice (state
    * and merging handled by the engine, bounded by the watermark).
    */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("start"),
        col("session_window.end").as("end"),
        col("n_events"))

  final case class SessionOut(user_id: Long, n_events: Long, start_us: Long, end_us: Long)

  /** Open-session state for closedSessions (object-level: method-local
    * case classes don't get stable Encoders).
    */
  final case class Open(n: Long, startUs: Long, endUs: Long)

  /** Event-time session windows emitted ON CLOSE via
    * flatMapGroupsWithState + event-time timeout: state per user is one
    * open session (O(1)); a session is emitted when the watermark passes
    * its gap timeout. The streaming twin of `Joins.sessionize`.
    */
  def closedSessions(spark: SparkSession, events: DataFrame,
                     gapSeconds: Long = 1800L): Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout

    events
      .withWatermark("ts", "10 minutes")
      // the watermarked ts column must survive up to the stateful op —
      // projecting it away fails the streaming plan check
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("us"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Open, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(uid, s.n, s.startUs, s.endUs))
          } else {
            val gapUs = gapSeconds * 1000000L
            var closed = List.empty[SessionOut]
            var open = state.getOption
            rows.map(_._3).toSeq.sorted.foreach { us =>
              open match {
                case Some(o) if us - o.endUs <= gapUs =>
                  open = Some(o.copy(n = o.n + 1, endUs = us))
                case Some(o) =>
                  closed ::= SessionOut(uid, o.n, o.startUs, o.endUs)
                  open = Some(Open(1L, us, us))
                case None =>
                  open = Some(Open(1L, us, us))
              }
            }
            open.foreach { o =>
              state.update(o)
              state.setTimeoutTimestamp((o.endUs + gapUs) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }

  /** Production sink path: hourly aggregates written per micro-batch to
    * partitioned parquet via foreachBatch (the pattern for sinks Spark
    * has no native streaming writer for — here it also lets us
    * repartition-by-partition-column before the write so each batch
    * produces one file per hour instead of cores x hours).
    */
  def hourlyToParquet(events: DataFrame, outDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    hourlyByType(events)
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.withColumn("hour", date_format(col("ws"), "yyyy-MM-dd-HH"))
          .repartition(col("hour"))
          .write.mode("append").partitionBy("hour").parquet(outDir)
      }
      .start()

  /** The reference's `@daily` batch recurrence, Spark-native: a
    * streaming query with `Trigger.AvailableNow` drains exactly the
    * backlog accumulated since the last run, commits its offsets to the
    * checkpoint, and STOPS — incremental batch processing with
    * streaming's exactly-once offset tracking, scheduled externally
    * like any cron/batch job (ETL.py's schedule_interval='@daily',
    * without re-reading data already processed). Re-invoking with the
    * same checkpoint processes only files that arrived since.
    *
    * State posture at 100 TB: for state-heavy recurrences set
    * `spark.sql.streaming.stateStore.providerClass` to the RocksDB
    * provider so operator state lives on local disk, not executor heap
    * (exercised in StreamingSpec).
    */
  def runAvailableNow(df: DataFrame, outDir: String,
                      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()

  /** Partition column of the upsert sink table: `pmod(hash(keys), n)`.
    * Key-derived, so every version of a key lands in the same partition
    * and a batch's merge footprint is exactly the partitions its keys
    * hash into.
    */
  val upsertBucketCol = "__bucket"

  /** Streaming CDC compaction: each micro-batch of change rows is
    * MERGEd into a keyed parquet table via `Load.upsertLatest` inside
    * foreachBatch — the canonical keep-latest sink when the target store
    * has no native MERGE. See [[mergeBatchIntoTable]] for the merge
    * contract (bucket-partitioned table, touched-partitions-only
    * rewrite, batchId exactly-once sidecar).
    */
  def upsertToParquet(changes: DataFrame, tableDir: String, keyCols: Seq[String],
                      versionCol: String, nBuckets: Int = 16): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatchIntoTable(batch, tableDir, keyCols, versionCol, nBuckets, batchId)
      }
      .start()

  /** One micro-batch MERGE into a bucket-partitioned keyed parquet table.
    *
    * Scale + filesystem posture (this is the production-shaped sink):
    *   - all exists/delete/rename go through `org.apache.hadoop.fs
    *     .FileSystem`, so the same code runs on HDFS/S3A, not just
    *     `file://` — `java.io.File` would silently see nothing there;
    *   - the table is hive-partitioned by [[upsertBucketCol]] =
    *     `pmod(hash(keys), nBuckets)`; the merge reads ONLY the
    *     partitions containing this batch's keys (partition pruning on
    *     the `isin` filter) and rewrites only those, so per-batch I/O is
    *     O(touched partitions), not O(table);
    *   - the rewritten partitions are staged under `_staging_<batchId>`
    *     inside the table dir (underscore prefix: invisible to Spark's
    *     reader, same filesystem so rename is a metadata move on HDFS),
    *     then swapped in dir-by-dir — the lazily-read current state is
    *     never overwritten mid-read;
    *   - exactly-once across foreachBatch REPLAYS: a `_commits/<batchId>`
    *     marker is written after the swap; a replayed batchId returns
    *     before touching data. A crash mid-swap replays the merge, which
    *     keep-latest semantics make idempotent (same winners re-win).
    */
  def mergeBatchIntoTable(batch: DataFrame, tableDir: String, keyCols: Seq[String],
                          versionCol: String, nBuckets: Int, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val spark = batch.sparkSession
    val table = new Path(tableDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(new Path(table, "_commits"), batchId.toString)
    if (fs.exists(marker)) return // replayed batch: already merged

    // compact the batch to one row per key, tagged with its bucket
    val compacted = graft.operators.Load.upsertLatest(
        batch, batch.limit(0), keyCols, versionCol)
      .withColumn(upsertBucketCol, pmod(hash(keyCols.map(col): _*), lit(nBuckets)))
    // one-time migration: a table written by the pre-bucketed (flat)
    // sink layout has root-level part files — fold the WHOLE flat table
    // into this merge and retire those files after the swap, otherwise
    // they would silently coexist with the __bucket=* dirs and make the
    // directory unreadable (mixed depths). Checked every batch so a
    // crash between swap and retire self-heals on replay.
    val legacyFiles =
      if (fs.exists(table))
        fs.listStatus(table).filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      else Array.empty[org.apache.hadoop.fs.FileStatus]
    val toMerge =
      if (legacyFiles.isEmpty) compacted
      else {
        val legacy = spark.read
          .parquet(legacyFiles.map(_.getPath.toString).toIndexedSeq: _*)
          .withColumn(upsertBucketCol, pmod(hash(keyCols.map(col): _*), lit(nBuckets)))
        graft.operators.Load.upsertLatest(legacy, compacted, keyCols, versionCol)
      }
    // bounded collect: at most nBuckets small ints
    val touched = toMerge.select(upsertBucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    if (touched.nonEmpty) {
      val partDirs = touched.map(b => new Path(table, s"$upsertBucketCol=$b"))
      // read ONLY the touched partition dirs, addressed explicitly with
      // basePath (never a root listing — robust to stray root files)
      val existingDirs = partDirs.filter(fs.exists).map(_.toString)
      val merged =
        if (existingDirs.nonEmpty) {
          val current = spark.read.option("basePath", tableDir)
            .parquet(existingDirs.toIndexedSeq: _*)
          graft.operators.Load.upsertLatest(current, toMerge, keyCols, versionCol)
        } else toMerge
      val staging = new Path(table, s"_staging_$batchId")
      merged
        .repartition(touched.length, col(upsertBucketCol)) // one file per bucket per merge
        .write.mode("overwrite").partitionBy(upsertBucketCol).parquet(staging.toString)
      partDirs.foreach { dst =>
        val src = new Path(staging, dst.getName)
        if (fs.exists(dst)) fs.delete(dst, true)
        if (fs.exists(src)) fs.rename(src, dst)
      }
      fs.delete(staging, true) // _SUCCESS + any untouched leftovers
      legacyFiles.foreach(f => fs.delete(f.getPath, false)) // retire the flat layout
    }
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    ()
  }

  /** Read back the logical table the upsert sink maintains (the bucket
    * column is sink plumbing, not payload).
    */
  def readUpsertTable(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(tableDir).drop(upsertBucketCol)

  /** Streaming frequency sketch: each micro-batch's items fold into a
    * persistent count-min sketch table ([[graft.operators.Sketches]]) —
    * the sketch's MERGEABILITY is what makes it a streaming citizen:
    * state is O(depth × width) rows no matter how long the stream runs,
    * and the maintained table equals the sketch of the full history
    * (StreamingSpec asserts batch parity). Heavy-hitter estimates over
    * an unbounded stream for the cost of a tiny table.
    */
  def sketchToParquet(items: DataFrame, itemCol: String, tableDir: String,
                      depth: Int = 4, width: Int = 256): org.apache.spark.sql.streaming.StreamingQuery =
    items.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        mergeSketchBatch(batch.toDF(), itemCol, tableDir, depth, width, batchId)
      }
      .start()

  /** One micro-batch fold into the sketch table. Unlike the upsert sink
    * a sketch merge is NOT idempotent (counts add), so replay safety
    * cannot ride on merge semantics: the applied-batch watermark lives
    * INSIDE the versioned state dir (`current/_meta/max_batch`) and the
    * whole dir is swapped via the retire→rename→delete sequence (all
    * Hadoop FS API), so state and watermark commit atomically —
    * a replayed batchId is a no-op, a crash at any point either replays
    * cleanly or recovers the retired dir on the next batch.
    */
  def mergeSketchBatch(batch: DataFrame, itemCol: String, tableDir: String,
                       depth: Int, width: Int, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val table = new Path(tableDir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val current = new Path(table, "current")
    val retiring = new Path(table, "_retiring")
    // crash recovery first (compact()'s discipline): between the two
    // renames below the only live copy is `retiring` — restore it; after
    // the second rename a stale `retiring` copy remains — drop it
    if (fs.exists(retiring)) {
      if (!fs.exists(current)) fs.rename(retiring, current)
      else fs.delete(retiring, true)
    }
    val meta = new Path(current, "_meta/max_batch")
    // foreachBatch replays are monotone: only the last uncommitted batch
    // re-runs, so a single high-watermark file is the whole ledger
    if (fs.exists(meta)) {
      val in = fs.open(meta)
      val applied = try new String(in.readAllBytes(), "UTF-8").trim.toLong finally in.close()
      if (batchId <= applied) return
    }
    val batchSketch = graft.operators.Sketches.countMinSketch(
      batch.select(col(itemCol)), itemCol, depth, width)
    val dataDir = new Path(current, "sketch")
    val merged =
      if (fs.exists(dataDir))
        graft.operators.Sketches.mergeSketches(
          Seq(spark.read.parquet(dataDir.toString), batchSketch))
      else batchSketch
    val staging = new Path(table, s"_staging_$batchId")
    if (fs.exists(staging)) fs.delete(staging, true)
    merged.coalesce(1) // depth x width rows — one file IS the right layout
      .write.mode("overwrite").parquet(new Path(staging, "sketch").toString)
    val out = fs.create(new Path(staging, "_meta/max_batch"), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(current)) fs.rename(current, retiring)
    fs.rename(staging, current)
    fs.delete(retiring, true)
    ()
  }

  /** The sketch the streaming sink maintains, as a [[graft.operators.Sketches]]
    * frame (join with `cmsEstimate` for point estimates).
    */
  def readSketchTable(spark: SparkSession, tableDir: String): DataFrame =
    spark.read.parquet(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(tableDir), "current/sketch").toString)

  final case class UserRunning(user_id: Long, n: Long, total: Double)

  final case class UserTws(user_id: Long, n: Long, total: Double, max_value: Double)

  /** Spark 4 `StatefulProcessor` behind [[runningUserTotalsTws]]: the
    * arbitrary-state v2 API (SPIP: transformWithState). Differences from
    * mapGroupsWithState that matter at scale: named state variables
    * (value/list/map) with schema evolution, per-state TTL (state that
    * expires without a hand-rolled timeout dance), timers, and a
    * RocksDB-backed store REQUIRED — which is also the right provider at
    * 100 TB (state spills to disk + changelog checkpointing, instead of
    * a JVM-heap HashMap). State here is one O(1) record per user.
    */
  private class UserTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Double), UserTws] {
    @transient private var totals: org.apache.spark.sql.streaming.ValueState[UserTws] = _

    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[UserTws]("totals",
        org.apache.spark.sql.Encoders.product[UserTws],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserTws] = {
      val prev = if (totals.exists()) totals.get() else UserTws(key, 0L, 0.0, Double.MinValue)
      var n = prev.n
      var tot = prev.total
      var mx = prev.max_value
      rows.foreach { case (_, v) => n += 1; tot += v; mx = math.max(mx, v) }
      val next = UserTws(key, n, tot, mx)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Per-user running (count, sum, max) on the transformWithState API —
    * the same semantics as [[runningUserTotals]] (StreamingSpec asserts
    * parity), re-expressed on the v2 state API. Requires the RocksDB
    * state store provider (enforced by Spark itself).
    */
  def runningUserTotalsTws(spark: SparkSession, events: DataFrame): Dataset[UserTws] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "value")
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

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
