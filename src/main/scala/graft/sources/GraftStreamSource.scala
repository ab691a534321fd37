package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.streaming.EventStreams

/** THE CHANGE FEED AS A FIRST-CLASS SPARK STREAMING SOURCE (round 17):
  * `spark.readStream.format("graft").option("feed", "changes")
  * .load(dir)` turns any Spark streaming job into a standing consumer
  * of a graft table's net-change feed — until now that required the
  * bespoke [[graft.streaming.FeedStream]] Scala API.
  *
  * DESIGN — offsets are COMMIT IDS: the `_manifests` chain already IS
  * a totally-ordered, replayable feed, so the stream's offset is
  * simply the committed batch id, and one micro-batch over
  * `(start, end]` delivers [[EventStreams.readChangeFeed]]'s NET diff
  * for exactly that window — one row per changed key, tagged
  * `_change_type` upsert/delete, fold-skip and O(touched-buckets)
  * cost guarantees included. Each planned micro-batch MATERIALIZES
  * its diff under the stream's checkpoint (one bounded distributed
  * write, O(changed window), never O(table)) and serves it through
  * Spark's own vectorized parquet partitions; a crash between
  * planning and commit replays the SAME window and reuses the staged
  * result (idempotent by the `_SUCCESS`-marked directory), and the
  * engine's offset WAL makes delivery exactly-once per batch. An idle
  * trigger costs one manifest listing.
  *
  * BOUNDED BACKLOG: `maxCommitsPerTrigger` caps each micro-batch at
  * that many commits above the cursor ([[EventStreams
  * .boundedFeedTarget]] — the continuous-feed convention), so a giant
  * backlog drains in bounded windows instead of one giant diff.
  * `startingBatchId` seeds the cursor (a committed id — its snapshot
  * is the consumer's base; use the smallest retained id to bootstrap
  * from earliest); default is the head at stream start (changes-only,
  * the "latest" convention).
  *
  * The handle is STREAMING-ONLY and explicitly shaped: without
  * `feed=changes` the plain graft table refuses streaming reads (its
  * schema has no change column — serving upsert rows while silently
  * dropping deletes would corrupt any replica built on it), and the
  * feed handle refuses batch reads (batch diffs are
  * `readChangeFeed`'s API). Windows that cross a rename or re-bucket
  * fail loudly with the resync remediation — the change-feed
  * contract, unchanged.
  */
class GraftChangeFeedTable(spark: SparkSession, dir: String,
                           options: CaseInsensitiveStringMap)
  extends Table with SupportsRead {

  private[sources] lazy val feedSchema: StructType =
    GraftChangeFeedTable.feedSchemaOf(spark, dir)

  override def name(): String = s"graft.changefeed.`$dir`"

  override def schema(): StructType = feedSchema

  // BATCH_READ is declared so a batch `spark.read` reaches OUR loud
  // streaming-only refusal (GraftChangeFeedScan.toBatch) instead of
  // Spark's generic not-a-data-source fallback
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftChangeFeedScan(spark, dir,
        feedSchema, options)
    }
}

object GraftChangeFeedTable {
  private[sources] def feedSchemaOf(spark: SparkSession,
                                    dir: String): StructType =
    EventStreams.readUpsertTable(spark, dir).schema
      .add(EventStreams.changeTypeCol, org.apache.spark.sql.types.StringType)
}

private[sources] class GraftChangeFeedScan(spark: SparkSession, dir: String,
                                           feedSchema: StructType,
                                           options: CaseInsensitiveStringMap)
  extends Scan {

  override def readSchema(): StructType = feedSchema

  override def description(): String = s"GraftChangeFeed $dir"

  override def toBatch: Batch =
    throw new UnsupportedOperationException(
      s"the graft change-feed handle on $dir is STREAMING-ONLY " +
        "(spark.readStream); batch window diffs are " +
        "EventStreams.readChangeFeed(dir, from, to)")

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GraftMicroBatchStream(spark, dir, feedSchema, checkpointLocation,
      options)
}

/** One committed batch id as a streaming offset. */
case class GraftOffset(batchId: Long) extends Offset {
  override def json(): String = batchId.toString
}

private[sources] class GraftMicroBatchStream(spark: SparkSession,
                                             dir: String,
                                             feedSchema: StructType,
                                             checkpointLocation: String,
                                             options: CaseInsensitiveStringMap)
  extends MicroBatchStream with SupportsAdmissionControl
  with SupportsTriggerAvailableNow {

  private val maxCommits =
    Option(options.get("maxCommitsPerTrigger")).map { v =>
      val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"maxCommitsPerTrigger must be an int; got '$v'"))
      require(n > 0, s"maxCommitsPerTrigger must be positive; got $n")
      n
    }.getOrElse(0) // 0 = drain to the watermark

  private def head: Long =
    EventStreams.latestCommittedBatchId(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"$dir has no committed manifest; nothing to stream from"))

  private val stageRoot = new Path(checkpointLocation, "graft-feed-batches")

  private def fs = stageRoot.getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  override def initialOffset(): Offset = {
    val start = Option(options.get("startingBatchId")) match {
      case Some(v) => v.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"startingBatchId must be a committed batch id; got '$v'"))
      case None => head // "latest": only new changes stream
    }
    GraftOffset(start)
  }

  override def deserializeOffset(json: String): Offset =
    GraftOffset(json.trim.toLong)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) drives this stream (admission control)")

  // Trigger.AvailableNow: pin the drain target at start; the engine
  // keeps triggering bounded windows until offsets reach it (without
  // this, the engine's fallback wrapper would take ONE admission-
  // bounded window as "all available" and stop mid-backlog)
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowTarget = Some(head)
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftOffset].batchId
    val wm0 = head
    val wm = availableNowTarget.map(math.min(_, wm0)).getOrElse(wm0)
    if (wm <= from) GraftOffset(from)
    else GraftOffset(
      EventStreams.boundedFeedTarget(spark, dir, from, wm, maxCommits))
  }

  /** Plan one window: materialize the net diff under the checkpoint
    * (reusing a `_SUCCESS`-complete staging from a crashed attempt —
    * the replayed window is identical because both boundary snapshots
    * are immutable committed manifests) and serve the staged parquet
    * through Spark's own scan partitions.
    */
  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftOffset].batchId
    val to = end.asInstanceOf[GraftOffset].batchId
    if (to <= from) return Array.empty
    val stage = new Path(stageRoot, s"$from-$to")
    val done = new Path(stage, "_SUCCESS")
    if (!fs.exists(done)) {
      val diff = EventStreams.readChangeFeed(spark, dir, from, Some(to))
      // align to the stream's fixed schema: a widened table adds
      // NULL-filled columns to older windows; columns the stream has
      // never seen refuse via select (resync: restart the stream)
      val aligned = feedSchema.fields.foldLeft(diff) { (d, f) =>
        if (d.columns.contains(f.name)) d
        else d.withColumn(f.name,
          org.apache.spark.sql.functions.lit(null).cast(f.dataType))
      }.select(feedSchema.fieldNames.map(org.apache.spark.sql.functions.col)
        .toIndexedSeq: _*)
      aligned.write.mode("overwrite").parquet(stage.toString)
    }
    stagedScan(Seq(stage)).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    fs.mkdirs(stageRoot) // the factory template scan lists the root
    stagedScan(Seq(stageRoot)).createReaderFactory()
  }

  private def stagedScan(paths: Seq[Path]): ParquetScan = {
    val index = new InMemoryFileIndex(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      paths, Map.empty, Some(feedSchema))
    ParquetScan(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      spark.sessionState.newHadoopConfWithOptions(Map.empty),
      index, feedSchema, feedSchema, new StructType(),
      Array.empty[org.apache.spark.sql.sources.Filter],
      new CaseInsensitiveStringMap(
        java.util.Collections.emptyMap[String, String]()),
      None, Nil, Nil)
  }

  /** The engine committed every batch at or below `end`: staged
    * windows wholly below it are dead — collect them (bounded listing
    * of the stream's own staging dir).
    */
  override def commit(end: Offset): Unit = {
    val to = end.asInstanceOf[GraftOffset].batchId
    if (fs.exists(stageRoot)) fs.listStatus(stageRoot).foreach { s =>
      s.getPath.getName.split("-") match {
        case Array(_, e) if e.toLongOption.exists(_ <= to) =>
          fs.delete(s.getPath, true)
        case _ =>
      }
    }
  }

  override def stop(): Unit = ()
}
