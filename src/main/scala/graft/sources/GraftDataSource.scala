package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.{FileFormat, PartitionSpec, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileTable
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.streaming.{EventStreams, ZoneMapFileIndex}

/** THE UPSERT TABLE AS A PLAIN-SQL DATASOURCE (round 16): until now
  * only the Scala API ([[EventStreams.readUpsertTableScan]]) could
  * reach the manifest's zone-map/bloom file pruning — a pure-SQL user
  * (`spark.read.format("graft").load(dir)`, or
  * `CREATE TABLE t USING graft OPTIONS (path '...')` followed by
  * `SELECT ... FROM t WHERE ...`) read nothing at all. This is the
  * DataSourceV2 `TableProvider` closing that gap, registered under
  * the short name `graft` (META-INF/services).
  *
  * Design: the HARD part — turning pushed catalyst predicates into
  * pruned file listings from the manifest's recorded stats — already
  * exists as [[ZoneMapFileIndex]], and Spark's own V2 parquet stack
  * (`FileTable` → `ParquetScanBuilder` → `ParquetScan`) consumes any
  * `PartitioningAwareFileIndex` and pushes its data filters into
  * `listFiles` during planning. So the provider is a THIN adapter:
  * [[GraftTable]] extends `FileTable` overriding `fileIndex` with the
  * zone-map index (built from [[EventStreams.zoneMapIndexFor]] — the
  * SAME constructor the Scala API uses, so SQL and API reads can never
  * prune differently), and `newScanBuilder` hands Spark its own
  * vectorized parquet scan builder. Everything downstream — codegen'd
  * columnar reads, column pruning, AQE, the executed scan's `numFiles`
  * evidence — is stock Spark.
  *
  * Scope guards ride along from `zoneMapIndexFor`, loud by design:
  * unfolded DELTA snapshots refuse (file-level pruning could resurrect
  * superseded versions — fold first), as do mixed-schema snapshots.
  * WRITES refuse: the table format's exactly-once guarantees live in
  * the manifest commit protocol (merge/delete/compact), which a SQL
  * INSERT would bypass.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  // the manifest is the source of truth for the schema; Spark may pass
  // a user schema through CREATE TABLE, which getTable validates below
  override def supportsExternalMetadata(): Boolean = true

  private def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "the graft format needs a table dir: .load(dir) or " +
        "OPTIONS (path '<dir>')"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventStreams.zoneMapIndexFor(SparkSession.active, pathOf(options),
      GraftDataSource.asOfOption(options))._2

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new GraftTable(SparkSession.active, options, Seq(pathOf(options)),
      Option(schema))
  }
}

object GraftDataSource {
  /** SQL TIME TRAVEL: `.option("asOf", <batchId>)` resolves the newest
    * committed snapshot at or below the id — the
    * `EventStreams.readUpsertTableAt` resolution, WITH the scan's file
    * pruning (which the plain time-travel read does not plan).
    */
  private[sources] def asOfOption(options: CaseInsensitiveStringMap): Option[Long] =
    Option(options.get("asOf")).map { v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"asOf must be a committed batch id (a long); got '$v'"))
    }
}

/** One committed graft upsert table as a V2 `FileTable` — see
  * [[GraftDataSource]]. The `fileIndex` is the zone-map index over the
  * LATEST committed snapshot (or the `asOf` option's snapshot),
  * resolved lazily at scan planning.
  */
class GraftTable(sparkSession: SparkSession,
                 options: CaseInsensitiveStringMap,
                 paths: Seq[String],
                 userSpecifiedSchema: Option[StructType])
  extends FileTable(sparkSession, options, paths, userSpecifiedSchema)
  with org.apache.spark.sql.connector.catalog.SupportsDelete {

  require(paths.size == 1,
    s"a graft table is ONE committed table dir; got ${paths.size} paths")

  // the asOf option rides the table's own options (CREATE TABLE ...
  // OPTIONS or DataFrameReader options both land here)
  private lazy val parts: (ZoneMapFileIndex, StructType) =
    EventStreams.zoneMapIndexFor(sparkSession, paths.head,
      GraftDataSource.asOfOption(options))

  override def name(): String = s"graft.`${paths.head}`"

  override def formatName: String = "graft"

  // Spark's FallBackFileSourceV2 rule rewrites SQL INSERTs over a
  // FileTable to the V1 write path using THIS format — bypassing
  // newWriteBuilder entirely. A plain ParquetFileFormat here would let
  // `INSERT INTO t` silently drop uncommitted parquet files into the
  // table dir (orphans the sweeps would then delete). The fallback
  // format refuses at prepareWrite with the same remediation.
  override def fallbackFileFormat: Class[_ <: FileFormat] =
    classOf[GraftWriteRefusingFormat]

  override lazy val fileIndex: PartitioningAwareFileIndex =
    new GraftV2Index(sparkSession, parts._1, parts._2)

  override def inferSchema(files: Seq[FileStatus]): Option[StructType] =
    Some(parts._2)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ParquetScanBuilder =
    ParquetScanBuilder(sparkSession, fileIndex, schema, parts._2,
      mergedOptions(opts))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    throw new UnsupportedOperationException(
      s"graft table ${paths.head} is written through the committed " +
        "merge/delete API (EventStreams.mergeBatchIntoTable / " +
        "deleteFromTable / compactUpsertTable) — a SQL INSERT would " +
        "bypass the manifest commit protocol and its exactly-once, " +
        "concurrency and retention guarantees")

  // ---- SQL DELETE (round 16): `DELETE FROM t WHERE <bounds>` routes
  // to the COMMITTED predicate delete (EventStreams
  // .deleteUpsertTableWhere) — zone-map classification included, so
  // provably-covered files drop from the manifest UNREAD and disjoint
  // files carry untouched, exactly like the Scala API. Only
  // conjunctions of INCLUSIVE bounds (>=, <=, =) on bare columns
  // translate: a ColBound is inclusive, so a strict `<`/`>` cannot be
  // rendered without a type-aware predecessor and deleting one extra
  // boundary row would be silent data loss — untranslatable
  // predicates refuse at analysis (canDeleteWhere), loudly. ----

  private def boundsOf(filters: Array[org.apache.spark.sql.sources.Filter]): Option[Seq[EventStreams.ColBound]] = {
    import org.apache.spark.sql.sources._
    def render(v: Any): Option[String] = v match {
      case null => None
      case _: java.lang.Number | _: String | _: java.lang.Boolean =>
        Some(v.toString)
      case t: java.sql.Timestamp => Some(t.toString)
      case i: java.time.Instant =>
        Some(java.sql.Timestamp.from(i).toString)
      case d: java.sql.Date => Some(d.toString)
      case d: java.time.LocalDate => Some(d.toString)
      case _ => None
    }
    def walk(f: Filter): Option[Seq[EventStreams.ColBound]] = f match {
      case And(l, r) => for { a <- walk(l); b <- walk(r) } yield a ++ b
      case GreaterThanOrEqual(c, v) =>
        render(v).map(s => Seq(EventStreams.ColBound(c, Some(s), None)))
      case LessThanOrEqual(c, v) =>
        render(v).map(s => Seq(EventStreams.ColBound(c, None, Some(s))))
      case EqualTo(c, v) =>
        render(v).map(s => Seq(EventStreams.ColBound(c, Some(s), Some(s))))
      case _ => None
    }
    if (filters.isEmpty) None // unbounded DELETE: use the API, loudly
    else {
      val parts = filters.toSeq.map(walk)
      if (parts.exists(_.isEmpty)) None else Some(parts.flatten.flatten)
    }
  }

  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    boundsOf(filters).isDefined

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val bounds = boundsOf(filters).getOrElse(
      throw new UnsupportedOperationException(
        "graft SQL DELETE supports conjunctions of inclusive bounds " +
          "(>=, <=, =) on bare columns; rewrite the predicate or use " +
          "EventStreams.deleteUpsertTableWhere / deleteFromTable"))
    val id = EventStreams.latestCommittedBatchId(sparkSession, paths.head)
      .getOrElse(-1L) + 1
    // retain = 2: the pre-delete snapshot stays readable through the
    // commit (the takedown legs' audit-window convention) — a SQL
    // DELETE must not be the first writer that silently narrows the
    // table's time-travel window below one commit
    EventStreams.deleteUpsertTableWhere(sparkSession, paths.head, bounds, id,
      retain = 2)
    ()
  }
}

/** The V1-fallback "format" for graft writes: every write entry point
  * refuses with the commit-protocol remediation. Reads never reach
  * this class (the V2 scan serves them); it exists only so Spark's
  * InsertIntoStatement fallback cannot write uncommitted files into a
  * committed table dir.
  */
class GraftWriteRefusingFormat extends ParquetFileFormat {
  override def prepareWrite(sparkSession: org.apache.spark.sql.SparkSession,
                            job: org.apache.hadoop.mapreduce.Job,
                            options: Map[String, String],
                            dataSchema: StructType): org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "graft tables are written through the committed merge/delete API " +
        "(EventStreams.mergeBatchIntoTable / deleteFromTable) — a SQL " +
        "INSERT would bypass the manifest commit protocol")
}

/** [[ZoneMapFileIndex]] conformed to the `PartitioningAwareFileIndex`
  * shape `FileTable`/`FileScan` require. `listFiles` delegates
  * VERBATIM — the pushed data filters hit the same extractor the V1
  * scan uses; the partitioning members are the trivial empty spec (the
  * upsert table's layout keys live in the manifest, not in Hive-style
  * directories).
  */
private[sources] class GraftV2Index(sparkSession: SparkSession,
                                    inner: ZoneMapFileIndex,
                                    dataSchema: StructType)
  extends PartitioningAwareFileIndex(sparkSession, Map.empty, Some(dataSchema)) {

  override def rootPaths: Seq[Path] = inner.rootPaths

  override def listFiles(partitionFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                         dataFilters: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =
    inner.listFiles(partitionFilters, dataFilters)

  override def sizeInBytes: Long = inner.sizeInBytes

  override def inputFiles: Array[String] = inner.inputFiles

  override def refresh(): Unit = inner.refresh()

  override def partitionSpec(): PartitionSpec = PartitionSpec.emptySpec

  override def leafFiles: scala.collection.mutable.LinkedHashMap[Path, FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[Path, FileStatus]
    inner.listFiles(Nil, Nil).foreach(_.files.foreach(f =>
      m.put(f.fileStatus.getPath, f.fileStatus)))
    m
  }

  override def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    leafFiles.values.toSeq.groupBy(_.getPath.getParent)
      .map { case (d, fs) => d -> fs.toArray }
}
