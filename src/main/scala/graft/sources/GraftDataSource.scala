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

  // the LOGICAL schema (translated, reconcile-agnostic): registering a
  // catalog table over a delta-postured or renamed-unfolded snapshot is
  // legal — writes (MERGE/UPDATE/DELETE) work there; only the pruned
  // SCAN refuses, at scan planning, where the guard belongs (r17 — the
  // zoneMapIndexFor guard here blocked CREATE TABLE over delta tables)
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    if (GraftDataSource.isChangeFeed(options))
      GraftChangeFeedTable.feedSchemaOf(spark, pathOf(options))
    else GraftDataSource.asOfOption(options) match {
      case Some(at) => EventStreams.readUpsertTableAt(spark, pathOf(options), at).schema
      case None => EventStreams.readUpsertTable(spark, pathOf(options)).schema
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    if (GraftDataSource.isChangeFeed(options)) {
      require(GraftDataSource.asOfOption(options).isEmpty,
        "the change feed streams the LIVE chain; asOf does not compose " +
          "with feed=changes (seed the cursor with startingBatchId)")
      new GraftChangeFeedTable(SparkSession.active, pathOf(options), options)
    } else
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

  /** The session-pinned SQL commit id (`SET graft.sql.batchId = <n>`),
    * if any — the exactly-once handle for scheduled SQL writers: a
    * replayed statement under the same pinned id no-ops (the manifest
    * watermark), and a scheduler hands concurrent writers DISTINCT ids
    * so auto-assigned head+1 ids cannot collide.
    */
  private[graft] def sqlBatchId(spark: SparkSession): Option[Long] =
    spark.conf.getOption("graft.sql.batchId").map { v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft.sql.batchId must be a long; got '$v'"))
    }

  /** `.option("feed", "changes")` selects the STREAMING change-feed
    * handle ([[GraftChangeFeedTable]]) instead of the batch table — an
    * explicit shape, because the feed's schema carries `_change_type`
    * and its delete rows must never be silently dropped into an
    * upsert-only stream.
    */
  private[sources] def isChangeFeed(options: CaseInsensitiveStringMap): Boolean =
    Option(options.get("feed")) match {
      case None => false
      case Some("changes") => true
      case Some(other) => throw new IllegalArgumentException(
        s"unknown feed shape '$other'; the graft format streams " +
          "feed=changes (the net-change feed)")
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

  /** The committed table dir — what the SQL write surface routes to. */
  def tableDir: String = paths.head

  /** The time-travel pin, if this handle was opened with one. */
  def asOfOpt: Option[Long] = GraftDataSource.asOfOption(options)

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

  // the LOGICAL schema, without touching the scan's file index:
  // FileTable.dataSchema otherwise resolves through `fileIndex`, whose
  // single-era/no-delta guards must fire at SCAN planning, not at
  // table resolution (a catalog table over a delta snapshot is legal
  // to WRITE to — r17)
  override lazy val dataSchema: StructType = userSpecifiedSchema.getOrElse {
    GraftDataSource.asOfOption(options) match {
      case Some(at) =>
        EventStreams.readUpsertTableAt(sparkSession, paths.head, at).schema
      case None => EventStreams.readUpsertTable(sparkSession, paths.head).schema
    }
  }

  // FileTable.schema appends the file index's partition schema — a
  // graft table has none (layout keys live in the manifest), so the
  // logical schema IS the table schema, again without forcing the
  // scan guards at resolution
  override lazy val schema: StructType = dataSchema

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
  // files carry untouched, exactly like the Scala API. Conjunctions of
  // INCLUSIVE bounds (>=, <=, =) on bare columns translate directly; a
  // STRICT `<`/`>` translates only on DISCRETE types (integral, date,
  // timestamp-micros, fixed-scale decimal) where the adjacent value is
  // exact — `ts < '2026-01-01'` becomes `ts <= predecessor-micro`, the
  // retention idiom (round 17). Continuous types (float/double/string)
  // have no safe adjacent value: rendering one would silently delete or
  // retain a boundary row, so those strict bounds — and every other
  // untranslatable predicate — refuse at analysis (canDeleteWhere),
  // loudly. ----

  /** A pushed filter value in the column's canonical bound form.
    * TIMESTAMP values arrive as an INSTANT; the bound string is
    * interpreted as a SESSION-zone wall clock downstream
    * (`deleteUpsertTableWhere`'s `lit(v).cast` row predicate, and the
    * stats proofs whose statsTz the commit requires to MATCH the
    * session) — so the instant renders through the session zone, never
    * `Timestamp.toString`'s JVM-default zone (ADVICE r16: a JVM whose
    * default differed from the session silently SHIFTED the delete
    * window). Dates are zone-free day values; their canonical
    * renderings are exact as-is.
    */
  private def render(v: Any): Option[String] = v match {
    case null => None
    case _: java.lang.Number | _: String | _: java.lang.Boolean =>
      Some(v.toString)
    case t: java.sql.Timestamp => Some(renderInstant(t.toInstant))
    case i: java.time.Instant => Some(renderInstant(i))
    case d: java.sql.Date => Some(d.toString)
    case d: java.time.LocalDate => Some(d.toString)
    case _ => None
  }

  private def renderInstant(i: java.time.Instant): String =
    java.time.ZonedDateTime.ofInstant(i, java.time.ZoneId.of(
      sparkSession.sessionState.conf.sessionLocalTimeZone))
      .format(GraftTable.microsFormat)

  /** The exact SUCCESSOR of a strict-`>` bound value (inclusive lo), or
    * None when the column's type is not discrete. An integral successor
    * past the type's range renders anyway — it overlaps nothing, so the
    * delete correctly no-ops (x > MaxValue matches no row).
    */
  private def succOf(column: String, v: Any): Option[String] =
    adjacentOf(column, v, +1)

  /** The exact PREDECESSOR of a strict-`<` bound value (inclusive hi). */
  private def predOf(column: String, v: Any): Option[String] =
    adjacentOf(column, v, -1)

  private def adjacentOf(column: String, v: Any, dir: Int): Option[String] = {
    import org.apache.spark.sql.types._
    if (v == null || !schema.fieldNames.contains(column)) return None
    schema(column).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        render(v).map(s => (BigInt(s) + dir).toString)
      case DateType =>
        render(v).map(s => java.time.LocalDate.parse(s).plusDays(dir).toString)
      case TimestampType => (v match {
        case t: java.sql.Timestamp => Some(t.toInstant)
        case i: java.time.Instant => Some(i)
        case _ => None
      }).map(i => renderInstant(i.plusNanos(1000L * dir))) // micros: the
        // storage (and stats-string) resolution — the adjacent value is exact
      case d: DecimalType => v match {
        case b: java.math.BigDecimal =>
          // fixed-scale decimals step in exact units of 10^-scale
          Some(b.add(java.math.BigDecimal.valueOf(dir)
            .movePointLeft(d.scale)).toPlainString)
        case _ => None
      }
      case _ => None // float/double/string/boolean: no safe adjacent value
    }
  }

  private def boundsOf(filters: Array[org.apache.spark.sql.sources.Filter]): Option[Seq[EventStreams.ColBound]] = {
    import org.apache.spark.sql.sources._
    def walk(f: Filter): Option[Seq[EventStreams.ColBound]] = f match {
      case And(l, r) => for { a <- walk(l); b <- walk(r) } yield a ++ b
      case GreaterThanOrEqual(c, v) =>
        render(v).map(s => Seq(EventStreams.ColBound(c, Some(s), None)))
      case LessThanOrEqual(c, v) =>
        render(v).map(s => Seq(EventStreams.ColBound(c, None, Some(s))))
      case EqualTo(c, v) =>
        render(v).map(s => Seq(EventStreams.ColBound(c, Some(s), Some(s))))
      case GreaterThan(c, v) =>
        succOf(c, v).map(s => Seq(EventStreams.ColBound(c, Some(s), None)))
      case LessThan(c, v) =>
        predOf(c, v).map(s => Seq(EventStreams.ColBound(c, None, Some(s))))
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
    // a time-travel handle reads batch `asOf` but a delete can only
    // target the LATEST snapshot — mutating a different world than the
    // handle's SELECTs show would be silent (ADVICE r16); refuse loudly
    GraftDataSource.asOfOption(options).foreach { at =>
      throw new UnsupportedOperationException(
        s"graft table ${paths.head} was opened with asOf=$at (time " +
          "travel): its SELECTs serve that snapshot but a DELETE would " +
          "mutate the LATEST one — open the table without asOf to delete")
    }
    val bounds = boundsOf(filters).getOrElse(
      throw new UnsupportedOperationException(
        "graft SQL DELETE supports conjunctions of bounds on bare " +
          "columns (inclusive >=/<=/= on any type; strict </> only on " +
          "discrete types — integral, date, timestamp, decimal); " +
          "rewrite the predicate or use " +
          "EventStreams.deleteUpsertTableWhere / deleteFromTable"))
    // the commit id: `graft.sql.batchId` when the session pins one (a
    // scheduler's exactly-once handle — a replayed pinned id no-ops,
    // and concurrent SQL writers can be handed distinct ids), else
    // head+1 (the single-statement convenience)
    val id = GraftDataSource.sqlBatchId(sparkSession).getOrElse(
      EventStreams.latestCommittedBatchId(sparkSession, paths.head)
        .getOrElse(-1L) + 1)
    // retain = 2: the pre-delete snapshot stays readable through the
    // commit (the takedown legs' audit-window convention) — a SQL
    // DELETE must not be the first writer that silently narrows the
    // table's time-travel window below one commit
    EventStreams.deleteUpsertTableWhere(sparkSession, paths.head, bounds, id,
      retain = 2)
    ()
  }
}

object GraftTable {
  /** The fixed-width micros wall-clock rendering the zone-map stats use
    * (`statValue`'s `date_format` pattern) — bound strings must align
    * with it or a bound like "...00:00:00" lexicographically undercuts
    * a file min of "...00:00:00.000000" holding exactly that instant.
    */
  private[sources] val microsFormat =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
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
