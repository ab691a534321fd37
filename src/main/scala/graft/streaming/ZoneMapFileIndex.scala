package graft.streaming

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ZONE-MAP PRUNING INSIDE CATALYST'S SCAN PLANNING — the
  * [[EventStreams.readUpsertTableWhere]] classifier packaged as a
  * Spark [[FileIndex]], so a PLAIN `df.filter(col("ts") >= x)` over
  * [[EventStreams.readUpsertTableScan]] prunes data files with no
  * special read API: Catalyst pushes the filter's conjuncts into
  * `listFiles(dataFilters)` during planning, this index tests each
  * live file's recorded min/max against the extractable range bounds,
  * and the `FileSourceScanExec` that plans on the survivors reports
  * the pruned `numFiles` in its own metrics — the evidence surface
  * q207 pins. Joins whose pushable predicates reach the scan prune
  * the same way, because this is the idiomatic integration point (the
  * same hook partition pruning and Delta-style data skipping use),
  * not a bolt-on rewrite rule.
  *
  * Extraction is deliberately CONSERVATIVE — pruning must only ever
  * be an optimization: top-level conjuncts that are simple
  * comparisons (`>=`, `<=`, `>`, `<`, `=`, either operand order)
  * between a bare column and a foldable literal of a stats-supported
  * type become inclusive bounds (strict bounds weaken to inclusive —
  * sound); everything else (casts, functions, OR trees, UDFs, null
  * literals) contributes no bound and the file is read. Files without
  * recorded stats always read; all-null files never match a range.
  */
final class ZoneMapFileIndex(
    table: Path,
    files: Seq[(FileStatus, String)], // (status, table-relative path)
    stats: EventStreams.FileStats,
    schema: StructType,
    bloomCols: Set[String] = Set.empty) extends FileIndex {

  override def rootPaths: Seq[Path] = Seq(table)

  override def partitionSchema: StructType = StructType(Nil)

  override def sizeInBytes: Long = files.map(_._1.getLen).sum

  override def inputFiles: Array[String] =
    files.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val typed = ZoneMapFileIndex.extractBounds(dataFilters, schema)
    // equality conjuncts on bloom-contracted columns also test the
    // files' membership sketches — the probe positions come from a
    // DRIVER-SIDE eval of the same XxHash64 expression the writer
    // aggregated with (type-guarded: hash equality needs value+type
    // equality), no job at planning time
    val probes: Map[String, (Int, Int)] =
      ZoneMapFileIndex.extractEqualities(dataFilters, schema).collect {
        case (c, l) if bloomCols(c) && schema(c).dataType == l.dataType =>
          def pmod(x: Long): Int =
            (((x % EventStreams.bloomBits) + EventStreams.bloomBits) %
              EventStreams.bloomBits).toInt
          val h1 = XxHash64(Seq(l), 42L).eval(null).asInstanceOf[Long]
          val h2 = XxHash64(Seq(l, Literal(1L)), 42L).eval(null)
            .asInstanceOf[Long]
          c -> ((pmod(h1), pmod(h2)))
      }
    def bloomPass(rel: String): Boolean = probes.forall { case (c, (h1, h2)) =>
      stats.get(rel).flatMap(_.get(EventStreams.bloomKey(c)))
        .flatMap(_._1) match {
        case None => true // no sketch recorded: conservative, read it
        case Some(b64) =>
          val bits = java.util.Base64.getDecoder.decode(b64)
          def has(p: Int) = (bits(p >> 3) & (1 << (p & 7))) != 0
          has(h1) && has(h2)
      }
    }
    val survivors =
      if (typed.isEmpty && probes.isEmpty) files
      else files.filter { case (_, rel) =>
        EventStreams.statsOverlap(stats, typed, rel) && bloomPass(rel)
      }
    Seq(PartitionDirectory(InternalRow.empty, survivors.map(_._1).toArray))
  }
}

object ZoneMapFileIndex {

  /** Canonical-string form of a pushed literal under the column's
    * type, aligned with the writer's stats rendering; None = not a
    * type the zone maps compare (no bound extracted).
    */
  private def canonical(dt: DataType, v: Any): Option[String] =
    Option(v).flatMap { value =>
      dt match {
        case StringType => Some(value.asInstanceOf[UTF8String].toString)
        case ByteType | ShortType | IntegerType | LongType | BooleanType =>
          Some(value.toString)
        case FloatType | DoubleType => Some(value.toString)
        case _: DecimalType => Some(value.toString)
        case DateType => Some(
          java.time.LocalDate.ofEpochDay(value.asInstanceOf[Int].toLong).toString)
        case TimestampType =>
          val micros = value.asInstanceOf[Long]
          val i = java.time.Instant.EPOCH.plusNanos(micros * 1000L)
          val dtm = java.time.LocalDateTime.ofInstant(i, java.time.ZoneOffset.UTC)
          Some(f"${dtm.getYear}%04d-${dtm.getMonthValue}%02d-${dtm.getDayOfMonth}%02d " +
            f"${dtm.getHour}%02d:${dtm.getMinute}%02d:${dtm.getSecond}%02d." +
            f"${dtm.getNano / 1000}%06d")
        case _ => None
      }
    }

  /** The inclusive bounds extractable from the pushed conjuncts, in
    * [[EventStreams.statsOverlap]]'s typed shape. Conjuncts that
    * don't match the simple column-vs-literal form extract nothing
    * (the file reads — conservative).
    */
  private[streaming] def extractBounds(
      dataFilters: Seq[Expression],
      schema: StructType): Seq[(String, DataType, Option[String], Option[String])] = {
    val perCol = scala.collection.mutable.Map
      .empty[String, (Option[String], Option[String])]
    def dtOf(name: String): Option[DataType] =
      schema.fields.find(_.name == name).map(_.dataType)
    def tighten(c: String, dt: DataType, lo: Option[String],
                hi: Option[String]): Unit = {
      val (l0, h0) = perCol.getOrElse(c, (None, None))
      val l = (l0 ++ lo).reduceOption((a, b) =>
        if (EventStreams.statCompare(dt, a, b) >= 0) a else b)
      val h = (h0 ++ hi).reduceOption((a, b) =>
        if (EventStreams.statCompare(dt, a, b) <= 0) a else b)
      perCol(c) = (l, h)
    }
    def bound(a: Expression, l: Literal, loSide: Boolean): Unit = a match {
      case ar: AttributeReference =>
        dtOf(ar.name).foreach { dt =>
          canonical(dt, l.value).foreach { v =>
            if (loSide) tighten(ar.name, dt, Some(v), None)
            else tighten(ar.name, dt, None, Some(v))
          }
        }
      case _ => // cast/function over the column: no bound, stay exact
    }
    def walk(e: Expression): Unit = e match {
      case And(lhs, rhs) => walk(lhs); walk(rhs)
      case GreaterThanOrEqual(a, l: Literal) => bound(a, l, loSide = true)
      case GreaterThan(a, l: Literal) => bound(a, l, loSide = true)
      case LessThanOrEqual(a, l: Literal) => bound(a, l, loSide = false)
      case LessThan(a, l: Literal) => bound(a, l, loSide = false)
      case EqualTo(a, l: Literal) =>
        bound(a, l, loSide = true); bound(a, l, loSide = false)
      case GreaterThanOrEqual(l: Literal, a) => bound(a, l, loSide = false)
      case GreaterThan(l: Literal, a) => bound(a, l, loSide = false)
      case LessThanOrEqual(l: Literal, a) => bound(a, l, loSide = true)
      case LessThan(l: Literal, a) => bound(a, l, loSide = true)
      case EqualTo(l: Literal, a) =>
        bound(a, l, loSide = true); bound(a, l, loSide = false)
      case _ => // IsNotNull, Or, In, UDFs, ...: no bound from this conjunct
    }
    dataFilters.foreach(walk)
    perCol.toSeq.map { case (c, (lo, hi)) =>
      (c, dtOf(c).get, lo, hi)
    }.filter(t => t._3.isDefined || t._4.isDefined)
  }

  /** Top-level equality conjuncts (bare column = literal, either
    * order, reached through Ands) — the bloom-probe inputs. A column
    * equated to two DIFFERENT literals keeps the first; the range
    * bounds already prune that contradiction to nothing.
    */
  private[streaming] def extractEqualities(
      dataFilters: Seq[Expression],
      schema: StructType): Map[String, Literal] = {
    val out = scala.collection.mutable.Map.empty[String, Literal]
    def put(a: Expression, l: Literal): Unit = a match {
      case ar: AttributeReference
        if schema.fieldNames.contains(ar.name) && l.value != null =>
        out.getOrElseUpdate(ar.name, l)
      case _ =>
    }
    def walk(e: Expression): Unit = e match {
      case And(lhs, rhs) => walk(lhs); walk(rhs)
      case EqualTo(a, l: Literal) => put(a, l)
      case EqualTo(l: Literal, a) => put(a, l)
      case _ =>
    }
    dataFilters.foreach(walk)
    out.toMap
  }
}
