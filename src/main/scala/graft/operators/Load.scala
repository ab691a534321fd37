package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink operators (SURVEY.md §2.1 S4/S6/S7/S9).
  *
  * The reference's sinks are CSV files (ETL.py:128-129) and SQLite
  * appends through row-wise INSERTs (ETL.py:274-275). Here:
  *   - engine-internal handoffs don't exist (one lazy plan);
  *   - CSV sink kept for interchange;
  *   - the relational table becomes a catalog-registered (partitioned)
  *     parquet table — `saveAsTable` carries the DDL (schema-on-write);
  *   - append mode is the `if_exists='append'` analog.
  *
  * 100 TB posture: always partition fact-shaped outputs by a
  * low-cardinality time column so downstream reads prune partitions;
  * never coalesce(1) outside tests.
  */
object Load {

  /** S4: header CSV, overwrite (the reference's to_csv(index=False)). */
  def csvSink(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** S7: parquet append, optionally hive-style partitioned. */
  def parquetAppend(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** JSON-lines sink/scan (interchange format; schema always explicit on
    * read — inference is an extra full scan at 100 TB).
    */
  def jsonSink(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def jsonScan(spark: org.apache.spark.sql.SparkSession,
               schema: org.apache.spark.sql.types.StructType, path: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC sink/scan (the other columnar format Spark ships codecs for). */
  def orcSink(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def orcScan(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S6: named catalog table (CREATE TABLE IF NOT EXISTS + append). */
  def appendToTable(df: DataFrame, table: String): Unit = {
    val exists = df.sparkSession.catalog.tableExists(table)
    df.write.mode(if (exists) SaveMode.Append else SaveMode.ErrorIfExists)
      .saveAsTable(table)
  }

  /** Bucketed + sorted table layout — the classic 100 TB
    * shuffle-elimination lever: rows hash-partition into `nBuckets`
    * file groups BY KEY at write time (and sort within each bucket), so
    * every later join or aggregation on `key` against an equally
    * bucketed table plans with NO Exchange — the task for bucket i zips
    * bucket i of both tables. The shuffle a fact⋈fact join would pay on
    * every query is paid ONCE at load. Pair with [[Joins.bucketedJoin]];
    * PlanSpec asserts the exchange-free plan.
    */
  def bucketedTable(df: DataFrame, table: String, key: String, nBuckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    dropTableAndDir(df.sparkSession, table)
    val sort = if (sortCols.nonEmpty) sortCols else Seq(key)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(sort.head, sort.tail: _*)
      .saveAsTable(table)
  }

  /** Hive-partitioned catalog table: one directory per distinct value of
    * `partitionCol`. The 100 TB read-side lever this buys is PARTITION
    * PRUNING — a predicate on the partition column (static, or injected
    * at runtime by dynamic partition pruning from a join's build side)
    * never opens the excluded directories at all, which is strictly
    * stronger than row-group skipping: no footers, no file listings.
    * Partition by LOW-cardinality keys only (date, region, bucket id) —
    * a high-cardinality partition column shatters the table into
    * millions of small files. Pair with [[graft.SparkEntry.q116DynamicPruning]];
    * PlanSpec asserts the runtime-pruned scan.
    */
  def partitionedTable(df: DataFrame, table: String, partitionCol: String): Unit = {
    dropTableAndDir(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .partitionBy(partitionCol)
      .saveAsTable(table)
  }

  private val layoutWritten = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Write-once guard for layout side effects: runs `write` only when
    * this session has not already built `table` from the same `tag`
    * (e.g. the source dir). Layout demos (q104's bucketed tables,
    * q116's partitioned fact) call their writes through this so a
    * repeated invocation — Bench times each query 4× — measures the
    * QUERY, not a redundant rebuild of the layout whose whole premise
    * is "pay the shuffle once at load".
    */
  def ensureLayout(spark: org.apache.spark.sql.SparkSession, table: String, tag: String)
                  (write: => Unit): Unit = {
    if (layoutWritten.get(table) != tag || !spark.catalog.tableExists(table)) {
      write
      layoutWritten.put(table, tag)
    }
  }

  /** An in-memory catalog forgets managed tables across JVMs but their
    * warehouse dirs persist — saveAsTable then fails LOCATION_ALREADY_
    * EXISTS; clear a stale dir so layout writes are re-runnable.
    */
  private def dropTableAndDir(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
      table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Sorted data layout: `sortWithinPartitions(key)` before the write
    * clusters each output file by `key`, so parquet row-group min/max
    * statistics become SELECTIVE — a pushed-down predicate on `key`
    * skips every row group whose [min, max] excludes it. On an unsorted
    * layout each row group spans nearly the whole key domain and the
    * stats prune nothing. This is the cheap half of Z-ordering (exact
    * for one key), and at 100 TB it is the difference between reading a
    * few megabytes and scanning the table for a selective lookup.
    * Intra-partition sort only — no shuffle is added to the write.
    * LoadSpec counts matching row groups via the parquet footers.
    */
  def sortedLayout(df: DataFrame, path: String, key: String,
                   writerOpts: Map[String, String] = Map.empty): Unit =
    df.sortWithinPartitions(key)
      .write.mode(SaveMode.Overwrite).options(writerOpts).parquet(path)

  /** Z-order (Morton) layout over TWO keys: each key is min-max
    * normalized to 16 bits (one tiny agg pass for the global bounds),
    * the bits are interleaved into a 32-bit z-value by a pure codegen'd
    * bitwise expression tree, and the data is range-partitioned + sorted
    * by that z-value. Row groups then cover small RECTANGLES of the
    * (a, b) key space instead of thin stripes, so min/max stats prune
    * selective predicates on EITHER key — the property a single-key
    * [[sortedLayout]] only has for its sort key. This is the standard
    * lakehouse multi-dimensional clustering lever; at 100 TB it is the
    * difference between a two-key lookup scanning the table and reading
    * a few row groups. The range partitioning is an explicit, documented
    * layout-time shuffle (paid once at write, like bucketing).
    */
  def zorderLayout(df: DataFrame, path: String, keyA: String, keyB: String,
                   writerOpts: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.Column
    val bounds = df.agg(
      min(col(keyA)).cast("double"), max(col(keyA)).cast("double"),
      min(col(keyB)).cast("double"), max(col(keyB)).cast("double")).head()
    if (bounds.isNullAt(0) || bounds.isNullAt(2)) {
      // empty input or all-null key column: nothing to cluster on —
      // write as-is instead of NPEing on the missing bounds
      df.write.mode(SaveMode.Overwrite).options(writerOpts).parquet(path)
      return
    }
    // null key values deliberately land in z-bucket 0 (sort first)
    def scale16(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else coalesce(least(lit(65535L),
        floor((c.cast("double") - lit(lo)) / lit(hi - lo) * 65536.0).cast("long")), lit(0L))
    val a16 = scale16(col(keyA), bounds.getDouble(0), bounds.getDouble(1))
    val b16 = scale16(col(keyB), bounds.getDouble(2), bounds.getDouble(3))
    val z = (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a16, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b16, i).bitwiseAND(lit(1L)), 2 * i))
    }
    df.withColumn("__z", z)
      .repartitionByRange(col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).options(writerOpts).parquet(path)
  }

  /** Small-file compaction for a parquet directory — the hygiene op
    * every micro-batch sink needs: streaming appends accrete thousands
    * of tiny files, and at 100 TB the listing/NameNode cost and
    * per-file reader open overhead dominate scans long before data
    * volume does. Rewrites the directory into ceil(totalBytes /
    * targetBytes) files via write-staging-then-swap on the Hadoop
    * FileSystem API (HDFS/S3A-safe, same discipline as the streaming
    * upsert sink). Returns (filesBefore, filesAfter).
    *
    * Coalesce, not repartition: merging files needs no shuffle. For
    * hive-partitioned dirs compact each partition dir independently so
    * the partition column layout is preserved.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path.getParent, s".${path.getName}_compacting")
    val retired = new Path(path.getParent, s".${path.getName}_retiring")
    // crash recovery FIRST: a kill between the two swap renames below
    // leaves the only live copy under `retired` — restore it; a kill
    // after the second rename leaves a stale `retired` copy — drop it
    if (fs.exists(retired)) {
      if (!fs.exists(path)) fs.rename(retired, path)
      else fs.delete(retired, true)
    }
    val dataFiles = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles.length
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (before <= nOut) return (before, before) // already compact enough
    if (fs.exists(staging)) fs.delete(staging, true)
    spark.read.parquet(dir).coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    // rename-rename-delete, never delete-then-rename: the live data is
    // always recoverable (see the recovery branch above)
    fs.rename(path, retired)
    fs.rename(staging, path)
    fs.delete(retired, true)
    val after = fs.listStatus(path)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    (before, after)
  }

  /** SCD Type-2 dimension history from a CDC change log: every change
    * record becomes one history row carrying its own version as
    * `valid_from`, the NEXT change's version for the same key as
    * `valid_to` (null while current), and an `is_current` flag — the
    * standard warehouse shape for "what did this dimension row look
    * like at version v" queries ([[upsertLatest]] is its keep-latest
    * projection). One `lead` window partitioned by key, ordered by
    * version: the shuffle carries the change LOG (not the dimension's
    * cross product), and each per-key group is only that key's change
    * history, so no straggler groups at 100 TB unless one key mutates
    * pathologically often. Same contract as upsertLatest: `versionCol`
    * must be unique per key.
    */
  def scdType2(changes: DataFrame, keyCols: Seq[String], versionCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(versionCol))
    changes
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** CDC-style upsert (MERGE keep-latest): base ∪ updates, one row per
    * key — the row with the highest `versionCol`. Single hash aggregate
    * with map-side partials (`max_by` over a struct), NOT a window: a
    * row_number-over-key formulation sorts every key group, while this
    * shape shuffles one candidate row per (partition, key). Callers must
    * guarantee `versionCol` is unique per key (ties would be
    * non-deterministic — the usual CDC sequence/commit-ts contract).
    */
  def upsertLatest(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
                   versionCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val all = base.unionByName(updates)
    val others = all.columns.filterNot(keyCols.contains).toSeq
    all.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(others.map(col): _*), col(versionCol)).as("__r"))
      .select(keyCols.map(col) ++ others.map(c => col(s"__r.`$c`").as(c)): _*)
  }
}
