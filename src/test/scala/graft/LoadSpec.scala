package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Load

class LoadSpec extends SparkSpec {
  import spark.implicits._

  private def df2 = Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-02"))
    .toDF("id", "v", "d")

  test("csv sink round-trips with header") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    Load.csvSink(df2, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 2)
    assert(back.columns.toSeq === Seq("id", "v", "d"))
  }

  test("parquet append accumulates and partition pruning works") {
    val dir = Files.createTempDirectory("graft-parq").toString + "/out"
    Load.parquetAppend(df2, dir, Seq("d"))
    Load.parquetAppend(df2.filter(col("id") === 1L), dir, Seq("d"))
    val back = spark.read.parquet(dir)
    assert(back.count() === 3)
    // partition filter must prune to the one directory
    val pruned = back.filter(col("d") === "2024-01-02")
    assert(pruned.count() === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") || pruned.inputFiles.length === 1)
  }

  test("json and orc sinks round-trip") {
    val base = Files.createTempDirectory("graft-fmt").toString
    Load.jsonSink(df2, s"$base/j")
    val jBack = Load.jsonScan(spark, df2.schema, s"$base/j")
    assert(jBack.count() === 2)
    assert(jBack.columns.sorted.toSeq === df2.columns.sorted.toSeq)
    Load.orcSink(df2, s"$base/o")
    val oBack = Load.orcScan(spark, s"$base/o")
    assert(oBack.count() === 2)
    // file formats read everything back nullable — compare names+types only
    assert(oBack.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df2.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("partitioned parquet sink enables partition pruning on read") {
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft-part").toString
    val df = Seq((1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-02"))
      .toDF("v", "d")
    Load.parquetAppend(df, s"$base/p", Seq("d"))
    val read = spark.read.parquet(s"$base/p").filter(col("d") === "2024-01-02")
    val plan = read.queryExecution.executedPlan.toString
    // the filter must prune at the PARTITION level (directory skip), not
    // as a row-level data filter after reading everything
    assert(plan.contains("PartitionFilters: [isnotnull(d"), plan.take(500))
    assert(read.count() === 2)
    assert(read.select("v").collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
  }

  test("upsertLatest keeps exactly the highest-version row per key") {
    import spark.implicits._
    val base = Seq((1L, "a", 1), (2L, "b", 1), (3L, "c", 1)).toDF("k", "payload", "version")
    val updates = Seq((2L, "B2", 2), (3L, "C2", 2), (3L, "C3", 3), (4L, "d", 1))
      .toDF("k", "payload", "version")
    val merged = Load.upsertLatest(base, updates, Seq("k"), "version")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(merged === Map(
      1L -> ("a", 1),   // untouched base row survives
      2L -> ("B2", 2),  // update wins
      3L -> ("C3", 3),  // highest of multiple updates wins
      4L -> ("d", 1)))  // insert-only key appears
  }

  /** How many row groups a key-equality probe must read under a layout,
    * straight from the parquet footers — the stats the reader's
    * row-group skip consults. Returns (matching, total).
    */
  private def matchingRowGroups(dir: String, key: String, v: Long): (Int, Int) = {
    import scala.jdk.CollectionConverters._
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val conf = spark.sparkContext.hadoopConfiguration
    val perGroup = files.flatMap { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try reader.getFooter.getBlocks.asScala.toSeq.map { b =>
        val c = b.getColumns.asScala
          .find(_.getPath.toDotString == key).get
        val st = c.getStatistics
          .asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
        st.getMin <= v && v <= st.getMax
      } finally reader.close()
    }
    (perGroup.count(identity), perGroup.length)
  }

  test("sorted layout makes row-group stats selective (fewer groups match a key probe)") {
    val base = Files.createTempDirectory("graft-layout").toString
    // l_partkey is scattered in the natural (orderkey-ordered) layout —
    // the realistic "selective lookup on a non-layout key" case
    val rows = sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .repartition(2)
    // small row groups so each file holds many (the skipping unit)
    val opts = Map("parquet.block.size" -> "65536")
    rows.write.mode("overwrite").options(opts).parquet(s"$base/natural")
    Load.sortedLayout(rows, s"$base/sorted", "l_partkey", opts)
    // probe a mid-domain key: in the natural layout nearly every row
    // group's [min, max] spans it (a domain-edge key would not)
    val probe = spark.read.parquet(s"$base/natural")
      .agg(percentile_approx(col("l_partkey"), lit(0.5), lit(100))).head().getLong(0)
    val (naturalHit, naturalAll) = matchingRowGroups(s"$base/natural", "l_partkey", probe)
    val (sortedHit, sortedAll) = matchingRowGroups(s"$base/sorted", "l_partkey", probe)
    assert(naturalAll > 4 && sortedAll > 4, "need several row groups for skipping to mean anything")
    // unsorted: row groups span ~the whole key domain -> stats prune
    // (almost) nothing
    assert(naturalHit >= naturalAll / 2,
      s"expected an unselective natural layout: $naturalHit/$naturalAll")
    assert(naturalHit > sortedHit)
    // sorted: the probe key lives in a couple of row groups per file
    assert(sortedHit <= 2 * 2, s"sorted layout should localize the key: $sortedHit/$sortedAll")
    // layout must never change query RESULTS
    val a = spark.read.parquet(s"$base/natural").filter(col("l_partkey") === probe)
      .agg(sum(col("l_quantity"))).head().getDouble(0)
    val b = spark.read.parquet(s"$base/sorted").filter(col("l_partkey") === probe)
      .agg(sum(col("l_quantity"))).head().getDouble(0)
    assert(a === b)
  }

  test("z-order layout prunes row groups on BOTH keys (single-key sort cannot)") {
    val base = Files.createTempDirectory("graft-zorder").toString
    val rows = sources.Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val opts = Map("parquet.block.size" -> "65536")
    rows.repartition(2).write.mode("overwrite").options(opts).parquet(s"$base/natural")
    Load.zorderLayout(rows, s"$base/z", "l_partkey", "l_suppkey", opts)
    def midKey(c: String): Long = spark.read.parquet(s"$base/natural")
      .agg(percentile_approx(col(c), lit(0.5), lit(100))).head().getLong(0)
    for (key <- Seq("l_partkey", "l_suppkey")) {
      val probe = midKey(key)
      val (nHit, nAll) = matchingRowGroups(s"$base/natural", key, probe)
      val (zHit, zAll) = matchingRowGroups(s"$base/z", key, probe)
      assert(nAll > 4 && zAll > 4)
      // a mid-domain probe on the natural layout touches ~everything;
      // under z-order each row group covers a small key-space rectangle
      assert(zHit * 2 < nHit, s"$key: z-order $zHit/$zAll vs natural $nHit/$nAll")
    }
    // layout is a pure reorder: full-table aggregates are unchanged
    val a = spark.read.parquet(s"$base/natural").agg(sum(col("l_quantity"))).head().getDouble(0)
    val b = spark.read.parquet(s"$base/z").agg(sum(col("l_quantity"))).head().getDouble(0)
    assert(a === b)
  }

  test("compact merges a many-small-files directory without changing its rows") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val rows = sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select(col("l_orderkey"), col("l_quantity"))
    rows.repartition(37).write.mode("overwrite").parquet(dir) // a sink's worth of tiny files
    val sumBefore = spark.read.parquet(dir).agg(sum("l_quantity")).head().getDouble(0)
    val nBefore = spark.read.parquet(dir).count()
    val (before, after) = Load.compact(spark, dir, targetBytes = 64L * 1024 * 1024)
    assert(before === 37 && after === 1)
    assert(spark.read.parquet(dir).count() === nBefore)
    assert(spark.read.parquet(dir).agg(sum("l_quantity")).head().getDouble(0) === sumBefore)
    // idempotent: already-compact dirs are left untouched
    assert(Load.compact(spark, dir) === ((1, 1)))
  }

  test("scdType2 chains validity intervals per key and flags the current row") {
    val changes = Seq(
      ("a", 1, 10.0), ("a", 3, 30.0), ("a", 7, 70.0), // key with 3 changes
      ("b", 2, 20.0))                                 // single-change key
      .toDF("k", "version", "price")
    val hist = Load.scdType2(changes, Seq("k"), "version")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((if (r.isNullAt(4)) None else Some(r.getInt(4))), r.getBoolean(5))).toMap
    assert(hist(("a", 1)) === ((Some(3), false)))
    assert(hist(("a", 3)) === ((Some(7), false)))
    assert(hist(("a", 7)) === ((None, true)))
    assert(hist(("b", 2)) === ((None, true)))
    // keep-latest projection agrees with upsertLatest semantics
    val current = Load.scdType2(changes, Seq("k"), "version")
      .filter(col("is_current")).select(col("k"), col("price"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(current === Map("a" -> 70.0, "b" -> 20.0))
  }

  test("appendToTable creates then appends to a catalog table") {
    spark.sql("DROP TABLE IF EXISTS graft_load_spec")
    Load.appendToTable(df2.drop("d"), "graft_load_spec")
    Load.appendToTable(df2.drop("d"), "graft_load_spec")
    assert(spark.table("graft_load_spec").count() === 4)
    spark.sql("DROP TABLE IF EXISTS graft_load_spec")
  }
}
