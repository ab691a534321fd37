package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.streaming.EventStreams

/** The DataSourceV2 `graft` format: plain SQL must reach the SAME
  * zone-map/bloom pruning the Scala API scan plans, from the same
  * classifier ([[EventStreams.zoneMapIndexFor]]).
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val t = Files.createTempDirectory("graft-dsv2").toString + "/t"
    EventStreams.mergeBatchIntoTable(
      (0L until 32L).map(k => (k, k * 10L, f"c$k%02d", 0L))
        .toDF("doc_id", "n", "cat", "__v"),
      t, Seq("doc_id"), "__v", nBuckets = 4, batchId = 0L,
      statsCols = Some(Seq("n", "cat")))
    EventStreams.compactUpsertTable(spark, t, Seq("doc_id"), 4, 1L,
      sortBy = Seq("n"), maxRecordsPerFile = 4)
    t
  }

  /** Rows + the V2 scan's PLANNED file count from the executed plan. */
  private def v2Scanned(d: org.apache.spark.sql.DataFrame): (Seq[Long], Long) = {
    val rows = d.collect().map(_.getLong(0)).sorted.toSeq
    val fin = d.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    val files = fin.collectFirst { case b: BatchScanExec =>
      b.inputPartitions.map {
        case f: FilePartition => f.files.length
        case _ => 0
      }.sum.toLong
    }.getOrElse(0L)
    (rows, files)
  }

  private def v1Scanned(d: org.apache.spark.sql.DataFrame): (Seq[Long], Long) = {
    val rows = d.collect().map(_.getLong(0)).sorted.toSeq
    val fin = d.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    (rows, fin.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.getOrElse(0L))
  }

  test("format(graft).load: reads the committed snapshot and prunes like the API scan") {
    val t = mkTable()
    val live = EventStreams.tableManifest(spark, t).values.map(_.size).sum.toLong
    assert(live > 2)
    // full read equals the API read, bit-for-bit
    val sqlFull = spark.read.format("graft").load(t)
    val apiFull = EventStreams.readUpsertTable(spark, t)
    assert(sqlFull.exceptAll(apiFull).isEmpty && apiFull.exceptAll(sqlFull).isEmpty)
    // pruned filter: same rows AND the same planned-file count as the
    // V1 API scan — one classifier behind both surfaces
    val (sqlRows, sqlFiles) = v2Scanned(
      spark.read.format("graft").load(t).filter(col("n") <= 155L))
    val (apiRows, apiFiles) = v1Scanned(
      EventStreams.readUpsertTableScan(spark, t).filter(col("n") <= 155L))
    assert(sqlRows === apiRows)
    assert(sqlFiles === apiFiles && sqlFiles < live,
      s"SQL must plan the API's pruned file set ($sqlFiles vs $apiFiles of $live)")
    // the V2 read is Spark's own vectorized parquet scan (BatchScanExec)
    val plan = spark.read.format("graft").load(t).filter(col("n") <= 155L)
      .queryExecution.executedPlan
    assert(plan.toString.contains("BatchScan graft"),
      s"expected a V2 BatchScan of the graft table:\n$plan")
  }

  test("CREATE TABLE USING graft: pure SQL prunes files and refuses writes") {
    val t = mkTable()
    val live = EventStreams.tableManifest(spark, t).values.map(_.size).sum.toLong
    spark.sql("DROP TABLE IF EXISTS graft_sql_t")
    spark.sql(s"CREATE TABLE graft_sql_t USING graft OPTIONS (path '$t')")
    try {
      val (rows, files) = v2Scanned(
        spark.sql("SELECT doc_id FROM graft_sql_t WHERE n <= 155"))
      assert(rows === (0L to 15L).toSeq)
      assert(files < live, s"pure SQL must prune ($files of $live)")
      // IN + starts_with shapes prune through the same extractor
      val (inRows, inFiles) = v2Scanned(spark.sql(
        "SELECT doc_id FROM graft_sql_t WHERE n IN (10, 20)"))
      assert(inRows === Seq(1L, 2L) && inFiles < live)
      val (swRows, swFiles) = v2Scanned(spark.sql(
        "SELECT doc_id FROM graft_sql_t WHERE startswith(cat, 'c0')"))
      assert(swRows === (0L to 9L).toSeq && swFiles < live)
      // writes refuse loudly — SQL INSERT would bypass the commit protocol
      val err = intercept[Exception] {
        spark.sql("INSERT INTO graft_sql_t VALUES (99, 990, 'c99', 1)")
      }
      assert(err.getMessage.contains("merge") ||
        err.getCause != null && err.getCause.getMessage.contains("merge"),
        s"INSERT must name the committed write API: ${err.getMessage}")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_t")
  }

  test("asOf option: pruned SQL time travel resolves like readUpsertTableAt") {
    val t = Files.createTempDirectory("graft-dsv2at").toString + "/t"
    EventStreams.mergeBatchIntoTable(
      (0L until 32L).map(k => (k, k * 10L, 0L)).toDF("doc_id", "n", "__v"),
      t, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
      statsCols = Some(Seq("n")))
    EventStreams.compactUpsertTable(spark, t, Seq("doc_id"), 2, 1L,
      retain = 8, sortBy = Seq("n"), maxRecordsPerFile = 4)
    EventStreams.mergeBatchIntoTable(
      Seq((0L, 999L, 1L)).toDF("doc_id", "n", "__v"),
      t, Seq("doc_id"), "__v", nBuckets = 2, batchId = 2L, retain = 8)
    // the asOf read equals the API's time travel, row for row
    val sqlAt = spark.read.format("graft").option("asOf", "1").load(t)
    val apiAt = EventStreams.readUpsertTableAt(spark, t, 1L)
    assert(sqlAt.exceptAll(apiAt).isEmpty && apiAt.exceptAll(sqlAt).isEmpty)
    assert(sqlAt.filter(col("doc_id") === 0L).select("n").head().getLong(0) === 0L)
    assert(spark.read.format("graft").load(t)
      .filter(col("doc_id") === 0L).select("n").head().getLong(0) === 999L)
    // and it PRUNES — which the plain time-travel read never plans
    val (atRows, atFiles) = v2Scanned(
      spark.read.format("graft").option("asOf", "1").load(t)
        .filter(col("n") <= 35L))
    assert(atRows === Seq(0L, 1L, 2L, 3L))
    val liveAt1 = 8L // 32 rows, 4/file after the fold
    assert(atFiles > 0 && atFiles < liveAt1,
      s"asOf scan must prune ($atFiles of $liveAt1)")
    // below the chain: loud, with the pin remediation
    val err = intercept[Exception] {
      spark.read.format("graft").option("asOf", "-5").load(t).collect()
    }
    assert((err.getMessage + Option(err.getCause).map(_.getMessage)
      .getOrElse("")).contains("at or before"))
  }

  test("SQL DELETE routes to the committed predicate delete (zone-map classified)") {
    val t = Files.createTempDirectory("graft-dsv2del").toString + "/t"
    EventStreams.mergeBatchIntoTable(
      (0L until 32L).map(k => (k, k * 10L, 0L)).toDF("doc_id", "n", "__v"),
      t, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
      statsCols = Some(Seq("n")))
    EventStreams.compactUpsertTable(spark, t, Seq("doc_id"), 2, 1L,
      retain = 8, sortBy = Seq("n"), maxRecordsPerFile = 4)
    spark.sql("DROP TABLE IF EXISTS graft_sql_del")
    spark.sql(s"CREATE TABLE graft_sql_del USING graft OPTIONS (path '$t')")
    try {
      spark.sql("DELETE FROM graft_sql_del WHERE n >= 200")
      // the delete COMMITTED: both surfaces serve the post-delete world
      assert(EventStreams.readUpsertTable(spark, t).count() === 20L)
      assert(EventStreams.readUpsertTable(spark, t)
        .agg(max(col("n"))).head().getLong(0) === 190L)
      // it is a real manifest commit with the classification (some
      // provably-covered sorted files DROPPED unread)
      val hist = EventStreams.tableHistory(spark, t)
        .orderBy(col("batch_id").desc).head()
      assert(hist.getLong(0) === 2L)
      // time travel below the SQL delete still reads everything
      assert(EventStreams.readUpsertTableAt(spark, t, 1L).count() === 32L)
      // bounded conjunction + equality both translate
      spark.sql("DELETE FROM graft_sql_del WHERE n >= 100 AND n <= 120")
      assert(EventStreams.readUpsertTable(spark, t).count() === 17L)
      spark.sql("DELETE FROM graft_sql_del WHERE n = 0")
      assert(EventStreams.readUpsertTable(spark, t).count() === 16L)
      // a STRICT bound cannot render as an inclusive ColBound — it
      // must refuse at analysis, never silently delete a boundary row
      val err = intercept[Exception] {
        spark.sql("DELETE FROM graft_sql_del WHERE n > 50")
      }
      assert(err.getMessage.toLowerCase.contains("delete"),
        s"strict bounds must refuse: ${err.getMessage}")
      assert(EventStreams.readUpsertTable(spark, t).count() === 16L,
        "the refused delete must not have removed anything")
      val fsckRows = EventStreams.fsckUpsertTable(spark, t).collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSeq
      assert(fsckRows.forall(_._2), s"fsck after SQL deletes: $fsckRows")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_del")
  }

  test("aggregate pushdown: COUNT/MIN/MAX answer from parquet footers through the graft format") {
    // the V2 scan builder the graft table hands Spark implements
    // SupportsPushDownAggregates: with the conf on, a bare
    // count(*)/min/max never reads data pages — footer statistics
    // answer it (the SQL twin of the API's metadata-only aggregates)
    val t = mkTable()
    val key = "spark.sql.parquet.aggregatePushdown"
    val orig = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "true")
      val d = spark.read.format("graft").load(t)
        .agg(count(lit(1)).as("n"), min(col("n")).as("mn"),
          max(col("n")).as("mx"))
      val row = d.head()
      assert(row.getLong(0) === 32L && row.getLong(1) === 0L &&
        row.getLong(2) === 310L)
      assert(d.queryExecution.executedPlan.toString
        .contains("PushedAggregation"),
        s"the aggregate must push to the scan:\n${d.queryExecution.executedPlan}")
    } finally orig match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("graft format: bloom equality prunes; delta and mixed snapshots refuse") {
    // bloom-contracted high-cardinality strings: only the sketch prunes
    val tb = Files.createTempDirectory("graft-dsv2b").toString + "/t"
    EventStreams.mergeBatchIntoTable(
      (0L until 128L).map(k => (k, s"u${(k * 2654435761L) % 100000}", 0L))
        .toDF("doc_id", "u", "__v"),
      tb, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L,
      bloomCols = Some(Seq("u")))
    EventStreams.compactUpsertTable(spark, tb, Seq("doc_id"), 2, 1L,
      maxRecordsPerFile = 16)
    val bLive = EventStreams.tableManifest(spark, tb).values.map(_.size).sum.toLong
    val v77 = s"u${(77L * 2654435761L) % 100000}"
    val (bRows, bFiles) = v2Scanned(
      spark.read.format("graft").load(tb).filter(col("u") === v77))
    assert(bRows === Seq(77L) && bFiles < bLive,
      s"bloom probe must prune through SQL ($bFiles of $bLive)")
    // an unfolded delta snapshot refuses — file-level pruning could
    // resurrect superseded versions
    val td = Files.createTempDirectory("graft-dsv2d").toString + "/t"
    EventStreams.mergeBatchIntoTable(
      (0L until 8L).map(k => (k, k * 10L, 0L)).toDF("doc_id", "n", "__v"),
      td, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L, retain = 2,
      delta = true)
    val err = intercept[Exception] {
      spark.read.format("graft").load(td).collect()
    }
    assert(err.getMessage.contains("delta") ||
      Option(err.getCause).exists(_.getMessage.contains("delta")),
      s"delta snapshots must refuse loudly: ${err.getMessage}")
  }
}
