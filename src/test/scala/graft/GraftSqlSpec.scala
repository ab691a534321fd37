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
      // a STRICT bound on a DISCRETE type translates to the exact
      // adjacent inclusive bound (round 17) — the boundary row itself
      // must SURVIVE `>` (survivors here: 10..50,60..90,130..190 →
      // after `> 130`: 10..50,60..90,130)
      spark.sql("DELETE FROM graft_sql_del WHERE n > 130")
      val left = EventStreams.readUpsertTable(spark, t)
        .select("n").collect().map(_.getLong(0)).sorted.toSeq
      assert(left === ((1L to 5L) ++ (6L to 9L) :+ 13L).map(_ * 10L)
        .sorted.toSeq, s"boundary row must survive a strict >: $left")
      val fsckRows = EventStreams.fsckUpsertTable(spark, t).collect()
        .map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))).toSeq
      assert(fsckRows.forall(_._2), s"fsck after SQL deletes: $fsckRows")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_del")
  }

  test("SQL DELETE: strict bounds on continuous types refuse; asOf handles refuse") {
    val t = Files.createTempDirectory("graft-dsv2del2").toString + "/t"
    EventStreams.mergeBatchIntoTable(
      (0L until 8L).map(k => (k, k * 0.5, 0L)).toDF("doc_id", "score", "__v"),
      t, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
      statsCols = Some(Seq("score")))
    spark.sql("DROP TABLE IF EXISTS graft_sql_del2")
    spark.sql(s"CREATE TABLE graft_sql_del2 USING graft OPTIONS (path '$t')")
    try {
      // doubles have no exact adjacent value — the strict bound must
      // refuse at analysis, never silently shave a boundary row
      val err = intercept[Exception] {
        spark.sql("DELETE FROM graft_sql_del2 WHERE score > 1.5")
      }
      assert(err.getMessage.toLowerCase.contains("delete"),
        s"strict double bounds must refuse: ${err.getMessage}")
      assert(EventStreams.readUpsertTable(spark, t).count() === 8L)
      // a TIME-TRAVEL handle must not delete: its SELECTs serve the
      // asOf snapshot but the delete would mutate the latest one
      spark.sql("DROP TABLE IF EXISTS graft_sql_del2_at")
      spark.sql("CREATE TABLE graft_sql_del2_at USING graft " +
        s"OPTIONS (path '$t', asOf '0')")
      val atErr = intercept[Exception] {
        spark.sql("DELETE FROM graft_sql_del2_at WHERE doc_id >= 0")
      }
      assert((atErr.getMessage +
        Option(atErr.getCause).map(_.getMessage).getOrElse(""))
        .contains("asOf"), s"asOf delete must refuse: ${atErr.getMessage}")
      assert(EventStreams.readUpsertTable(spark, t).count() === 8L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sql_del2")
      spark.sql("DROP TABLE IF EXISTS graft_sql_del2_at")
    }
  }

  test("SQL DELETE timestamp bounds render in the session zone, not the JVM default (non-UTC JVM)") {
    // twin tables: one deleted through SQL under a SHIFTED JVM default
    // zone, one through the API with the same wall-clock bound — the
    // survivors must agree exactly (ADVICE r16: Timestamp.toString
    // rendered the pushed instant in the JVM default zone while the
    // delete interprets bounds as session-zone wall clocks, silently
    // shifting the window on any non-UTC host)
    val base = Files.createTempDirectory("graft-dsv2tz").toString
    def mk(t: String): Unit = {
      EventStreams.mergeBatchIntoTable(
        (0L until 24L).map(k => (k, 0L)).toDF("doc_id", "__v")
          .withColumn("ts", expr("timestampadd(HOUR, " +
            "cast(doc_id * 6 as int), timestamp'2021-06-01 00:00:00')"))
          .select("doc_id", "ts", "__v"),
        t, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
        statsCols = Some(Seq("ts")))
      EventStreams.compactUpsertTable(spark, t, Seq("doc_id"), 2, 1L,
        retain = 8, sortBy = Seq("ts"), maxRecordsPerFile = 4)
    }
    mk(s"$base/sql"); mk(s"$base/api")
    spark.sql("DROP TABLE IF EXISTS graft_sql_tz")
    spark.sql(s"CREATE TABLE graft_sql_tz USING graft OPTIONS (path '$base/sql')")
    val origTz = java.util.TimeZone.getDefault
    try {
      // half-hour offset catches both sign and sub-hour rendering bugs
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("Asia/Kolkata"))
      // rows sit every 6 hours; 47h is 1h below row k=8 (48h), so the
      // +5:30 JVM-default shift would pull k=8 into the buggy window
      spark.sql("DELETE FROM graft_sql_tz WHERE " +
        "ts <= TIMESTAMP'2021-06-02 23:00:00'")
    } finally {
      java.util.TimeZone.setDefault(origTz)
      spark.sql("DROP TABLE IF EXISTS graft_sql_tz")
    }
    EventStreams.deleteUpsertTableWhere(spark, s"$base/api",
      Seq(EventStreams.ColBound("ts", None, Some("2021-06-02 23:00:00"))),
      batchId = 2L, retain = 2)
    val sqlLeft = EventStreams.readUpsertTable(spark, s"$base/sql")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val apiLeft = EventStreams.readUpsertTable(spark, s"$base/api")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sqlLeft === apiLeft && sqlLeft === (8L until 24L).toSeq,
      s"sql=$sqlLeft api=$apiLeft — the SQL window must not shift")
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

  test("GraftCatalog: pointers persist on disk, list, resolve with identical pruning; CTAS and drop stay safe") {
    val wh = Files.createTempDirectory("graft-cat-wh").toString
    val t = mkTable()
    spark.conf.set("spark.sql.catalog.graftcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", wh)
    spark.conf.set("spark.sql.catalog.graftcat2", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftcat2.warehouse", wh)
    try {
      spark.sql(s"CREATE TABLE graftcat.default.zt USING graft " +
        s"OPTIONS (path '$t')")
      assert(spark.sql("SHOW TABLES IN graftcat.default").collect()
        .map(_.getString(1)).contains("zt"))
      // catalog-resolved reads prune exactly like the API scan
      val (cRows, cFiles) = v2Scanned(spark.sql(
        "SELECT doc_id FROM graftcat.default.zt WHERE n <= 155"))
      val (aRows, aFiles) = v1Scanned(
        EventStreams.readUpsertTableScan(spark, t).filter(col("n") <= 155L))
      assert(cRows === aRows && cFiles === aFiles && cFiles > 0)
      // a SECOND catalog instance over the SAME warehouse sees the
      // table: the registry is disk-backed, not session state
      assert(spark.sql("SELECT count(*) FROM graftcat2.default.zt")
        .head().getLong(0) === 32L)
      // DML resolves through the catalog: the committed delete
      spark.sql("DELETE FROM graftcat.default.zt WHERE n >= 300")
      assert(EventStreams.readUpsertTable(spark, t).count() === 30L)
      // and the committed merge
      import spark.implicits._
      Seq((500L, 5000L, "c99", 1L)).toDF("doc_id", "n", "cat", "__v")
        .createOrReplaceTempView("graft_cat_src")
      spark.sql("MERGE INTO graftcat.default.zt t USING graft_cat_src s " +
        "ON t.doc_id = s.doc_id " +
        "WHEN NOT MATCHED THEN INSERT (doc_id, n, cat, __v) " +
        "VALUES (s.doc_id, s.n, s.cat, s.__v)")
      assert(EventStreams.readUpsertTable(spark, t).count() === 31L)
      // CTAS refuses: the catalog never creates table STATE (data
      // lands through the committed merge API, then registers)
      val ctasErr = intercept[Exception] {
        spark.sql("CREATE TABLE graftcat.default.zz USING graft " +
          "AS SELECT 1 AS doc_id")
      }
      assert(ctasErr.getMessage.contains("committed") ||
        Option(ctasErr.getCause).exists(_.getMessage.contains("committed")),
        s"CTAS must refuse with the remediation: ${ctasErr.getMessage}")
      // registering a dir with no committed manifest refuses
      val emptyErr = intercept[Exception] {
        spark.sql("CREATE TABLE graftcat.default.zempty USING graft " +
          s"OPTIONS (path '$wh/nothing-here')")
      }
      assert(emptyErr.getMessage.contains("manifest"),
        s"uncommitted dirs must refuse: ${emptyErr.getMessage}")
      // DROP removes the POINTER only; committed data survives
      spark.sql("DROP TABLE graftcat.default.zt")
      assert(spark.sql("SHOW TABLES IN graftcat.default").collect()
        .forall(_.getString(1) != "zt"))
      assert(EventStreams.readUpsertTable(spark, t).count() === 31L,
        "dropping the catalog pointer must never touch committed data")
    } finally {
      spark.conf.unset("spark.sql.catalog.graftcat")
      spark.conf.unset("spark.sql.catalog.graftcat.warehouse")
      spark.conf.unset("spark.sql.catalog.graftcat2")
      spark.conf.unset("spark.sql.catalog.graftcat2.warehouse")
    }
  }

  test("MERGE INTO: matched update + unmatched insert route to the committed merge; API twin parity") {
    val base = Files.createTempDirectory("graft-sqlmerge").toString
    def seed(t: String): Unit = EventStreams.mergeBatchIntoTable(
      (0L until 8L).map(k => (k, k * 10L, 0L)).toDF("doc_id", "n", "__v"),
      t, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
      statsCols = Some(Seq("n")))
    seed(s"$base/t"); seed(s"$base/twin")
    // the r17 merge ADOPTED the version contract
    assert(EventStreams.tableVersionedBy(spark, s"$base/t") === Some("__v"))
    spark.sql("DROP TABLE IF EXISTS graft_sql_m")
    spark.sql(s"CREATE TABLE graft_sql_m USING graft OPTIONS (path '$base/t')")
    try {
      Seq((3L, 333L, 1L), (100L, 1000L, 1L)).toDF("doc_id", "n", "__v")
        .createOrReplaceTempView("graft_sql_m_src")
      val rep = spark.sql(
        "MERGE INTO graft_sql_m t USING graft_sql_m_src s " +
          "ON t.doc_id = s.doc_id " +
          "WHEN MATCHED THEN UPDATE SET n = s.n, __v = s.__v " +
          "WHEN NOT MATCHED THEN INSERT (doc_id, n, __v) " +
          "VALUES (s.doc_id, s.n, s.__v)").head()
      assert(rep.getString(0) === "merge" && rep.getLong(1) === 1L &&
        rep.getLong(2) === 1L && rep.getLong(3) === 1L && rep.getBoolean(4),
        s"report: $rep")
      // the API twin commits the same upsert; tables must agree exactly
      EventStreams.mergeBatchIntoTable(
        Seq((3L, 333L, 1L), (100L, 1000L, 1L)).toDF("doc_id", "n", "__v"),
        s"$base/twin", Seq("doc_id"), "__v", nBuckets = 2, batchId = 1L,
        retain = 8)
      val viaSql = EventStreams.readUpsertTable(spark, s"$base/t")
      val viaApi = EventStreams.readUpsertTable(spark, s"$base/twin")
      assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
      assert(viaSql.count() === 9L)
      // STALE source rows (version at/below current) SKIP — the
      // idempotent-CDC shape; nothing commits as changed rows
      Seq((3L, 999L, 0L)).toDF("doc_id", "n", "__v")
        .createOrReplaceTempView("graft_sql_m_src")
      val stale = spark.sql(
        "MERGE INTO graft_sql_m t USING graft_sql_m_src s " +
          "ON t.doc_id = s.doc_id " +
          "WHEN MATCHED THEN UPDATE SET n = s.n, __v = s.__v").head()
      assert(stale.getLong(2) === 0L && stale.getLong(3) === 0L)
      assert(EventStreams.readUpsertTable(spark, s"$base/t")
        .filter(col("doc_id") === 3L).select("n").head().getLong(0) === 333L)
      // a PINNED batch id replays as a no-op (exactly-once for
      // schedulers): the statement re-runs but applied = false
      Seq((5L, 555L, 7L)).toDF("doc_id", "n", "__v")
        .createOrReplaceTempView("graft_sql_m_src")
      val mergeSql = "MERGE INTO graft_sql_m t USING graft_sql_m_src s " +
        "ON t.doc_id = s.doc_id " +
        "WHEN MATCHED THEN UPDATE SET n = s.n, __v = s.__v"
      try {
        spark.conf.set("graft.sql.batchId", "7")
        assert(spark.sql(mergeSql).head().getBoolean(4))
        val replay = spark.sql(mergeSql).head()
        assert(!replay.getBoolean(4), "a pinned-id replay must no-op")
      } finally spark.conf.unset("graft.sql.batchId")
      assert(EventStreams.latestCommittedBatchId(spark, s"$base/t") === Some(7L))
      // the commit chain is the guarded one: every commit records its
      // base parent; fsck green
      assert(EventStreams.fsckUpsertTable(spark, s"$base/t").collect()
        .forall(_.getBoolean(1)))
      // MERGE refusals stay loud: duplicate source keys; reassigned key
      Seq((3L, 1L, 9L), (3L, 2L, 9L)).toDF("doc_id", "n", "__v")
        .createOrReplaceTempView("graft_sql_m_src")
      val dupErr = intercept[Exception] { spark.sql(mergeSql).collect() }
      assert(dupErr.getMessage.contains("unique source keys"),
        s"duplicate source keys must refuse: ${dupErr.getMessage}")
      Seq((3L, 1L, 9L)).toDF("doc_id", "n", "__v")
        .createOrReplaceTempView("graft_sql_m_src")
      val keyErr = intercept[Exception] {
        spark.sql("MERGE INTO graft_sql_m t USING graft_sql_m_src s " +
          "ON t.doc_id = s.doc_id " +
          "WHEN MATCHED THEN UPDATE SET doc_id = s.doc_id + 1").collect()
      }
      assert(keyErr.getMessage.contains("key"),
        s"key reassignment must refuse: ${keyErr.getMessage}")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_m")
  }

  test("UPDATE: the degenerate matched-only merge; auto-bumped version wins arbitration") {
    val base = Files.createTempDirectory("graft-sqlupd").toString
    val t = s"$base/t"
    EventStreams.mergeBatchIntoTable(
      (0L until 8L).map(k => (k, k * 10L, 0L)).toDF("doc_id", "n", "__v"),
      t, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
      statsCols = Some(Seq("n")))
    spark.sql("DROP TABLE IF EXISTS graft_sql_u")
    spark.sql(s"CREATE TABLE graft_sql_u USING graft OPTIONS (path '$t')")
    try {
      val rep = spark.sql(
        "UPDATE graft_sql_u SET n = n + 1 WHERE doc_id <= 2").head()
      assert(rep.getString(0) === "update" && rep.getLong(2) === 3L &&
        rep.getBoolean(4), s"report: $rep")
      val after = EventStreams.readUpsertTable(spark, t)
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(after.toSeq === (0L until 8L).map(k =>
        (k, if (k <= 2) k * 10L + 1 else k * 10L)),
        s"exactly the matched rows update: ${after.toSeq}")
      // the auto-bump recorded __v = 1 on the touched rows (the
      // rewrite must WIN version arbitration against what it replaced)
      assert(EventStreams.readUpsertTable(spark, t)
        .filter(col("doc_id") === 0L).select("__v").head().getLong(0) === 1L)
      // key reassignment refuses
      val keyErr = intercept[Exception] {
        spark.sql("UPDATE graft_sql_u SET doc_id = doc_id + 10").collect()
      }
      assert(keyErr.getMessage.contains("key"),
        s"key reassignment must refuse: ${keyErr.getMessage}")
      // UPDATE on a DELTA-postured table rides the O(batch) delta path
      val td = s"$base/td"
      EventStreams.mergeBatchIntoTable(
        (0L until 6L).map(k => (k, k * 10L, 0L)).toDF("doc_id", "n", "__v"),
        td, Seq("doc_id"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
        delta = true)
      spark.sql("DROP TABLE IF EXISTS graft_sql_ud")
      spark.sql(s"CREATE TABLE graft_sql_ud USING graft OPTIONS (path '$td')")
      try {
        val drep = spark.sql(
          "UPDATE graft_sql_ud SET n = 777 WHERE doc_id = 1").head()
        assert(drep.getLong(2) === 1L)
        assert(EventStreams.readUpsertTable(spark, td)
          .filter(col("doc_id") === 1L).select("n").head().getLong(0) === 777L)
        // still delta-postured (the SQL write appended, not folded)
        assert(EventStreams.tableReconcileSpec(spark, td).isDefined)
      } finally spark.sql("DROP TABLE IF EXISTS graft_sql_ud")
    } finally spark.sql("DROP TABLE IF EXISTS graft_sql_u")
  }
}
