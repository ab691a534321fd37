package graft

import org.apache.spark.sql.functions._
import graft.operators.{Maintenance, Packing, Similarity}
import graft.streaming.EventStreams

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("runOnce: act → reclaim → verify, with an exactly-once committed report") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint").toString
    val docs = (0L until 12L).map { i =>
      (i, (0 until 20).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
      expr("transform(filter(split(text, ' '), x -> x <> ''), " +
        "t -> cast(pmod(xxhash64(t), 50) as int))").as("toks"))
    // shard-map fixture (the q188 shape): seqs → shards → prov → export
    val (seqs, shardTable, prov, export) =
      (s"$base/seqs", s"$base/shards", s"$base/prov", s"$base/export")
    Packing.materializeShardIncremental(toks, seqs, seqLen = 16, sepId = 99,
      batchId = 0L)
    val sharded = Packing.trainingShards(
      EventStreams.readUpsertTable(spark, seqs), seqsPerShard = 4)
      .drop("u").localCheckpoint()
    EventStreams.mergeBatchIntoTable(sharded, shardTable, Seq("seq_id"),
      "seq_id", nBuckets = 8, batchId = 0L)
    EventStreams.mergeBatchIntoTable(
      sharded.select(col("shard_id"), col("seq_id"),
          explode(col("doc_spans")).as("sp"))
        .select(col("shard_id"), col("seq_id"), col("sp.doc_id").as("doc_id"),
          col("sp.start").as("start"), col("sp.len").as("len")),
      prov, Seq("seq_id", "doc_id"), "seq_id", nBuckets = 8, batchId = 0L)
    Packing.exportShardFiles(spark, shardTable, export)
    // plain keyed table + composed index
    val corpus = s"$base/corpus"
    EventStreams.mergeBatchIntoTable(docs.withColumn("__v", lit(0L)),
      corpus, Seq("doc_id"), "__v", nBuckets = 4, batchId = 0L, retain = 2)
    EventStreams.mergeBatchIntoTable(
      docs.filter(col("doc_id") < 6).withColumn("__v", lit(1L)),
      corpus, Seq("doc_id"), "__v", nBuckets = 4, batchId = 1L, retain = 2)
    val e = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = s"$base/idx"
    Similarity.buildIvfPqIndex(e, idx, nlist = 2, m = 8, codebookSize = 2,
      dim = 64)
    val report = s"$base/report"
    def pass(runId: Long, foldBatch: Long, shard: org.apache.spark.sql.DataFrame) =
      Maintenance.runOnce(spark, runId, report,
        tables = Seq((corpus, 1)), indexes = Seq((idx, 1)),
        rebalance = Some((shardTable, prov, export, 4, 0.9, foldBatch, 8)),
        drift = Some((idx, e, shard, runId, 0.2)))
    // ---- run 1: healthy — monitors measure, nothing acts -------------
    val r1 = pass(1L, 10L, e)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(1), r.getString(2)) ->
        ((r.getBoolean(3), r.getLong(4)))).toMap
    val m1 = asMap(r1)
    assert(m1(("export-export", "fill_healthy"))._1)
    assert(m1(("export-export", "fold_rebalanced"))._2 === 0L)
    assert(m1(("ivfpq-idx", "drift_healthy")) === ((true, 0L))) // PSI exactly 0
    assert(m1(("ivfpq-idx", "drift_rebuilt"))._2 === 0L)
    assert(m1.filterKeys(_._2.startsWith("fsck_")).values.forall(_._1),
      s"fsck must be green after run 1: $m1")
    // run 1's vacuum on the corpus (retain=1) reclaims batch 0's
    // superseded file — the reclaim leg does real work
    assert(m1(("table-corpus", "vacuum_reclaimed"))._2 > 0L)
    // ---- takedown aftermath: holes drop the fill below the gate ------
    val n = sharded.count()
    val vanished = sharded.filter(col("rank").isin(1L, n / 2, n - 2))
      .select(col("seq_id")).collect().map(_.getLong(0)).toSeq
    EventStreams.deleteFromTable(spark, shardTable, vanished.toDF("seq_id"),
      Seq("seq_id"), 8, batchId = 2L, retain = 2)
    EventStreams.deleteFromTable(spark, prov,
      EventStreams.readUpsertTable(spark, prov)
        .filter(col("seq_id").isin(vanished: _*))
        .select(col("seq_id"), col("doc_id")),
      Seq("seq_id", "doc_id"), nBuckets = 8, batchId = 2L, retain = 2)
    // ---- run 2: the fold acts; drift sees a shifted shard and rebuilds
    val shifted = e.withColumn("embedding",
      expr("transform(embedding, x -> x + cast(2.0 as float))"))
    val r2 = pass(2L, 20L, shifted)
    val m2 = asMap(r2)
    assert(!m2(("export-export", "fill_healthy"))._1)
    assert(m2(("export-export", "fold_rebalanced"))._2 > 0L)
    assert(!m2(("ivfpq-idx", "drift_healthy"))._1)
    assert(m2(("ivfpq-idx", "drift_rebuilt"))._2 === 1L)
    assert(m2.filterKeys(_._2.startsWith("fsck_")).values.forall(_._1),
      s"fsck must be green after run 2's own mutations: $m2")
    // the fold left the map dense again
    val t = EventStreams.readUpsertTable(spark, shardTable)
      .agg(count(lit(1)), max(col("rank"))).head()
    assert(t.getLong(0) === t.getLong(1) + 1)
    // ---- replay of run 2: idempotent steps, report unchanged ---------
    val before = EventStreams.readUpsertTable(spark, report).collect().toSet
    pass(2L, 20L, shifted)
    val after = EventStreams.readUpsertTable(spark, report).collect().toSet
    assert(after === before, "a replayed runId must not change the report")
    assert(after.size === r1.count() + r2.count())
  }

  test("heal leg: a red fsck with a readable backup restores, re-verifies, and reports") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-heal").toString
    val (t, bak, report) = (s"$base/t", s"$base/bak", s"$base/report")
    def merge(rows: Seq[(Long, String, Long)], id: Long) =
      EventStreams.mergeBatchIntoTable(rows.toDF("k", "v", "__v"),
        t, Seq("k"), "__v", nBuckets = 4, batchId = id, retain = 2)
    merge((0L until 12L).map(k => (k, s"p$k", 0L)), 0L)
    merge(Seq((1L, "q1", 1L)), 1L)
    EventStreams.backupUpsertTable(spark, t, bak)
    def rows() = EventStreams.readUpsertTable(spark, t)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = rows()
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(2), (r.getBoolean(3), r.getLong(4)))).toMap
    // healthy pass with heal configured: NO heal rows (nothing to do)
    val r1 = asMap(Maintenance.runOnce(spark, 1L, report,
      tables = Seq((t, 2)), heal = Some(_ => bak)))
    assert(!r1.contains("heal_restored") && !r1.contains("heal_verified"))
    // out-of-band damage: a live file vanishes; the nightly pass heals
    val victim = EventStreams.tableManifest(spark, t).values.flatten.head
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$t/$victim"))
    val r2 = asMap(Maintenance.runOnce(spark, 2L, report,
      tables = Seq((t, 2)), heal = Some(_ => bak)))
    assert(!r2("fsck_live_files_exist")._1, "VERIFY must record the pre-heal red")
    assert(r2("heal_restored") === ((true, 2L))) // the table watermark (1) + 1
    assert(r2("heal_verified") === ((true, 0L)))
    assert(rows() === expected, "heal must restore the backed-up rows")
    assert(EventStreams.fsckUpsertTable(spark, t)
      .collect().forall(_.getBoolean(1)))
    // a table damaged with NO readable backup reports red, never throws
    val t2 = s"$base/t2"
    EventStreams.mergeBatchIntoTable(Seq((1L, "a", 0L)).toDF("k", "v", "__v"),
      t2, Seq("k"), "__v", nBuckets = 2, batchId = 0L)
    val victim2 = EventStreams.tableManifest(spark, t2).values.flatten.head
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$t2/$victim2"))
    val r3 = asMap(Maintenance.runOnce(spark, 3L, report,
      tables = Seq((t2, 1)), heal = Some(_ => s"$base/nosuch")))
    assert(r3("heal_restored") === ((false, 0L)))
    assert(!r3.contains("heal_verified"))
  }

  test("backup rotation: nightly backups rotate to keepLast and fsck red flags a rotted one") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-rot").toString
    val (t, root, report) = (s"$base/t", s"$base/baks", s"$base/report")
    def merge(v: Long, id: Long) =
      EventStreams.mergeBatchIntoTable(Seq((1L, s"p$v", v)).toDF("k", "v", "__v"),
        t, Seq("k"), "__v", nBuckets = 2, batchId = id, retain = 2)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(2), (r.getBoolean(3), r.getLong(4)))).toMap
    merge(0L, 0L)
    val r1 = asMap(Maintenance.runOnce(spark, 1L, report,
      backups = Seq((t, root, 2))))
    assert(r1("backup_committed") === ((true, 0L)))
    assert(r1("backup_rotated") === ((true, 0L)))
    assert(r1("fsck_backup_manifests_parseable")._1 &&
      r1("fsck_backup_live_files_exist")._1)
    merge(1L, 1L)
    asMap(Maintenance.runOnce(spark, 2L, report, backups = Seq((t, root, 2))))
    merge(2L, 2L)
    val r3 = asMap(Maintenance.runOnce(spark, 3L, report,
      backups = Seq((t, root, 2))))
    assert(r3("backup_rotated") === ((true, 1L))) // b1 pruned, b2+b3 retained
    val dirs = new java.io.File(root).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq === Seq(f"b${2L}%020d", f"b${3L}%020d"))
    // a retained backup rots out-of-band: the NEXT pass flags it red
    // BEFORE it's needed
    val b2files = java.nio.file.Files.walk(
        java.nio.file.Paths.get(s"$root/b${"%020d".format(2L)}"))
    val rotted = {
      import scala.jdk.CollectionConverters._
      b2files.iterator().asScala.find(_.toString.endsWith(".parquet")).get
    }
    java.nio.file.Files.delete(rotted)
    merge(3L, 3L)
    val r4 = asMap(Maintenance.runOnce(spark, 4L, report,
      backups = Seq((t, root, 3))))
    assert(!r4("fsck_backup_live_files_exist")._1)
    assert(r4("fsck_backup_live_files_exist")._2 === 1L)
  }

  test("index heal leg: a red index fsck rebuilds from the corpus as a new generation") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-idxheal").toString
    val (idx, report) = (s"$base/idx", s"$base/report")
    val e = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    Similarity.buildIvfPqIndex(e, idx, nlist = 2, m = 8, codebookSize = 2,
      dim = 64)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(2), (r.getBoolean(3), r.getLong(4)))).toMap
    val healArg = Some((e, 2, 8, 2, 64))
    // healthy pass: fsck green, no heal rows
    val r1 = asMap(Maintenance.runOnce(spark, 1L, report,
      indexes = Seq((idx, 1)), indexHeal = healArg))
    assert(r1("fsck_codes_dirs_exist")._1)
    assert(!r1.contains("heal_rebuilt"))
    // out-of-band damage: a committed codes batch dir vanishes
    val codesDir = new java.io.File(s"$idx/codes")
    val victim = codesDir.listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("batch=")).head
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(victim)
    val r2 = asMap(Maintenance.runOnce(spark, 2L, report,
      indexes = Seq((idx, 1)), indexHeal = healArg))
    assert(!r2("fsck_codes_dirs_exist")._1, "VERIFY must record the pre-heal red")
    assert(r2("heal_rebuilt") === ((true, 1L))) // flat index -> generation 1
    assert(r2("heal_verified") === ((true, 0L)))
    // the healed index serves the full corpus again
    val nVecs = Similarity.indexedVecIds(spark, idx).count()
    assert(nVecs === e.count(), "heal must regenerate membership from the corpus")
    assert(Similarity.fsckIndex(spark, idx).collect().forall(_.getBoolean(1)))
    // replay of the healed pass: fsck green, nothing rebuilt
    val r3 = asMap(Maintenance.runOnce(spark, 3L, report,
      indexes = Seq((idx, 1)), indexHeal = healArg))
    assert(!r3.contains("heal_rebuilt"))
  }

  test("run lock: a concurrent pass under another runId fails loudly; our own replay adopts") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-lock").toString
    val (t, report) = (s"$base/t", s"$base/report")
    EventStreams.mergeBatchIntoTable(Seq((1L, "a", 0L)).toDF("k", "v", "__v"),
      t, Seq("k"), "__v", nBuckets = 2, batchId = 0L)
    // another scheduler's in-flight (or crashed, unreplayed) pass
    val lockDir = new java.io.File(s"$report/_maintenance")
    lockDir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$report/_maintenance/lock"), "99")
    val e = intercept[IllegalStateException] {
      Maintenance.runOnce(spark, 1L, report, tables = Seq((t, 1)))
    }
    assert(e.getMessage.contains("held by run '99'"))
    // our OWN runId's stale lock (a crashed attempt of this run): adopt,
    // complete, release
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$report/_maintenance/lock"), "1")
    val r = Maintenance.runOnce(spark, 1L, report, tables = Seq((t, 1)))
    assert(r.count() > 0)
    assert(!new java.io.File(s"$report/_maintenance/lock").exists(),
      "a completed pass must release the lock")
    // and a fresh runId takes the lock cleanly afterwards
    Maintenance.runOnce(spark, 2L, report, tables = Seq((t, 1)))
    assert(!new java.io.File(s"$report/_maintenance/lock").exists())
  }

  test("a failed pass never wedges the lock: bad args refuse pre-lock, mid-pass throws release") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-unwedge").toString
    val (t, report) = (s"$base/t", s"$base/report")
    EventStreams.mergeBatchIntoTable(Seq((1L, "a", 0L)).toDF("k", "v", "__v"),
      t, Seq("k"), "__v", nBuckets = 2, batchId = 0L)
    def lockHeld = new java.io.File(s"$report/_maintenance/lock").exists()
    // deterministic ARGUMENT errors are validated BEFORE the lock: a
    // retry of the same bad call must not adopt-and-die forever
    intercept[IllegalArgumentException] {
      Maintenance.runOnce(spark, 1L, report,
        backups = Seq((t, s"$base/baks", 0))) // keepLast < 1
    }
    assert(!lockHeld, "a pre-lock validation failure must not take the lock")
    intercept[IllegalArgumentException] {
      Maintenance.runOnce(spark, 1L, report,
        tables = Seq((s"$base/x/t", 1), (s"$base/y/t", 1))) // label collision
    }
    assert(!lockHeld)
    // a MID-PASS thrown failure (not a crash) releases on the way out:
    // backing up a table with no committed snapshot throws inside the
    // backups leg, well after the lock is taken
    intercept[IllegalArgumentException] {
      Maintenance.runOnce(spark, 2L, report,
        backups = Seq((s"$base/never-written", s"$base/baks", 1)))
    }
    assert(!lockHeld, "a thrown pass must release the lock for retries")
    // the corrected call then runs under a FRESH id with no hand cleanup
    val r = Maintenance.runOnce(spark, 3L, report,
      backups = Seq((t, s"$base/baks", 1)))
    assert(r.count() > 0)
    assert(!lockHeld)
  }

  test("rotation never prunes on the strength of a red fresh backup") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-redrot").toString
    val (t, root, report) = (s"$base/t", s"$base/baks", s"$base/report")
    def merge(v: Long, id: Long) =
      EventStreams.mergeBatchIntoTable(Seq((1L, s"p$v", v)).toDF("k", "v", "__v"),
        t, Seq("k"), "__v", nBuckets = 2, batchId = id, retain = 2)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(2), (r.getBoolean(3), r.getLong(4)))).toMap
    merge(0L, 0L)
    asMap(Maintenance.runOnce(spark, 1L, report, backups = Seq((t, root, 1))))
    merge(1L, 1L)
    // the next nightly backup commits and is then damaged before the
    // pass fscks it (the crash-replay window: the replayed pass adopts
    // the committed-but-rotted dir). With keepLast = 1 the old behavior
    // would prune b1 — the only good backup — on the strength of b2.
    val b2 = f"$root/b${2L}%020d"
    EventStreams.backupUpsertTable(spark, t, b2)
    val victim = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(b2))
        .iterator().asScala.find(_.toString.endsWith(".parquet")).get
    }
    java.nio.file.Files.delete(victim)
    val r2 = asMap(Maintenance.runOnce(spark, 2L, report,
      backups = Seq((t, root, 1))))
    assert(r2("backup_rotated") === ((false, 0L)),
      "a red fresh backup must skip rotation")
    assert(!r2("fsck_backup_live_files_exist")._1)
    assert(new java.io.File(f"$root/b${1L}%020d").exists(),
      "the last known-good backup must survive a red fresh one")
    // the next pass commits a GREEN backup and rotation resumes,
    // pruning b1 and the rotted b2
    merge(2L, 2L)
    val r3 = asMap(Maintenance.runOnce(spark, 3L, report,
      backups = Seq((t, root, 1))))
    assert(r3("backup_rotated") === ((true, 2L)))
    assert(new java.io.File(root).listFiles().filter(_.isDirectory)
      .map(_.getName).toSeq === Seq(f"b${3L}%020d"))
  }

  test("heal mapped at the rotation ROOT resolves the newest committed backup") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-healroot").toString
    val (t, root, report) = (s"$base/t", s"$base/baks", s"$base/report")
    def merge(rows: Seq[(Long, String, Long)], id: Long) =
      EventStreams.mergeBatchIntoTable(rows.toDF("k", "v", "__v"),
        t, Seq("k"), "__v", nBuckets = 4, batchId = id, retain = 2)
    merge((0L until 8L).map(k => (k, s"p$k", 0L)), 0L)
    // two nightly passes: rotation leaves b1 + b2 under the root
    Maintenance.runOnce(spark, 1L, report, backups = Seq((t, root, 2)))
    merge(Seq((1L, "q1", 1L)), 1L)
    Maintenance.runOnce(spark, 2L, report, backups = Seq((t, root, 2)))
    assert(Maintenance.resolveBackup(spark, root) ===
      Some(f"$root/b${2L}%020d"), "a root resolves to its newest backup")
    assert(Maintenance.resolveBackup(spark, f"$root/b${1L}%020d") ===
      Some(f"$root/b${1L}%020d"), "a concrete backup dir passes through")
    assert(Maintenance.resolveBackup(spark, s"$base/nosuch") === None)
    val expected = EventStreams.readUpsertTable(spark, t)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // damage the table; heal is mapped at the ROOT (rotation renames the
    // live backup nightly, so a fixed-dir mapping would dangle)
    val victim = EventStreams.tableManifest(spark, t).values.flatten.head
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$t/$victim"))
    val r = Maintenance.runOnce(spark, 3L, report,
      tables = Seq((t, 2)), heal = Some(_ => root))
      .collect().map(x => (x.getString(2), (x.getBoolean(3), x.getLong(4)))).toMap
    assert(r("heal_restored")._1)
    assert(r("heal_verified") === ((true, 0L)))
    assert(EventStreams.readUpsertTable(spark, t)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap === expected)
  }

  test("clusterBy fold: the nightly fold re-clusters and the zone maps keep pruning") {
    val base = java.nio.file.Files.createTempDirectory("graft-clfold").toString
    val t = s"$base/t"
    // a delta trickle in arrival order dulls any clustering
    EventStreams.mergeBatchIntoTable(
      (0L until 16L).map(k => (k, k * 10L, 0L)).toDF("k", "n", "version"),
      t, Seq("k"), "version", 2, 0L, retain = 2, delta = true,
      statsCols = Some(Seq("n")))
    EventStreams.mergeBatchIntoTable(
      Seq((1L, 15L, 1L), (9L, 95L, 1L)).toDF("k", "n", "version"),
      t, Seq("k"), "version", 2, 1L, retain = 2, delta = true)
    val report = Maintenance.runOnce(spark, 1L, s"$base/report",
      folds = Seq((t, Seq("k"), 2, 1)),
      clusterBy = Map(t -> (Seq("n"), 4L)))
      .collect().map(x => (x.getString(2), x.getLong(4))).toMap
    assert(report("fold_compacted") === 1L)
    // the fold both dropped the reconcile spec AND re-clustered: each
    // bucket splits into sorted files and a narrow range read prunes
    val live = EventStreams.tableManifest(spark, t)
    assert(live.values.forall(_.size >= 2))
    val stats = EventStreams.tableFileStats(spark, t)
    assert(live.values.flatten.forall(stats.contains))
    val got = EventStreams.readUpsertTableWhere(spark, t,
      Seq(EventStreams.ColBound("n", Some("0"), Some("35"))))
    val want = EventStreams.readUpsertTable(spark, t)
      .filter(col("n") <= 35)
    assert(got.exceptAll(want).union(want.exceptAll(got)).isEmpty)
    assert(got.inputFiles.length < live.values.map(_.size).sum)
  }

  test("indexFolds leg: a backlogged serving index folds once; the next pass acts nothing") {
    val base = java.nio.file.Files.createTempDirectory("graft-idxfold").toString
    val idx = s"$base/idx"
    val vecs = (0L until 8L).map(i =>
      (i, (0 until 64).map(j => (1.0 + i * 0.5 + j * 0.01).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
    Similarity.buildIvfPqIndex(vecs, idx, nlist = 2, m = 8,
      codebookSize = 2, dim = 64)
    // backlog: two upsert windows (a moved vector + a takedown each)
    Similarity.upsertIntoIvfPqIndex(
      vecs.filter(col("vec_id") === 0), Seq(0L, 1L), idx, batchId = 1L)
    Similarity.upsertIntoIvfPqIndex(
      vecs.filter(col("vec_id") === 2), Seq(2L, 3L), idx, batchId = 2L)
    assert(Similarity.indexBacklog(spark, idx) === ((3, 2)))
    val before = Similarity.indexedVecIds(spark, idx)
      .collect().map(_.getLong(0)).toSet
    assert(before === Set(0L, 2L, 4L, 5L, 6L, 7L))
    val r1 = Maintenance.runOnce(spark, 1L, s"$base/report",
      indexFolds = Seq((idx, 2)))
      .collect().map(x => (x.getString(2), (x.getBoolean(3), x.getLong(4)))).toMap
    assert(r1("index_backlog") === ((false, 4L)))
    assert(r1("index_folded") === ((true, 1L)))
    assert(Similarity.indexBacklog(spark, idx) === ((1, 0)),
      "the fold consolidates and the tokens stop applying")
    assert(Similarity.indexedVecIds(spark, idx)
      .collect().map(_.getLong(0)).toSet === before)
    // second pass: healthy monitor, no action
    val r2 = Maintenance.runOnce(spark, 2L, s"$base/report",
      indexFolds = Seq((idx, 2)))
      .collect().map(x => (x.getString(2), (x.getBoolean(3), x.getLong(4)))).toMap
    assert(r2("index_backlog") === ((true, 0L)))
    assert(r2("index_folded") === ((true, 0L)))
  }

  test("retention leg: metadata-gated age-out drops covered files unread; drained backlog acts nothing") {
    import EventStreams.ColBound
    val base = java.nio.file.Files.createTempDirectory("graft-maint-ret").toString
    val t = s"$base/t"
    EventStreams.mergeBatchIntoTable(
      (0L until 32L).map(k => (k, k * 10L, 0L)).toDF("k", "n", "__v"),
      t, Seq("k"), "__v", nBuckets = 1, batchId = 0L, retain = 4,
      statsCols = Some(Seq("n")))
    EventStreams.compactUpsertTable(spark, t, Seq("k"), 1, 1L,
      sortBy = Seq("n"), maxRecordsPerFile = 4, retain = 4)
    // age out n <= 110: files [0,30],[40,70],[80,110] fully covered
    val bounds = Seq(ColBound("n", None, Some("110")))
    assert(EventStreams.retentionBacklog(spark, t, bounds) === ((3, true)))
    def pass(runId: Long) = Maintenance.runOnce(spark, runId, s"$base/report",
      tables = Seq((t, 4)), retention = Seq((t, bounds)))
      .filter(col("check").startsWith("retention"))
      .collect().map(x => (x.getString(2), (x.getBoolean(3), x.getLong(4)))).toMap
    val r1 = pass(1L)
    assert(r1("retention_contract") === ((true, 1L)))
    assert(r1("retention_backlog") === ((false, 3L)))
    assert(r1("retention_acted") === ((true, 1L)))
    assert(r1("retention_dropped_unread") === ((true, 3L)),
      "all three covered files must age out without a read")
    val left = EventStreams.readUpsertTable(spark, t)
    assert(left.count() === 20L)
    assert(left.agg(min(col("n"))).head().getLong(0) === 120L)
    // drained: the next night measures zero and acts nothing
    val r2 = pass(2L)
    assert(r2("retention_backlog") === ((true, 0L)))
    assert(r2("retention_acted") === ((true, 0L)))
    assert(EventStreams.readUpsertTable(spark, t).count() === 20L)
    // a table without a covering stats contract reports red and is NOT
    // acted on — nightly re-rewrites of stat-less files would thrash
    val tn = s"$base/tn"
    EventStreams.mergeBatchIntoTable(
      (0L until 8L).map(k => (k, k * 10L, 0L)).toDF("k", "n", "__v"),
      tn, Seq("k"), "__v", nBuckets = 1, batchId = 0L)
    val r3 = Maintenance.runOnce(spark, 3L, s"$base/report",
      retention = Seq((tn, bounds)))
      .filter(col("check").startsWith("retention"))
      .collect().map(x => (x.getString(2), (x.getBoolean(3), x.getLong(4)))).toMap
    assert(r3("retention_contract") === ((false, 1L)))
    assert(r3("retention_acted") === ((true, 0L)))
    assert(EventStreams.readUpsertTable(spark, tn).count() === 8L,
      "no contract, no action — the rows stay until the operator opts in")
  }

  test("recluster leg: metadata drift monitor; degraded buckets re-sort, healthy buckets byte-identical") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-rec").toString
    val (t, report) = (s"$base/t", s"$base/report")
    EventStreams.mergeBatchIntoTable(
      (0L until 32L).map(k => (k, k * 10L, 0L)).toDF("k", "n", "__v"),
      t, Seq("k"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
      delta = true, statsCols = Some(Seq("n")))
    // clustered fold: each bucket becomes 4 tight files, spec drops
    EventStreams.compactUpsertTable(spark, t, Seq("k"), 2, 1L, retain = 8,
      sortBy = Seq("n"), maxRecordsPerFile = 4)
    // CDC trickle into ONE bucket: delta files whose ranges straddle
    // the bucket's whole n range (arrival-ordered, the drift shape)
    val b0keys = (0L until 32L).toDF("k")
      .withColumn("b", pmod(hash(col("k")), lit(2)))
      .collect().collect { case r if r.getInt(1) == 0 => r.getLong(0) }
      .sorted
    val (kLo, kMid, kHi) = (b0keys.head, b0keys(b0keys.size / 2), b0keys.last)
    EventStreams.mergeBatchIntoTable(
      Seq((kLo, 1L, 1L), (kHi, 311L, 1L)).toDF("k", "n", "__v"),
      t, Seq("k"), "__v", nBuckets = 2, batchId = 2L, retain = 8, delta = true)
    EventStreams.mergeBatchIntoTable(
      Seq((kMid, 2L, 2L), (kHi, 310L, 2L)).toDF("k", "n", "__v"),
      t, Seq("k"), "__v", nBuckets = 2, batchId = 3L, retain = 8, delta = true)
    // the monitor reads the manifest stats only: the trickled bucket is
    // degraded, the untouched one is tight
    val drift = EventStreams.clusteringDrift(spark, t, Seq("n")).collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(drift(0)._2 > 0.3, s"the trickled bucket must read degraded: $drift")
    assert(drift(1)._2 === 0.0, s"the untouched bucket must read tight: $drift")
    val healthyBefore = EventStreams.tableManifest(spark, t)(1).sorted
    val expected = EventStreams.readUpsertTable(spark, t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def pass(runId: Long) = Maintenance.runOnce(spark, runId, report,
      tables = Seq((t, 8)),
      reclusters = Seq((t, Seq("n"), 0.3, 4L)))
      .filter(col("check").startsWith("cluster") ||
        col("check").startsWith("recluster"))
      .collect().map(x => (x.getString(2), (x.getBoolean(3), x.getLong(4)))).toMap
    val r1 = pass(1L)
    assert(r1("cluster_contract")._1)
    assert(!r1("cluster_drift")._1, "drift must flag the degraded bucket")
    assert(r1("recluster_acted") === ((true, 1L)),
      "exactly the one degraded bucket re-sorts")
    // healthy bucket: same shard-carried files, byte-identical paths
    assert(EventStreams.tableManifest(spark, t)(1).sorted === healthyBefore,
      "the healthy bucket's files must carry over untouched")
    // rows preserved, and the spec dropped (every bucket single-ordinal
    // again) so the Catalyst scan path — and its zone maps — work
    assert(EventStreams.readUpsertTable(spark, t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === expected)
    val scan = EventStreams.readUpsertTableScan(spark, t)
      .filter(col("n") <= 35L)
    scan.collect()
    val fin = scan.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    val nf = fin.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.get
    val live = EventStreams.tableManifest(spark, t).values.map(_.size).sum
    assert(nf < live,
      s"the re-sorted layout must prune range reads again ($nf of $live)")
    // idempotent replay: the re-sharpened layout measures healthy
    val r2 = pass(2L)
    assert(r2("cluster_drift")._1 && r2("recluster_acted") === ((true, 0L)))
  }

  test("fold x recluster coalescing: a bucket due for both rewrites ONCE, sorted (round 16)") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-coal").toString
    val (t, report) = (s"$base/t", s"$base/report")
    // a delta table with BOTH a reconcile backlog (depth > maxDepth)
    // and degraded clustering (arrival-ordered delta ranges straddle),
    // and NO clusterBy entry of its own — pre-coalescing the fold would
    // rewrite unsorted, then either the recluster leg rewrote AGAIN or
    // its since-fold thrash guard left the layout degraded forever
    EventStreams.mergeBatchIntoTable(
      (0L until 32L).map(k => (k, k * 10L, 0L)).toDF("k", "n", "__v"),
      t, Seq("k"), "__v", nBuckets = 2, batchId = 0L, retain = 8,
      delta = true, statsCols = Some(Seq("n")))
    (1L to 3L).foreach { i =>
      EventStreams.mergeBatchIntoTable(
        Seq((i, 320L - i, i), (i + 8, i, i)).toDF("k", "n", "__v"),
        t, Seq("k"), "__v", nBuckets = 2, batchId = i, retain = 8,
        delta = true)
    }
    val depth = EventStreams.tableManifest(spark, t).values.map(_.size).max
    assert(depth > 2, s"fixture must exceed the fold depth, got $depth")
    val commitsBefore = EventStreams.tableHistory(spark, t).count()
    val expected = EventStreams.readUpsertTable(spark, t)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = Maintenance.runOnce(spark, 1L, report,
      tables = Seq((t, 8)),
      folds = Seq((t, Seq("k"), 2, 2)), // maxDepth 2: the fold is due
      reclusters = Seq((t, Seq("n"), 0.3, 4L)))
      .filter(col("check").startsWith("fold") ||
        col("check").startsWith("cluster") ||
        col("check").startsWith("recluster") ||
        col("check").startsWith("delta"))
      .collect().map(x => (x.getString(2), (x.getBoolean(3), x.getLong(4)))).toMap
    assert(r("fold_compacted") === ((true, 1L)), "the fold must act")
    assert(r("recluster_acted") === ((true, 0L)),
      "the recluster leg must NOT rewrite again — the fold already sorted")
    // exactly ONE rewrite commit landed on the table
    assert(EventStreams.tableHistory(spark, t).count() === commitsBefore + 1,
      "both backlogs must clear in a single rewrite commit")
    // the single fold adopted the recluster's sort: the fresh layout's
    // per-bucket overlap is zero EVEN IGNORING the since-fold guard
    val drift = EventStreams.clusteringDrift(spark, t, Seq("n")).collect()
    assert(drift.forall(_.getDouble(2) === 0.0),
      s"the coalesced fold must have sorted the rewrite: " +
        drift.map(x => (x.getInt(0), x.getDouble(2))).mkString(","))
    assert(EventStreams.readUpsertTable(spark, t)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap === expected)
    // and the sorted layout prunes range reads
    val scan = EventStreams.readUpsertTableScan(spark, t).filter(col("n") <= 35L)
    scan.collect()
    val fin = scan.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case o => o
    }
    val nf = fin.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numFiles").value
    }.get
    val live = EventStreams.tableManifest(spark, t).values.map(_.size).sum
    assert(nf < live, s"the coalesced rewrite must prune ($nf of $live)")
  }

  test("recluster leg: a zClusterBy table re-z-orders the degraded bucket; both dimensions prune again") {
    val base = java.nio.file.Files.createTempDirectory("graft-maint-zrec").toString
    val (t, report) = (s"$base/t", s"$base/report")
    val grid = (0L until 256L).map(k =>
      (k, (k % 16L) * 10L, (k / 16L) * 10L, 0L)).toDF("k", "x", "y", "__v")
    EventStreams.mergeBatchIntoTable(grid, t, Seq("k"), "__v",
      nBuckets = 2, batchId = 0L, retain = 8, delta = true,
      statsCols = Some(Seq("x", "y")))
    EventStreams.compactUpsertTable(spark, t, Seq("k"), 2, 1L, retain = 8,
      zOrderBy = Seq("x", "y"), maxRecordsPerFile = 16)
    // trickle into bucket 0: delta files straddling BOTH dimensions
    val b0 = (0L until 256L).toDF("k")
      .withColumn("b", pmod(hash(col("k")), lit(2)))
      .collect().collect { case r if r.getInt(1) == 0 => r.getLong(0) }
    EventStreams.mergeBatchIntoTable(
      Seq((b0.head, 5L, 5L, 1L), (b0.last, 145L, 145L, 1L))
        .toDF("k", "x", "y", "__v"),
      t, Seq("k"), "__v", nBuckets = 2, batchId = 2L, retain = 8, delta = true)
    EventStreams.mergeBatchIntoTable(
      Seq((b0(1), 2L, 148L, 2L), (b0(b0.size - 2), 148L, 2L, 2L))
        .toDF("k", "x", "y", "__v"),
      t, Seq("k"), "__v", nBuckets = 2, batchId = 3L, retain = 8, delta = true)
    val drift = EventStreams.clusteringDrift(spark, t, Seq("x", "y")).collect()
      .map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(drift(0) > 0.3, s"the trickled bucket must read degraded: $drift")
    def pass(runId: Long) = Maintenance.runOnce(spark, runId, report,
      tables = Seq((t, 8)),
      reclusters = Seq((t, Seq("x", "y"), 0.3, 16L)),
      zClusterBy = Map(t -> ((Seq("x", "y"), 16L))))
      .filter(col("check").startsWith("cluster") ||
        col("check").startsWith("recluster"))
      .collect().map(r => (r.getString(2), (r.getBoolean(3), r.getLong(4)))).toMap
    val r1 = pass(1L)
    assert(!r1("cluster_drift")._1 && r1("recluster_acted")._2 >= 1L)
    // the z-ordered rewrite prunes range reads on BOTH dimensions
    def filesOpened(c: org.apache.spark.sql.Column): Long = {
      val d = EventStreams.readUpsertTableScan(spark, t).filter(c)
      d.collect()
      val fin = d.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case o => o
      }
      fin.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numFiles").value
      }.get
    }
    val live = EventStreams.tableManifest(spark, t).values.map(_.size).sum
    assert(filesOpened(col("x").between(0L, 25L)) < live,
      "x-range reads must prune after the z-ordered re-sort")
    assert(filesOpened(col("y").between(0L, 25L)) < live,
      "y-range reads must prune after the z-ordered re-sort")
    // replay: healthy, acts nothing
    val r2 = pass(2L)
    assert(r2("cluster_drift")._1 && r2("recluster_acted")._2 === 0L)
  }

  test("retention leg: a throwing backlog probe reports red and the pass continues (ADVICE r14)") {
    import EventStreams.ColBound
    val base = java.nio.file.Files.createTempDirectory("graft-maint-retx").toString
    val (bad, good, report) = (s"$base/bad", s"$base/good", s"$base/report")
    EventStreams.mergeBatchIntoTable(
      (0L until 8L).map(k => (k, k * 10L, 0L)).toDF("k", "n", "__v"),
      bad, Seq("k"), "__v", nBuckets = 1, batchId = 0L)
    EventStreams.mergeBatchIntoTable(
      (0L until 8L).map(k => (k, k * 10L, 0L)).toDF("k", "n", "__v"),
      good, Seq("k"), "__v", nBuckets = 1, batchId = 0L,
      statsCols = Some(Seq("n")))
    // a bound on a column the table does not HAVE makes the backlog
    // probe throw; the old behavior aborted the whole nightly pass
    // mid-run — remaining legs unrun, no report committed, lock freed
    // only by the throw path
    val r = Maintenance.runOnce(spark, 1L, report,
      tables = Seq((good, 1)),
      retention = Seq(
        (bad, Seq(ColBound("no_such_column", None, Some("10")))),
        (good, Seq(ColBound("n", None, Some("-1"))))))
      .collect().map(x => ((x.getString(1), x.getString(2)),
        (x.getBoolean(3), x.getLong(4)))).toMap
    assert(r(("table-bad", "retention_contract")) === ((false, 1L)),
      "the throwing probe must report a red contract, not abort")
    assert(r(("table-bad", "retention_acted")) === ((true, 0L)))
    // the remaining legs still ran: the good table's retention row,
    // its vacuum and its fsck all landed in the same report
    assert(r(("table-good", "retention_backlog")) === ((true, 0L)))
    assert(r.contains(("table-good", "vacuum_reclaimed")))
    assert(r(("table-good", "fsck_live_files_exist"))._1)
    // and the report committed, so the lock released: a second pass runs
    assert(Maintenance.runOnce(spark, 2L, report, tables = Seq((good, 1)))
      .count() > 0)
  }
}
