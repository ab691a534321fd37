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
}
