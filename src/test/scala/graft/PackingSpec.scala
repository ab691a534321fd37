package graft

import org.apache.spark.sql.functions._

/** Hand-built and invariant cases for concat-and-chunk sequence
  * packing ([[graft.operators.Packing]]).
  */
class PackingSpec extends SparkSpec {

  private def docs(texts: (Long, String)*) = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("packSequences lays the stream out doc by doc with separators") {
    // token counts 5, 3, 10 (costs 6, 4, 11 with the separator):
    //   d0 tokens [0,5)  sep 5
    //   d1 tokens [6,9)  sep 9
    //   d2 tokens [10,20) sep 20
    // seqLen 8 -> seq0 [0,8): d0 whole (5) + d1 head (2), 1 split
    //             seq1 [8,16): d1 tail (1) + d2 head (6), 2 split
    //             seq2 [16,24): d2 tail (4), 1 split
    val df = docs(
      0L -> "a b c d e",
      1L -> "f g h",
      2L -> "i j k l m n o p q r")
    val got = operators.Packing.packSequences(df, seqLen = 8, nParts = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got === Map(
      0L -> ((2L, 7L, 1L)),
      1L -> ((2L, 7L, 2L)),
      2L -> ((1L, 4L, 1L))))
  }

  test("packSequences drops empty docs and token mass is conserved") {
    import spark.implicits._
    // 40 docs of varying length plus two empty ones; mass conservation
    // (sum of per-seq doc_tokens == total corpus tokens), per-seq
    // occupancy bounded by seqLen, and seq ids contiguous from 0 (no
    // interior all-separator sequence can exist when every doc has
    // >= 1 token)
    val base = (0L until 40L).map(i => (i, Seq.fill((i % 7 + 1).toInt)("t").mkString(" ")))
    val df = (base :+ (40L -> "") :+ (41L -> " ")).toDF("doc_id", "text")
    val rows = operators.Packing.packSequences(df, seqLen = 16, nParts = 4)
      .collect()
    val totalTokens = base.map(_._2.split(" ").length.toLong).sum
    assert(rows.map(_.getLong(2)).sum === totalTokens)
    assert(rows.forall(_.getLong(2) <= 16L))
    assert(rows.forall(_.getLong(1) >= 1L))
    val ids = rows.map(_.getLong(0)).sorted
    assert(ids === (0L until ids.length.toLong).toArray)
  }

  test("trainingShards ranks are a permutation, shards contiguous, order partition-invariant") {
    val df = docs((0L until 60L).map(i =>
      i -> Seq.fill((i % 9 + 4).toInt)("w").mkString(" ")): _*)
    val seqs = operators.Packing.packSequences(df, seqLen = 16, nParts = 3)
    def run(n: Int) = operators.Packing
      .trainingShards(seqs, seqsPerShard = 4, nParts = n)
      .orderBy(col("rank")).collect()
    val rows = run(3)
    val n = rows.length
    // rank is a dense permutation 0..n-1 in u-order (ties broken by seq_id)
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (0L until n.toLong))
    val us = rows.map(_.getAs[Double]("u"))
    assert(us.zip(us.tail).forall { case (a, b) => a <= b })
    // shards are contiguous rank ranges of seqsPerShard (last may be short)
    rows.groupBy(_.getAs[Long]("shard_id")).foreach { case (sid, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.head === sid * 4 && ranks === (ranks.head to ranks.last))
      assert(rs.length <= 4)
    }
    // every sequence survives the shuffle exactly once
    assert(rows.map(_.getAs[Long]("seq_id")).sorted ===
      seqs.collect().map(_.getLong(0)).sorted)
    // determinism: the global order must not depend on the partitioning
    assert(run(1).map(_.toSeq).toSeq === run(7).map(_.toSeq).toSeq)
  }

  test("packShardIncremental: three shard passes equal one batch pack, replay no-ops") {
    val base = java.nio.file.Files.createTempDirectory("graft-incpack-spec").toString
    val tableDir = s"$base/seqs"
    // 40 docs, lengths chosen so sequences straddle both shard
    // boundaries (seqLen 16 never divides the running totals evenly)
    val all = docs((0L until 40L).map(i =>
      i -> Seq.fill((i % 7 + 3).toInt)("t").mkString(" ")): _*)
    val shards = Seq(
      all.filter(col("doc_id") < 13), all.filter(col("doc_id") >= 13 && col("doc_id") < 29),
      all.filter(col("doc_id") >= 29))
    shards.zipWithIndex.foreach { case (s, i) =>
      operators.Packing.packShardIncremental(s, tableDir, seqLen = 16, batchId = i.toLong)
    }
    // crash-replay: foreachBatch replays only the LAST batch — re-running
    // it must not double-count the boundary fold (both merges no-op on
    // their batchIds; retain=2 keeps exactly the replay window's files,
    // which is why an OLDER batch is legitimately not replayable)
    operators.Packing.packShardIncremental(shards(2), tableDir, seqLen = 16, batchId = 2L)
    // an EMPTY shard (a batch whose docs were all filtered upstream)
    // must advance the batchId without disturbing the table or cursor
    operators.Packing.packShardIncremental(
      all.filter(col("doc_id") < 0), tableDir, seqLen = 16, batchId = 3L)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("seq_id", "n_docs", "doc_tokens", "n_split_docs")
      .orderBy("seq_id").collect().map(_.toSeq).toSeq
    val inc = canon(graft.streaming.EventStreams.readUpsertTable(spark, tableDir))
    val batch = canon(operators.Packing.packSequences(all, seqLen = 16))
    assert(inc === batch)
    assert(inc.nonEmpty)
  }

  test("packShardIncremental fails fast on out-of-order arrival; replay is not misflagged") {
    val base = java.nio.file.Files.createTempDirectory("graft-incpack-ooo").toString
    val tableDir = s"$base/seqs"
    val all = docs((0L until 20L).map(i =>
      i -> Seq.fill((i % 5 + 2).toInt)("t").mkString(" ")): _*)
    operators.Packing.packShardIncremental(
      all.filter(col("doc_id") < 12), tableDir, seqLen = 16, batchId = 0L)
    // a backfill shard at/below the watermark must fail fast, not
    // silently commit offsets that diverge from batch semantics
    val ex = intercept[IllegalStateException] {
      operators.Packing.packShardIncremental(
        all.filter(col("doc_id") >= 5 && col("doc_id") < 12), tableDir,
        seqLen = 16, batchId = 1L)
    }
    assert(ex.getMessage.contains("out-of-order"))
    // the failed attempt committed nothing (the cursor commits LAST),
    // so the legitimate next shard proceeds under a NEW batchId — no
    // false out-of-order rejection after a failure
    operators.Packing.packShardIncremental(
      all.filter(col("doc_id") >= 12), tableDir, seqLen = 16, batchId = 2L)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select("seq_id", "n_docs", "doc_tokens", "n_split_docs")
      .orderBy("seq_id").collect().map(_.toSeq).toSeq
    assert(canon(graft.streaming.EventStreams.readUpsertTable(spark, tableDir)) ===
      canon(operators.Packing.packSequences(all, seqLen = 16)))
  }

  test("materializeTokenSequences lays out exact token arrays with separators") {
    import spark.implicits._
    // doc0 ids [1..5] (pos 0-4, sep 5), doc1 [6,7,8] (6-8, sep 9),
    // doc2 [9..18] (10-19, sep 20); L=8:
    //   seq0 [0,8)  = 1 2 3 4 5 99 6 7
    //   seq1 [8,16) = 8 99 9 10 11 12 13 14
    //   seq2 [16,24) has only 5 filled slots -> DROPPED (trailing partial)
    val df = Seq(
      (0L, Seq(1, 2, 3, 4, 5)),
      (1L, Seq(6, 7, 8)),
      (2L, (9 to 18).toSeq)).toDF("doc_id", "toks")
    val got = operators.Packing
      .materializeTokenSequences(df, seqLen = 8, sepId = 99, nParts = 2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(got === Map(
      0L -> Seq(1, 2, 3, 4, 5, 99, 6, 7),
      1L -> Seq(8, 99, 9, 10, 11, 12, 13, 14)))
  }

  test("doc spans: per-sequence attention-reset metadata, closed form; padded tail kept") {
    import spark.implicits._
    // same fixture as above; spans cover each doc's contiguous region
    // INCLUDING its separator where it lands:
    //   seq0: doc0 [0,6) (5 toks + sep), doc1 [6,8) (2 toks)
    //   seq1: doc1 [0,2) (tok 8 + sep), doc2 [2,8)
    //   seq2 (padded mode): doc2 [0,5) (4 toks + sep), then 3 pad slots
    val df = Seq(
      (0L, Seq(1, 2, 3, 4, 5)),
      (1L, Seq(6, 7, 8)),
      (2L, (9 to 18).toSeq)).toDF("doc_id", "toks")
    def spans(padId: Option[Int]) = operators.Packing
      .materializeTokenSequences(df, seqLen = 8, sepId = 99, nParts = 2,
        withSpans = true, padId = padId)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1).toSeq,
          r.getSeq[org.apache.spark.sql.Row](2)
            .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).toSeq)).toMap
    val dropped = spans(None)
    assert(dropped(0L)._2 === Seq((0L, 0L, 6L), (1L, 6L, 2L)))
    assert(dropped(1L)._2 === Seq((1L, 0L, 2L), (2L, 2L, 6L)))
    assert(!dropped.contains(2L))
    val padded = spans(Some(-7))
    assert(padded(0L) === dropped(0L))
    assert(padded(1L) === dropped(1L))
    // the trailing partial is KEPT, padded to exactly L, spans real-only
    assert(padded(2L)._1 === Seq(15, 16, 17, 18, 99, -7, -7, -7))
    assert(padded(2L)._2 === Seq((2L, 0L, 5L)))
  }

  test("materializeTokenSequences: mass conservation, fixed length, partition invariance") {
    import spark.implicits._
    // 30 docs, ragged lengths; every kept sequence has exactly L tokens,
    // the kept token stream is a prefix of the full concat stream, and
    // the layout is identical whatever the prefix-sum partitioning
    val docs = (0L until 30L).map(i =>
      (i, (0 until (i % 11 + 1).toInt).map(j => (i * 100 + j).toInt)))
    val df = docs.toDF("doc_id", "toks")
    def run(n: Int) = operators.Packing
      .materializeTokenSequences(df, seqLen = 16, sepId = -1, nParts = n)
      .orderBy(col("seq_id")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq)
    val rows = run(3)
    assert(rows.forall(_._2.length === 16))
    assert(rows.map(_._1).toSeq === (0L until rows.length.toLong))
    // reference stream: concat in doc_id order with sep after each doc
    val stream = docs.flatMap { case (_, ts) => ts :+ -1 }
    assert(rows.flatMap(_._2).toSeq === stream.take(rows.length * 16))
    assert(run(1).toSeq === run(5).toSeq)
  }

  test("materializeShardIncremental: shard passes equal the batch layout, replay no-ops") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-inctok-spec").toString
    val tableDir = s"$base/seqs"
    // ragged id streams; seqLen 16 never divides the running totals, so
    // every shard boundary leaves a half-filled carry sequence
    val all = (0L until 30L).map(i =>
      (i, (0 until (i % 11 + 1).toInt).map(j => (i * 100 + j).toInt)))
    val df = all.toDF("doc_id", "toks")
    val shards = Seq(df.filter(col("doc_id") < 9),
      df.filter(col("doc_id") >= 9 && col("doc_id") < 21),
      df.filter(col("doc_id") >= 21))
    shards.zipWithIndex.foreach { case (s, i) =>
      operators.Packing.materializeShardIncremental(
        s, tableDir, seqLen = 16, sepId = -1, batchId = i.toLong)
    }
    // crash-replay of the LAST batch must not re-append the carry
    operators.Packing.materializeShardIncremental(
      shards(2), tableDir, seqLen = 16, sepId = -1, batchId = 2L)
    // an empty shard advances the batchId without disturbing anything
    operators.Packing.materializeShardIncremental(
      df.filter(col("doc_id") < 0), tableDir, seqLen = 16, sepId = -1, batchId = 3L)
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getSeq[org.apache.spark.sql.Row](2)
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).toSeq))
        .sortBy(_._1).toSeq
    val inc = canon(graft.streaming.EventStreams.readUpsertTable(spark, tableDir)
      .select("seq_id", "tokens", "doc_spans").collect())
    // tokens AND doc_spans equal the batch layout — a sequence completed
    // across a shard boundary gets its spans through the carry row
    val batch = canon(operators.Packing
      .materializeTokenSequences(df, seqLen = 16, sepId = -1, withSpans = true)
      .select("seq_id", "tokens", "doc_spans").collect())
    assert(inc === batch)
    assert(inc.nonEmpty)
    // at least one committed sequence genuinely straddles a shard
    // boundary with docs from both sides (the carry-span proof is vacuous
    // otherwise): shard 1 starts at doc 9
    assert(inc.exists(s => s._3.exists(_._1 < 9L) && s._3.exists(_._1 >= 9L)))
  }

  test("materializeShardIncremental fails fast on out-of-order arrival") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-inctok-ooo").toString
    val tableDir = s"$base/seqs"
    val df = (0L until 10L).map(i => (i, Seq.tabulate(5)(j => (i * 10 + j).toInt)))
      .toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(
      df.filter(col("doc_id") < 6), tableDir, seqLen = 16, sepId = -1, batchId = 0L)
    val ex = intercept[IllegalStateException] {
      operators.Packing.materializeShardIncremental(
        df.filter(col("doc_id") === 3), tableDir, seqLen = 16, sepId = -1, batchId = 1L)
    }
    assert(ex.getMessage.contains("out-of-order"))
    // in-order continuation still works after the rejected backfill
    operators.Packing.materializeShardIncremental(
      df.filter(col("doc_id") >= 6), tableDir, seqLen = 16, sepId = -1, batchId = 1L)
    assert(graft.streaming.EventStreams.readUpsertTable(spark, tableDir).count() > 0)
  }

  test("an all-empty-toks shard still advances the arrival watermark deterministically") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-inctok-empty").toString
    val tableDir = s"$base/seqs"
    val df = (0L until 4L).map(i => (i, Seq.tabulate(5)(j => (i * 10 + j).toInt)))
      .toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(
      df.filter(col("doc_id") < 2), tableDir, seqLen = 16, sepId = -1, batchId = 0L)
    // docs 2-3 arrive with EMPTY token arrays: total_tokens is unchanged,
    // so the state row must win the upsert by its batchId version (the
    // pre-fix total_tokens versioning tied nondeterministically here)
    val empties = Seq((2L, Seq.empty[Int]), (3L, Seq.empty[Int])).toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(
      empties, tableDir, seqLen = 16, sepId = -1, batchId = 1L)
    // the watermark advanced to 3: a doc_id-3 replay under a NEW batch
    // must now be rejected as out-of-order
    val ex = intercept[IllegalStateException] {
      operators.Packing.materializeShardIncremental(
        Seq((3L, Seq(1, 2, 3))).toDF("doc_id", "toks"),
        tableDir, seqLen = 16, sepId = -1, batchId = 2L)
    }
    assert(ex.getMessage.contains("out-of-order"))
  }

  test("deleteDocsFromSequences: post-delete table equals a from-scratch build without the docs") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-tokdel").toString
    val tableDir = s"$base/seqs"
    val all = (0L until 30L).map(i =>
      (i, (0 until (i % 11 + 1).toInt).map(j => (i * 100 + j).toInt)))
    val df = all.toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(
      df.filter(col("doc_id") < 15), tableDir, seqLen = 16, sepId = -1, batchId = 0L)
    operators.Packing.materializeShardIncremental(
      df.filter(col("doc_id") >= 15), tableDir, seqLen = 16, sepId = -1, batchId = 1L)
    // takedown: a mid-stream doc and a late doc (plus an id not present)
    val deleted = Seq(7L, 22L, 999L)
    operators.Packing.deleteDocsFromSequences(
      df, deleted, tableDir, seqLen = 16, sepId = -1, batchId = 2L)
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getSeq[org.apache.spark.sql.Row](2)
          .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).toSeq))
        .sortBy(_._1).toSeq
    val after = canon(graft.streaming.EventStreams.readUpsertTable(spark, tableDir)
      .select("seq_id", "tokens", "doc_spans").collect())
    val scratch = canon(operators.Packing
      .materializeTokenSequences(
        df.filter(!col("doc_id").isin(deleted: _*)), seqLen = 16, sepId = -1,
        withSpans = true)
      .select("seq_id", "tokens", "doc_spans").collect())
    assert(after === scratch)
    assert(after.nonEmpty)
    assert(!after.exists(_._3.exists(s => deleted.contains(s._1))))
    // replay of the whole takedown no-ops
    operators.Packing.deleteDocsFromSequences(
      df, deleted, tableDir, seqLen = 16, sepId = -1, batchId = 2L)
    assert(canon(graft.streaming.EventStreams.readUpsertTable(spark, tableDir)
      .select("seq_id", "tokens", "doc_spans").collect()) === scratch)
    // the stream continues after the takedown: a new shard extends the
    // REBUILT layout exactly as a from-scratch build would
    val more = (30L until 36L).map(i =>
      (i, (0 until 7).map(j => (i * 100 + j).toInt))).toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(
      more, tableDir, seqLen = 16, sepId = -1, batchId = 4L)
    val after2 = canon(graft.streaming.EventStreams.readUpsertTable(spark, tableDir)
      .select("seq_id", "tokens", "doc_spans").collect())
    val scratch2 = canon(operators.Packing
      .materializeTokenSequences(
        df.filter(!col("doc_id").isin(deleted: _*)).unionByName(more),
        seqLen = 16, sepId = -1, withSpans = true)
      .select("seq_id", "tokens", "doc_spans").collect())
    assert(after2 === scratch2)
    // deleting ids ABSENT from the corpus is a complete no-op
    operators.Packing.deleteDocsFromSequences(
      df.filter(!col("doc_id").isin(deleted: _*)).unionByName(more),
      Seq(555L), tableDir, seqLen = 16, sepId = -1, batchId = 5L)
    assert(canon(graft.streaming.EventStreams.readUpsertTable(spark, tableDir)
      .select("seq_id", "tokens", "doc_spans").collect()) === scratch2)
  }

  test("selective re-export: untouched shard files byte-identical, touched shards refreshed") {
    import spark.implicits._
    import graft.streaming.EventStreams
    val base = java.nio.file.Files.createTempDirectory("graft-reexport").toString
    val (seqTable, shardTable, prov, export) =
      (s"$base/seqs", s"$base/shards", s"$base/prov", s"$base/export")
    val all = (0L until 40L).map(i =>
      (i, (0 until (i % 9 + 2).toInt).map(j => (i * 100 + j).toInt)))
    val df = all.toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(df, seqTable,
      seqLen = 16, sepId = -1, batchId = 0L)
    // sharded export table + provenance (the ensureTokenShards shape)
    val sharded = operators.Packing.trainingShards(
        EventStreams.readUpsertTable(spark, seqTable), seqsPerShard = 2)
      .drop("u").localCheckpoint()
    EventStreams.mergeBatchIntoTable(sharded, shardTable,
      Seq("seq_id"), "seq_id", nBuckets = 8, batchId = 0L)
    EventStreams.mergeBatchIntoTable(
      sharded.select(col("shard_id"), col("seq_id"),
          explode(col("doc_spans")).as("sp"))
        .select(col("shard_id"), col("seq_id"), col("sp.doc_id").as("doc_id"),
          col("sp.start").as("start"), col("sp.len").as("len")),
      prov, Seq("seq_id", "doc_id"), "seq_id", nBuckets = 8, batchId = 0L)
    operators.Packing.exportShardFiles(spark, shardTable, export)
    import scala.jdk.CollectionConverters._
    def fileState(): Map[String, (Long, Long)] = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(export))
      try st.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString ->
          (java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
      finally st.close()
    }
    val pre = fileState()
    // takedown a LATE doc so the cut leaves an untouched prefix
    val deleted = Seq(33L)
    operators.Packing.deleteDocsFromSequences(df, deleted, seqTable,
      seqLen = 16, sepId = -1, batchId = 10L)
    val fromSeq = operators.Packing.firstTouchedSeq(spark, prov, deleted).get
    assert(fromSeq > 0L) // the fixture really has an untouched prefix
    val touched = operators.Packing.reexportShards(
      EventStreams.readUpsertTable(spark, seqTable), shardTable, prov,
      export, fromSeq, batchId = 12L)
    assert(touched.nonEmpty)
    val post = fileState()
    // untouched shard dirs: same files, same sizes, same mtimes
    val touchedDirs = touched.map(id => s"shard_id=$id").toSet
    def untouchedOf(m: Map[String, (Long, Long)]) =
      m.filterNot { case (p, _) => touchedDirs.exists(p.contains) }
    assert(untouchedOf(post) === untouchedOf(pre))
    assert(untouchedOf(pre).nonEmpty)
    // the export equals the frozen-map expectation everywhere: updated
    // sequence content joined with the committed (rank, shard) map
    val expected = EventStreams.readUpsertTable(spark, seqTable)
      .join(sharded.select(col("seq_id"), col("rank"), col("shard_id")),
        Seq("seq_id"))
      .select(col("seq_id"), col("tokens"), col("rank"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getLong(2), r.getLong(3))).toSet
    val got = spark.read.parquet(export)
      .select(col("seq_id"), col("tokens"), col("rank"),
        col("shard_id").cast("long").as("shard_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getLong(2), r.getLong(3))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // provenance: refreshed, and no trace of the deleted doc anywhere
    assert(EventStreams.readUpsertTable(spark, prov)
      .filter(col("doc_id").isin(deleted: _*)).count() === 0L)
    val provRows = EventStreams.readUpsertTable(spark, prov)
      .select("seq_id", "doc_id", "start", "len").collect().map(_.toSeq).toSet
    val provExpected = EventStreams.readUpsertTable(spark, seqTable)
      .select(col("seq_id"), explode(col("doc_spans")).as("sp"))
      .select(col("seq_id"), col("sp.doc_id"), col("sp.start"), col("sp.len"))
      .collect().map(_.toSeq).toSet
    assert(provRows === provExpected)
    // crash-replay: lose a touched dir, replay with the same args — the
    // committed touched-set manifest restores it; untouched still intact
    val lostDir = java.nio.file.Paths.get(export, s"shard_id=${touched.head}")
    val lost = java.nio.file.Files.walk(lostDir)
    try lost.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
    finally lost.close()
    val replayTouched = operators.Packing.reexportShards(
      EventStreams.readUpsertTable(spark, seqTable), shardTable, prov,
      export, fromSeq, batchId = 12L)
    assert(replayTouched === touched)
    assert(untouchedOf(fileState()) === untouchedOf(pre))
    val got2 = spark.read.parquet(export)
      .select(col("seq_id"), col("tokens"), col("rank"),
        col("shard_id").cast("long").as("shard_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getLong(2), r.getLong(3))).toSet
    assert(got2 === expected)
  }

  test("re-export crash window: replay between the delete and merge halves loses nothing") {
    import spark.implicits._
    import graft.streaming.EventStreams
    val base = java.nio.file.Files.createTempDirectory("graft-reexport-cw").toString
    val (seqTable, shardTable, prov, export) =
      (s"$base/seqs", s"$base/shards", s"$base/prov", s"$base/export")
    val all = (0L until 40L).map(i =>
      (i, (0 until (i % 9 + 2).toInt).map(j => (i * 100 + j).toInt)))
    val df = all.toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(df, seqTable,
      seqLen = 16, sepId = -1, batchId = 0L)
    val sharded = operators.Packing.trainingShards(
        EventStreams.readUpsertTable(spark, seqTable), seqsPerShard = 2)
      .drop("u").localCheckpoint()
    EventStreams.mergeBatchIntoTable(sharded, shardTable,
      Seq("seq_id"), "seq_id", nBuckets = 8, batchId = 0L)
    EventStreams.mergeBatchIntoTable(
      sharded.select(col("shard_id"), col("seq_id"),
          explode(col("doc_spans")).as("sp"))
        .select(col("shard_id"), col("seq_id"), col("sp.doc_id").as("doc_id"),
          col("sp.start").as("start"), col("sp.len").as("len")),
      prov, Seq("seq_id", "doc_id"), "seq_id", nBuckets = 8, batchId = 0L)
    operators.Packing.exportShardFiles(spark, shardTable, export)
    operators.Packing.deleteDocsFromSequences(df, Seq(33L), seqTable,
      seqLen = 16, sepId = -1, batchId = 10L)
    val fromSeq = operators.Packing.firstTouchedSeq(spark, prov, Seq(33L)).get
    // the CRASH STATE the old code truncated shards from: the touched
    // manifest and the shard table's DELETE half are committed, the
    // merge half is not — simulate it with the same commits the
    // operation itself issues
    val expFs = new org.apache.hadoop.fs.Path(export)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val touchedSet = EventStreams.readUpsertTable(spark, prov)
      .filter(col("seq_id") >= fromSeq)
      .select(col("shard_id")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val manifest = new org.apache.hadoop.fs.Path(export, ".reexport-12.json")
    val out = expFs.create(manifest, true)
    try out.write(s"[${touchedSet.mkString(",")}]".getBytes("UTF-8"))
    finally out.close()
    EventStreams.deleteFromTable(spark, shardTable,
      EventStreams.readUpsertTable(spark, shardTable)
        .filter(col("seq_id") >= fromSeq).select(col("seq_id")),
      Seq("seq_id"), nBuckets = 8, batchId = 12L, retain = 2)
    // replay with the same arguments must COMPLETE the pair from the
    // pre-delete snapshot, not re-derive an empty refresh
    val touched = operators.Packing.reexportShards(
      EventStreams.readUpsertTable(spark, seqTable), shardTable, prov,
      export, fromSeq, batchId = 12L)
    assert(touched === touchedSet)
    val expected = EventStreams.readUpsertTable(spark, seqTable)
      .join(sharded.select(col("seq_id"), col("rank"), col("shard_id")),
        Seq("seq_id"))
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .collect().map(_.toSeq).toSet
    val got = EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .collect().map(_.toSeq).toSet
    assert(got === expected)
    assert(got.nonEmpty)
    // and the export agrees with the healed table everywhere
    val gotExport = spark.read.parquet(export)
      .select(col("seq_id"), col("rank"),
        col("shard_id").cast("long").as("shard_id"))
      .collect().map(_.toSeq).toSet
    assert(gotExport === expected)
  }

  test("rebalanceShards folds short shards dense, preserving the streaming order") {
    import spark.implicits._
    import graft.streaming.EventStreams
    val base = java.nio.file.Files.createTempDirectory("graft-rebalance").toString
    val (seqTable, shardTable, prov, export) =
      (s"$base/seqs", s"$base/shards", s"$base/prov", s"$base/export")
    val all = (0L until 40L).map(i =>
      (i, (0 until (i % 9 + 2).toInt).map(j => (i * 100 + j).toInt)))
    val df = all.toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(df, seqTable,
      seqLen = 16, sepId = -1, batchId = 0L)
    val sharded = operators.Packing.trainingShards(
        EventStreams.readUpsertTable(spark, seqTable), seqsPerShard = 2)
      .drop("u").localCheckpoint()
    EventStreams.mergeBatchIntoTable(sharded, shardTable,
      Seq("seq_id"), "seq_id", nBuckets = 8, batchId = 0L)
    EventStreams.mergeBatchIntoTable(
      sharded.select(col("shard_id"), col("seq_id"),
          explode(col("doc_spans")).as("sp"))
        .select(col("shard_id"), col("seq_id"), col("sp.doc_id").as("doc_id"),
          col("sp.start").as("start"), col("sp.len").as("len")),
      prov, Seq("seq_id", "doc_id"), "seq_id", nBuckets = 8, batchId = 0L)
    operators.Packing.exportShardFiles(spark, shardTable, export)
    // takedown + selective re-export: the frozen map now has HOLES
    // (vanished tail seq_ids held scattered shuffle-order ranks) —
    // three docs ≈ 30 token slots, enough to shrink the layout by
    // whole sequences
    val deleted = Seq(33L, 34L, 35L)
    operators.Packing.deleteDocsFromSequences(df, deleted, seqTable,
      seqLen = 16, sepId = -1, batchId = 10L)
    val fromSeq = operators.Packing.firstTouchedSeq(spark, prov, deleted).get
    operators.Packing.reexportShards(
      EventStreams.readUpsertTable(spark, seqTable), shardTable, prov,
      export, fromSeq, batchId = 12L)
    val holeStats = EventStreams.readUpsertTable(spark, shardTable)
      .agg(count(lit(1)), max(col("rank"))).head()
    assert(holeStats.getLong(0) < holeStats.getLong(1) + 1,
      "the fixture must actually leave rank holes")
    // streaming order BEFORE: surviving sequences by committed rank
    val orderPre = EventStreams.readUpsertTable(spark, shardTable)
      .orderBy(col("rank")).select(col("seq_id"))
      .collect().map(_.getLong(0)).toSeq
    import scala.jdk.CollectionConverters._
    def fileState(): Map[String, (Long, Long)] = {
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(export))
      try st.iterator().asScala.filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString ->
          (java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis)).toMap
      finally st.close()
    }
    val pre = fileState()
    val touched = operators.Packing.rebalanceShards(spark, shardTable, prov,
      export, seqsPerShard = 2, batchId = 20L)
    assert(touched.nonEmpty)
    // (a) DENSE again: ranks are exactly 0..n-1, every non-final shard
    // holds exactly seqsPerShard sequences
    val table = EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = table.length
    assert(table.map(_._2).sorted.toSeq === (0L until n.toLong))
    val maxShard = table.map(_._3).max
    table.groupBy(_._3).foreach { case (s, rows) =>
      if (s != maxShard)
        assert(rows.length === 2, s"shard $s should be full after the fold")
    }
    // (b) ORDER preserved: sequences by new rank == sequences by old rank
    val orderPost = table.sortBy(_._2).map(_._1).toSeq
    assert(orderPost === orderPre)
    // (c) prefix shards before the first hole: untouched, byte-identical
    val touchedDirs = touched.map(id => s"shard_id=$id").toSet
    def untouchedOf(m: Map[String, (Long, Long)]) =
      m.filterNot { case (p, _) => touchedDirs.exists(p.contains) }
    assert(untouchedOf(fileState()) === untouchedOf(pre))
    // (d) export equals the rebalanced table everywhere; folded-away
    // old shard ids have no dir
    val expected = EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id"), col("tokens"), col("rank"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getLong(2), r.getLong(3))).toSet
    val got = spark.read.parquet(export)
      .select(col("seq_id"), col("tokens"), col("rank"),
        col("shard_id").cast("long").as("shard_id"))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](1).toSeq,
        r.getLong(2), r.getLong(3))).toSet
    assert(got === expected && got.nonEmpty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(export, s"shard_id=${maxShard + 1}")))
    // (e) provenance tracks the new homes exactly
    val provRows = EventStreams.readUpsertTable(spark, prov)
      .select("shard_id", "seq_id", "doc_id", "start", "len")
      .collect().map(_.toSeq).toSet
    val provExpected = EventStreams.readUpsertTable(spark, shardTable)
      .select(col("shard_id"), col("seq_id"), explode(col("doc_spans")).as("sp"))
      .select(col("shard_id"), col("seq_id"), col("sp.doc_id"),
        col("sp.start"), col("sp.len"))
      .collect().map(_.toSeq).toSet
    assert(provRows === provExpected)
    // (f) replay with the same batchId is a pure no-op on the data
    val replayTouched = operators.Packing.rebalanceShards(spark, shardTable,
      prov, export, seqsPerShard = 2, batchId = 20L)
    assert(replayTouched === touched)
    assert(EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      === table.toSet)
    // (g) a rebalance of an already-dense table commits NOTHING
    val again = operators.Packing.rebalanceShards(spark, shardTable, prov,
      export, seqsPerShard = 2, batchId = 30L)
    assert(again === Seq.empty)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(export, ".rebalance-30.json")))
  }

  test("rebalanceIfSparse: healthy maps pay only the monitor, sparse maps fold") {
    import spark.implicits._
    import graft.streaming.EventStreams
    val base = java.nio.file.Files.createTempDirectory("graft-fillgate").toString
    val (seqTable, shardTable, prov, export) =
      (s"$base/seqs", s"$base/shards", s"$base/prov", s"$base/export")
    val all = (0L until 40L).map(i =>
      (i, (0 until (i % 9 + 2).toInt).map(j => (i * 100 + j).toInt)))
    operators.Packing.materializeShardIncremental(all.toDF("doc_id", "toks"),
      seqTable, seqLen = 16, sepId = -1, batchId = 0L)
    val sharded = operators.Packing.trainingShards(
        EventStreams.readUpsertTable(spark, seqTable), seqsPerShard = 2)
      .drop("u").localCheckpoint()
    EventStreams.mergeBatchIntoTable(sharded, shardTable,
      Seq("seq_id"), "seq_id", nBuckets = 8, batchId = 0L)
    EventStreams.mergeBatchIntoTable(
      sharded.select(col("shard_id"), col("seq_id"),
          explode(col("doc_spans")).as("sp"))
        .select(col("shard_id"), col("seq_id"), col("sp.doc_id").as("doc_id"),
          col("sp.start").as("start"), col("sp.len").as("len")),
      prov, Seq("seq_id", "doc_id"), "seq_id", nBuckets = 8, batchId = 0L)
    operators.Packing.exportShardFiles(spark, shardTable, export)
    // punch ONE mid-rank hole via the committed keyed delete
    val n = sharded.count()
    val vanish = sharded.filter(col("rank") === n / 2)
      .select(col("seq_id")).collect().map(_.getLong(0)).toSeq
    EventStreams.deleteFromTable(spark, shardTable, vanish.toDF("seq_id"),
      Seq("seq_id"), nBuckets = 8, batchId = 2L, retain = 2)
    EventStreams.deleteFromTable(spark, prov,
      EventStreams.readUpsertTable(spark, prov)
        .filter(col("seq_id").isin(vanish: _*))
        .select(col("seq_id"), col("doc_id")),
      Seq("seq_id", "doc_id"), nBuckets = 8, batchId = 2L, retain = 2)
    val stats = operators.Packing.shardFillStats(spark, shardTable, 2).head()
    assert(stats.getLong(0) === n - 1)          // n_seqs
    assert(stats.getLong(1) === n)              // n_slots
    assert(stats.getLong(2) === 1L)             // n_holes
    assert(stats.getLong(4) >= 1L)              // short_shards
    val preRows = EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .collect().map(_.toSeq).toSet
    // one hole over ~20 slots: fill ≈ 0.95 — a 0.9 gate holds the fold
    val healthy = operators.Packing.rebalanceIfSparse(spark, shardTable,
      prov, export, seqsPerShard = 2, batchId = 10L, minFill = 0.9).head()
    assert(!healthy.getBoolean(3) && !healthy.getBoolean(4))
    assert(EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .collect().map(_.toSeq).toSet === preRows)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(export, ".rebalance-10.json")),
      "a healthy map must not even derive the changed set")
    // a 0.99 gate trips: the fold runs and the map reads dense after
    val folded = operators.Packing.rebalanceIfSparse(spark, shardTable,
      prov, export, seqsPerShard = 2, batchId = 20L, minFill = 0.99).head()
    assert(folded.getBoolean(3) && folded.getBoolean(4))
    assert(folded.getInt(5) > 0)
    val post = operators.Packing.shardFillStats(spark, shardTable, 2).head()
    assert(post.getDouble(3) === 1.0 && post.getLong(2) === 0L &&
      post.getLong(4) === 0L)
  }

  // the shared shard-map fixture of the rebalance tests: 40 docs packed,
  // sharded, committed (table + provenance, `nBuckets` buckets), exported
  private def shardFixture(base: String, nBuckets: Int):
      (String, String, String, String, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    import graft.streaming.EventStreams
    val (seqTable, shardTable, prov, export) =
      (s"$base/seqs", s"$base/shards", s"$base/prov", s"$base/export")
    val all = (0L until 40L).map(i =>
      (i, (0 until (i % 9 + 2).toInt).map(j => (i * 100 + j).toInt)))
    val df = all.toDF("doc_id", "toks")
    operators.Packing.materializeShardIncremental(df, seqTable,
      seqLen = 16, sepId = -1, batchId = 0L)
    val sharded = operators.Packing.trainingShards(
        EventStreams.readUpsertTable(spark, seqTable), seqsPerShard = 2)
      .drop("u").localCheckpoint()
    EventStreams.mergeBatchIntoTable(sharded, shardTable,
      Seq("seq_id"), "seq_id", nBuckets = nBuckets, batchId = 0L)
    EventStreams.mergeBatchIntoTable(
      sharded.select(col("shard_id"), col("seq_id"),
          explode(col("doc_spans")).as("sp"))
        .select(col("shard_id"), col("seq_id"), col("sp.doc_id").as("doc_id"),
          col("sp.start").as("start"), col("sp.len").as("len")),
      prov, Seq("seq_id", "doc_id"), "seq_id", nBuckets = nBuckets,
      batchId = 0L)
    operators.Packing.exportShardFiles(spark, shardTable, export)
    (seqTable, shardTable, prov, export, df)
  }

  private def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.walk(src)
    try st.iterator().asScala.foreach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else {
        java.nio.file.Files.createDirectories(t.getParent)
        java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    } finally st.close()
  }

  private def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val st = java.nio.file.Files.walk(p)
      try st.iterator().asScala.toSeq.reverse.foreach(java.nio.file.Files.delete)
      finally st.close()
    }

  test("rebalanceIfSparse replays a fold that crashed between the merges and the export swap") {
    import graft.streaming.EventStreams
    val base = java.nio.file.Files.createTempDirectory("graft-fold-cw").toString
    val (seqTable, shardTable, prov, export, df) = shardFixture(base, 8)
    // punch rank holes: takedown + selective re-export (the frozen map)
    val deleted = Seq(33L, 34L, 35L)
    operators.Packing.deleteDocsFromSequences(df, deleted, seqTable,
      seqLen = 16, sepId = -1, batchId = 10L)
    val fromSeq = operators.Packing.firstTouchedSeq(spark, prov, deleted).get
    operators.Packing.reexportShards(
      EventStreams.readUpsertTable(spark, seqTable), shardTable, prov,
      export, fromSeq, batchId = 12L)
    // snapshot the pre-fold export, run the fold to completion, then
    // reconstruct the ADVICE crash window: table + provenance merges
    // committed, touched manifest committed, export swap NOT run —
    // byte-equivalent to a crash between rebalanceShards' merges and
    // its re-stage (restore the pre-fold export, keep the manifest)
    val backup = java.nio.file.Paths.get(s"$base/export-prefold")
    copyTree(java.nio.file.Paths.get(export), backup)
    val touched = operators.Packing.rebalanceShards(spark, shardTable, prov,
      export, seqsPerShard = 2, batchId = 20L)
    assert(touched.nonEmpty)
    val manifest = java.nio.file.Paths.get(export, ".rebalance-20.json")
    val manifestBytes = java.nio.file.Files.readAllBytes(manifest)
    deleteTree(java.nio.file.Paths.get(export))
    copyTree(backup, java.nio.file.Paths.get(export))
    java.nio.file.Files.write(manifest, manifestBytes)
    // the naked fill gate reads HEALTHY here (the merges landed) — this
    // is exactly the window a fill-only gate can never recover through
    val stats = operators.Packing.shardFillStats(spark, shardTable, 2).head()
    assert(stats.getDouble(3) === 1.0)
    // the gated entry point must detect the in-flight manifest and
    // drive the replay to completion anyway
    val row = operators.Packing.rebalanceIfSparse(spark, shardTable, prov,
      export, seqsPerShard = 2, batchId = 20L, minFill = 0.9).head()
    assert(!row.getBoolean(3), "current measured verdict: not sparse")
    assert(row.getBoolean(4), "but the in-flight fold must have replayed")
    // the export again equals the committed table everywhere, and old
    // shard ids folded away by the rebalance have no dir
    val expected = EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(export)
      .select(col("seq_id"), col("rank"),
        col("shard_id").cast("long").as("shard_id"))
      .collect().map(_.toSeq).toSet
    assert(got === expected && got.nonEmpty)
    val maxShard = expected.map(_(2).asInstanceOf[Long]).max
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(export, s"shard_id=${maxShard + 1}")))
  }

  test("a total-corpus takedown leaves an empty map: monitor healthy, gate no-ops") {
    import graft.streaming.EventStreams
    val base = java.nio.file.Files.createTempDirectory("graft-fold-empty").toString
    val (_, shardTable, prov, export, _) = shardFixture(base, 8)
    val allSeqs = EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id")).localCheckpoint()
    EventStreams.deleteFromTable(spark, shardTable, allSeqs,
      Seq("seq_id"), nBuckets = 8, batchId = 2L, retain = 2)
    EventStreams.deleteFromTable(spark, prov,
      EventStreams.readUpsertTable(spark, prov)
        .select(col("seq_id"), col("doc_id")).localCheckpoint(),
      Seq("seq_id", "doc_id"), nBuckets = 8, batchId = 2L, retain = 2)
    // max(rank) over zero rows is NULL — the monitor must report the
    // healthy zero row, not NULL slots (and the gate must not NPE)
    val s = operators.Packing.shardFillStats(spark, shardTable, 2).head()
    assert(s.getLong(0) === 0L && s.getLong(1) === 0L &&
      s.getLong(2) === 0L && s.getDouble(3) === 1.0 && s.getLong(4) === 0L)
    val row = operators.Packing.rebalanceIfSparse(spark, shardTable, prov,
      export, seqsPerShard = 2, batchId = 10L, minFill = 0.9).head()
    assert(!row.getBoolean(3) && !row.getBoolean(4) && row.getInt(5) === 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(export, ".rebalance-10.json")))
  }

  test("re-export and fold honor a non-default bucket count") {
    import graft.streaming.EventStreams
    val base = java.nio.file.Files.createTempDirectory("graft-nb3").toString
    // tables committed with 3 buckets: a delete hashing mod 8 would
    // silently skip the unmatched buckets and leave stale rows alive,
    // duplicating seq_ids after the refresh merges
    val (seqTable, shardTable, prov, export, df) = shardFixture(base, 3)
    val deleted = Seq(33L, 34L, 35L)
    operators.Packing.deleteDocsFromSequences(df, deleted, seqTable,
      seqLen = 16, sepId = -1, batchId = 10L)
    val fromSeq = operators.Packing.firstTouchedSeq(spark, prov, deleted).get
    operators.Packing.reexportShards(
      EventStreams.readUpsertTable(spark, seqTable), shardTable, prov,
      export, fromSeq, batchId = 12L, nBuckets = 3)
    def dups(dir: String, keys: Seq[String]): Long =
      EventStreams.readUpsertTable(spark, dir)
        .groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).count()
    assert(dups(shardTable, Seq("seq_id")) === 0L)
    assert(dups(prov, Seq("seq_id", "doc_id")) === 0L)
    assert(EventStreams.readUpsertTable(spark, prov)
      .filter(col("doc_id").isin(deleted: _*)).count() === 0L)
    // fold the holes dense under the same bucket count
    val row = operators.Packing.rebalanceIfSparse(spark, shardTable, prov,
      export, seqsPerShard = 2, batchId = 20L, minFill = 0.999,
      nBuckets = 3).head()
    assert(row.getBoolean(4))
    assert(dups(shardTable, Seq("seq_id")) === 0L)
    val post = operators.Packing.shardFillStats(spark, shardTable, 2).head()
    assert(post.getDouble(3) === 1.0 && post.getLong(4) === 0L)
    // and the export matches the healed table
    val expected = EventStreams.readUpsertTable(spark, shardTable)
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(export)
      .select(col("seq_id"), col("rank"),
        col("shard_id").cast("long").as("shard_id"))
      .collect().map(_.toSeq).toSet
    assert(got === expected && got.nonEmpty)
  }

  test("packSequences is invariant to the partition count") {
    // the two-job prefix sum must give identical offsets whatever the
    // range-partitioning — determinism contract of the pattern
    val df = docs((0L until 25L).map(i =>
      i -> Seq.fill((i % 5 + 2).toInt)("w").mkString(" ")): _*)
    def run(n: Int) =
      operators.Packing.packSequences(df, seqLen = 8, nParts = n)
        .orderBy(col("seq_id")).collect().map(_.toSeq).toSeq
    assert(run(1) === run(7))
  }
}
