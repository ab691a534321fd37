package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming maintenance for the composed IVF-PQ serving index — the
  * CurationStream convention (Trigger.AvailableNow + foreachBatch +
  * idempotent committed batches) applied to the ANN family: arriving
  * embedding shards encode under the FROZEN centroids/codebooks and
  * publish as sibling batch partitions
  * ([[graft.operators.Similarity.appendToIvfPqIndex]]); probes are
  * untouched mid-ingest (the codes-manifest commit flips readers
  * atomically). No arrival watermark — encoding is per-row against
  * frozen state, so any shard order yields the same index (the
  * RAG-index argument, q163).
  *
  * BATCH-ID CONTRACT: foreachBatch ids are CHECKPOINT-relative (0, 1,
  * 2, …) while the codes manifest's high-water mark is index-global —
  * the initial build consumed id 0, and maintenance operations
  * (compaction, takedown) consume further ids. `batchIdBase` maps the
  * stream's ids into the global space (effective id = base + stream
  * id); it MUST exceed every id already applied to the index, or the
  * manifest's replay guard will silently no-op fresh shards as
  * replays. One stream per index (the single-writer convention all
  * committed sinks here share); after an out-of-band compaction or
  * takedown, restart the stream with a fresh checkpoint and a base
  * above the maintenance ids. The contract is ENFORCED, not just
  * documented, and it distinguishes a genuine same-checkpoint restart
  * from a fresh checkpoint with a stale base (the two look alike to
  * the manifest — both present effective ids at or below the
  * high-water mark, but only the former may no-op them as replays):
  * the stream records its own base in a token file INSIDE the
  * checkpoint dir before applying its first batch. Token absent
  * (fresh checkpoint) → the base must sit STRICTLY ABOVE the
  * committed high-water mark, live batch dirs notwithstanding — a
  * default base of 1 against an index with three prior appends is
  * exactly the silent-data-loss misconfiguration this trips on.
  * Token present (restart) → the base must EQUAL the recorded one
  * (changing the base mid-checkpoint would re-map already-applied
  * stream ids onto different index ids), and at/below-high-water
  * effective ids are then genuine replays that correctly no-op.
  */
object IndexStream {

  /** One shard into the index — the foreachBatch body, exposed for
    * direct (non-streaming) shard-at-a-time callers.
    */
  def ingestShard(shard: DataFrame, indexDir: String, batchId: Long): Unit =
    graft.operators.Similarity.appendToIvfPqIndex(shard, indexDir, batchId)

  /** Drain new embedding-shard files and append each to the committed
    * index (`Trigger.AvailableNow` — the reference's `@daily` cadence:
    * each run ingests the backlog since the last checkpoint and
    * stops).
    */
  def startIngest(spark: SparkSession, corpusDir: String, schema: StructType,
                  indexDir: String, checkpointDir: String,
                  batchIdBase: Long = 1L): StreamingQuery =
    spark.readStream.schema(schema).parquet(corpusDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // fail-fast base check on the stream's first batch (see the
        // object doc): the checkpoint-local token tells a genuine
        // same-checkpoint restart (token present, base must match;
        // at/below-high-water ids are then real replays) apart from a
        // fresh checkpoint with a stale base (token absent, base must
        // exceed the committed high-water mark) — the latter would
        // otherwise silently no-op every drained shard as a "replay".
        checkBase(spark, indexDir, checkpointDir, batchIdBase, batchId)
        ingestShard(batch, indexDir, batchIdBase + batchId)
      }
      .start()

  /** Per-batch base guard + token commit. The token is written AFTER
    * the checks pass and BEFORE the shard applies, so a crash on
    * either side replays safely: before the write, nothing applied and
    * the fresh-checkpoint check re-runs; after it, the restart path
    * sees its own recorded base and proceeds. Runs on EVERY batch (not
    * just the first) because a restart that already applied batch 0
    * would otherwise never re-check a changed base. A token-less
    * checkpoint that is already mid-stream (batchId > 0) pre-dates
    * this guard and adopts its configured base (the legacy-layout
    * adoption convention).
    */
  private def checkBase(spark: SparkSession, indexDir: String,
                        checkpointDir: String, batchIdBase: Long,
                        batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val token = new Path(checkpointDir, "_graft_base")
    val fs = token.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(token)) {
      val in = fs.open(token)
      val body =
        try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
      // the token commits via tmp + rename below, so an unparseable
      // body means external damage, not a crash window — name the
      // recovery instead of leaking a NumberFormatException (whose
      // "obvious" fix, deleting the token, routes the restart into the
      // fresh-checkpoint branch and bricks the checkpoint on its
      // base-vs-high-water require)
      val recorded = body.toLongOption.getOrElse(throw new IllegalStateException(
        s"checkpoint base token $token is corrupt (read '$body'): restore " +
          "it to this checkpoint's original batchIdBase (the value the " +
          "stream was first started with) — do NOT delete it, a fresh-" +
          "checkpoint restart would re-map already-applied stream ids"))
      require(recorded == batchIdBase,
        s"this checkpoint was started with batchIdBase $recorded but is " +
          s"being restarted with $batchIdBase: changing the base mid-" +
          "checkpoint re-maps already-applied stream ids onto different " +
          "index ids. Keep the original base, or use a fresh checkpoint " +
          "with a base above the committed high-water mark.")
    } else {
      if (batchId == 0L)
        graft.operators.Similarity.codesHighWater(spark, indexDir)
          .foreach { case (maxBatch, _) =>
            require(batchIdBase > maxBatch,
              s"fresh checkpoint with batchIdBase $batchIdBase at or below " +
                s"the index's committed high-water mark $maxBatch: fresh " +
                "shards would silently no-op as replays (live batch dirs do " +
                "not make a stale base safe — batch=<base> being live just " +
                "means some EARLIER append used that id). Start fresh " +
                "checkpoints with a base above every applied batch id.")
          }
      // tmp + rename (the ledger/manifest commit convention): a crash
      // mid-write must not leave a truncated token for the next restart
      // to choke on
      val tmp = new Path(checkpointDir, "_graft_base.tmp")
      val out = fs.create(tmp, true)
      try out.write(batchIdBase.toString.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, token)) {
        // HDFS-semantics rename-to-existing returns false: a token that
        // appeared since the exists() check above (a retried batch of
        // this same run) must CARRY OUR BASE to be benign — verify, and
        // collect the tmp either way so restarts never trip over a
        // stale _graft_base.tmp (ADVICE r12)
        val existing =
          if (!fs.exists(token)) None
          else {
            val in2 = fs.open(token)
            try Some(new String(in2.readAllBytes(), "UTF-8").trim)
            finally in2.close()
          }
        if (fs.exists(tmp)) fs.delete(tmp, false)
        if (!existing.contains(batchIdBase.toString))
          throw new IllegalStateException(
            s"failed to commit checkpoint base token $token" +
              existing.fold("")(v => s" (an existing token reads '$v', " +
                s"not this stream's base $batchIdBase)"))
      }
    }
  }
}
