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
  * documented: a stream's FIRST batch fails fast when its effective id
  * sits at or below the committed high-water mark without being a
  * genuine replay (its own batch dir still live) — the misconfigured
  * alternative is fresh shards silently no-opping as replays.
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
        // fail-fast base check on the stream's first batch: effective
        // id at/below the high-water mark is only legitimate when it is
        // a same-checkpoint replay — i.e. its own batch dir is still in
        // the live set. A stale base after compaction/takedown (whose
        // consolidated commit swept the old dirs) trips this instead of
        // silently dropping every drained shard as a "replay".
        if (batchId == 0L) {
          graft.operators.Similarity.codesHighWater(spark, indexDir)
            .foreach { case (maxBatch, liveDirs) =>
              require(batchIdBase > maxBatch ||
                  liveDirs.contains(s"batch=$batchIdBase"),
                s"batchIdBase $batchIdBase is at or below the index's " +
                  s"committed high-water mark $maxBatch and batch=$batchIdBase " +
                  "is not a live dir (it was compacted or taken down): fresh " +
                  "shards would silently no-op as replays. Restart the ingest " +
                  "with a fresh checkpoint and a base above the maintenance " +
                  "batch ids.")
            }
        }
        ingestShard(batch, indexDir, batchIdBase + batchId)
      }
      .start()
}
