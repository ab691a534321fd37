package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.EventStreams

/** ONE SCHEDULED MAINTENANCE PASS over a committed artifact set — the
  * nightly crontab entry a 100 TB deployment actually runs, composing
  * the monitor-gated operations this engine already has into act →
  * reclaim → verify order with a COMMITTED report:
  *
  *   1. ACT: the fold monitor ([[Packing.rebalanceIfSparse]] — folds
  *      only below `minFill`) and the drift monitor
  *      ([[Similarity.rebuildIfDrifted]] — retrains only past the PSI
  *      threshold). A healthy system commits NOTHING here.
  *   2. RECLAIM: [[EventStreams.vacuumUpsertTable]] /
  *      [[Similarity.vacuumIndex]] sweep what retention (and released
  *      pins) no longer hold; optional manifest compaction bounds the
  *      chains.
  *   3. VERIFY: [[EventStreams.fsckUpsertTable]] /
  *      [[Similarity.fsckIndex]] check the END state — metadata vs
  *      filesystem, after the pass's own mutations.
  *
  * The report — one (run_id, artifact, check, ok, n) row per monitor
  * verdict, reclaim count, and fsck invariant — COMMITS into
  * `reportDir` as a keyed upsert table under `batchId = runId`, LAST
  * (the state-commits-last convention): a crash anywhere replays the
  * whole pass — every step is idempotent or monitor/manifest-guarded —
  * and the report lands exactly once; a replay of a committed runId
  * re-runs the idempotent steps and no-ops the merge. Maintenance
  * history becomes a queryable committed artifact: "when did the fold
  * last act", "is fsck green every night", "how much does vacuum
  * reclaim per week" are one scan each.
  *
  * Driver-side state is bounded by contract: a handful of artifacts ×
  * at most 8 fsck rows plus one monitor row each — never data rows.
  */
object Maintenance {

  /** Run one pass. Parameters name the artifact set:
    *   - `tables`: (tableDir, retain) keyed upsert tables to vacuum +
    *     fsck; `keepManifests` > 0 also compacts each chain (pins are
    *     honored everywhere);
    *   - `indexes`: (indexDir, retain) composed IVF-PQ indexes to
    *     vacuum + fsck;
    *   - `rebalance`: (shardTableDir, provDir, exportDir, seqsPerShard,
    *     minFill, batchId, nBuckets) runs the fill-monitor-gated fold;
    *   - `drift`: (indexDir, embeddings, shard, generation, threshold)
    *     runs the PSI-gated rebuild (the [[Similarity.rebuildIfDrifted]]
    *     contract: `embeddings` is the committed corpus asset, `shard`
    *     the arriving sample, `generation` must exceed every committed
    *     one — a replay no-ops on the generation guard).
    * Returns the report rows (also committed to `reportDir`).
    */
  def runOnce(spark: SparkSession, runId: Long, reportDir: String,
              tables: Seq[(String, Int)] = Seq.empty,
              indexes: Seq[(String, Int)] = Seq.empty,
              keepManifests: Int = 0,
              rebalance: Option[(String, String, String, Int, Double, Long, Int)] = None,
              drift: Option[(String, DataFrame, DataFrame, Long, Double)] = None,
              reportNBuckets: Int = 4): DataFrame = {
    import spark.implicits._
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, String, Boolean, Long)]()
    def name(dir: String) = dir.stripSuffix("/").split('/').last
    // report rows key by (run_id, artifact, check) and artifacts label
    // by directory BASENAME (the deleteDocs ledger convention) — two
    // same-named dirs would silently merge onto one key and the losing
    // artifact's red fsck row could vanish behind the winner's green
    val tableLabels = tables.map(t => s"table-${name(t._1)}")
    require(tableLabels.distinct.size == tableLabels.size,
      s"table labels collide (${tableLabels.mkString(", ")}): keep " +
        "artifact directory basenames unique across the set")
    val indexLabels = indexes.map(i => s"ivfpq-${name(i._1)}")
    require(indexLabels.distinct.size == indexLabels.size,
      s"index labels collide (${indexLabels.mkString(", ")}): keep " +
        "artifact directory basenames unique across the set")
    // ---- 1. ACT (monitor-gated; healthy systems commit nothing) ----
    rebalance.foreach { case (shardTable, prov, export, seqsPerShard, minFill, batchId, nBuckets) =>
      val r = Packing.rebalanceIfSparse(spark, shardTable, prov, export,
        seqsPerShard, batchId, minFill, nBuckets).head()
      // ok = healthy at measurement; n = action magnitude
      rows += ((runId, s"export-${name(export)}", "fill_healthy",
        !r.getBoolean(3), math.round(r.getDouble(2) * 100)))
      rows += ((runId, s"export-${name(export)}", "fold_rebalanced",
        true, r.getInt(5).toLong))
    }
    drift.foreach { case (indexDir, embeddings, shard, generation, threshold) =>
      val r = Similarity.rebuildIfDrifted(spark, indexDir, embeddings,
        shard, generation, threshold).head()
      rows += ((runId, s"ivfpq-${name(indexDir)}", "drift_healthy",
        !r.getBoolean(3), math.round(r.getDouble(2) * 100)))
      rows += ((runId, s"ivfpq-${name(indexDir)}", "drift_rebuilt",
        true, if (r.getBoolean(4)) 1L else 0L))
    }
    // ---- 2. RECLAIM --------------------------------------------------
    tables.foreach { case (dir, retain) =>
      val reclaimed = EventStreams.vacuumUpsertTable(spark, dir, retain,
        keepManifests)
      rows += ((runId, s"table-${name(dir)}", "vacuum_reclaimed", true,
        reclaimed.toLong))
    }
    indexes.foreach { case (dir, retain) =>
      val reclaimed = Similarity.vacuumIndex(spark, dir, retain)
      rows += ((runId, s"ivfpq-${name(dir)}", "vacuum_reclaimed", true,
        reclaimed.toLong))
    }
    // ---- 3. VERIFY the end state ------------------------------------
    tables.foreach { case (dir, _) =>
      EventStreams.fsckUpsertTable(spark, dir).collect().foreach(r =>
        rows += ((runId, s"table-${name(dir)}", s"fsck_${r.getString(0)}",
          r.getBoolean(1), r.getLong(2))))
    }
    indexes.foreach { case (dir, _) =>
      Similarity.fsckIndex(spark, dir).collect().foreach(r =>
        rows += ((runId, s"ivfpq-${name(dir)}", s"fsck_${r.getString(0)}",
          r.getBoolean(1), r.getLong(2))))
    }
    val report = rows.toSeq
      .toDF("run_id", "artifact", "check", "ok", "n")
    // the report commits LAST, keyed by (run_id, artifact, check):
    // a crash replays the idempotent pass; a replayed runId no-ops here
    EventStreams.mergeBatchIntoTable(report, reportDir,
      Seq("run_id", "artifact", "check"), "run_id",
      nBuckets = reportNBuckets, batchId = runId, retain = 2)
    report
  }
}
