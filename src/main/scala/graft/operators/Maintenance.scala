package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Default unfolded-delta depth at which the `folds` leg acts
    * (`maxDepth <= 0` in a fold entry resolves to this). DERIVED FROM
    * MEASUREMENT, not picked: the DeltaDepth sweep (PLANS.md §r15,
    * x10 corpus) has the reconciled read at 1.38x the depth-1 cost
    * through depth 4, 1.63x at 8, then the knee — 2.23x at 16 and
    * 5.72x at 32. Folding at 8 caps the read tax near 1.6x while
    * amortizing each fold over 8 O(batch) commits; tables serving
    * latency-critical reads can pass a smaller explicit depth.
    */
  val defaultFoldDepth: Int = 8

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
    *     one — a replay no-ops on the generation guard);
    *   - `folds`: (tableDir, keyCols, nBuckets, maxDepth) DELTA-FOLD
    *     monitor-gated compaction for delta-merged upsert tables: the
    *     monitor reads the live manifest's per-bucket file counts (one
    *     metadata read, never the corpus); a table whose deepest
    *     bucket exceeds `maxDepth` files folds via
    *     [[graft.streaming.EventStreams.compactUpsertTable]] at the
    *     watermark + 1 — reconcile reads return to the plain-scan fast
    *     path. `maxDepth <= 0` resolves to [[defaultFoldDepth]] (the
    *     measured knee of the reconciled-read depth curve). Rows `delta_backlog` (ok = within depth; n = deepest
    *     bucket) and `fold_compacted` (n = 1 acted / 0 healthy). A
    *     replay sees the folded depth and acts nothing (the
    *     rebalance-leg idempotence shape). A `clusterBy` entry
    *     (tableDir -> (sortBy, maxRecordsPerFile)) makes the fold a
    *     CLUSTERED rewrite: a CDC trickle dulls sort order and the
    *     nightly fold re-sharpens the zone maps' per-file ranges; a
    *     `zClusterBy` entry (tableDir -> (zOrderBy, maxRecordsPerFile))
    *     is the multi-dimension variant — the fold Z-ORDERS the
    *     rewrite so range reads prune on every named column;
    *   - `indexFolds`: (indexDir, maxPending) the same monitor-gated
    *     fold for a serving IVF-PQ index's INCREMENTAL backlog
    *     ([[Similarity.upsertIntoIvfPqIndex]] defers physical work to
    *     the fold): pending = appended batch dirs past the first +
    *     removal tokens still hiding rows at the current watermark
    *     ([[Similarity.indexBacklog]] — one metadata read); past
    *     `maxPending` the index consolidates
    *     ([[Similarity.compactIvfPqIndex]] at the codes watermark + 1
    *     — removals become physical drops, inert tokens GC). Rows
    *     `index_backlog` / `index_folded`; a replay sees (1, 0) and
    *     acts nothing;
    *   - `heal`: opt-in HEAL leg (tableDir -> its backup dir, or the
    *     backups leg's rotation ROOT — [[resolveBackup]] picks the
    *     newest committed backup under a root, so the mapping stays
    *     valid across nightly rotation). A table
    *     whose VERIFY fsck is red on a file-existence invariant
    *     (`live_files_exist` / `pinned_files_exist`) restores from its
    *     backup as a NEW commit (rows landed after the backup roll
    *     back — the DR semantic), re-fscks, and reports
    *     `heal_restored` (ok = the restore committed; n = its batchId)
    *     and `heal_verified` (ok = post-heal fsck all green; n =
    *     remaining red checks). A missing/torn backup reports
    *     `heal_restored` red instead of killing the pass (the fsck
    *     posture: report, don't throw);
    *   - `indexHeal`: opt-in HEAL leg for the composed indexes —
    *     (committed corpus embeddings, nlist, m, codebookSize, dim).
    *     An index whose VERIFY fsck is red on an artifact-existence
    *     invariant (`generation_dirs_exist` / `codes_dirs_exist` /
    *     `active_artifacts_complete`) REBUILDS from the corpus as a
    *     new generation ([[Similarity.rebuildIvfPqIndex]] with
    *     `fromCorpus = true` — the damaged index's own membership may
    *     be unreadable, and the corpus is the source of truth derived
    *     state regenerates from; appends not yet merged back into the
    *     corpus roll back, the same semantic as the table heal), then
    *     re-fscks; rows `heal_rebuilt` (n = the new generation) and
    *     `heal_verified`. An unreadable ledger reports red instead of
    *     killing the pass;
    *   - `retention`: (tableDir, bounds) NIGHTLY AGE-OUT — the
    *     monitor-gated predicate delete: [[EventStreams
    *     .retentionBacklog]] counts from METADATA alone the live files
    *     whose recorded stats could hold a matching row; past zero
    *     (and only when the table's stats contract covers every bound
    *     column — without it the backlog can never drain and acting
    *     would rewrite the same stat-less files night after night,
    *     reported red as `retention_contract` instead of thrashing)
    *     the pass runs [[EventStreams.deleteUpsertTableWhere]] at the
    *     watermark + 1: covered files drop from the manifest UNREAD,
    *     boundaries rewrite. Rows `retention_contract` /
    *     `retention_backlog` (ok = nothing due) / `retention_acted` /
    *     `retention_dropped_unread` (n = files aged out without a
    *     read). A replay sees a drained backlog and acts nothing.
    *     NOTE: bounds are fixed per call — an age-out horizon
    *     ("older than 90 days") must be computed by the scheduler
    *     per night, which also keeps the pass itself deterministic;
    *   - `reclusters`: (tableDir, sortBy, maxOverlap, maxRecordsPerFile)
    *     CLUSTERING-DRIFT leg: [[EventStreams.clusteringDrift]] measures
    *     per-bucket range overlap from the manifest's recorded stats
    *     (metadata only); buckets past `maxOverlap` re-sort via
    *     [[EventStreams.compactUpsertTableBuckets]] — O(degraded
    *     buckets), healthy buckets byte-identical; a `zClusterBy`
    *     entry for the table makes the re-sort a z-ordered rewrite
    *     (drift measures the entry's columns, the rewrite re-sharpens
    *     every z-ordered dimension). Rows
    *     `cluster_contract` (stats cover the sort columns) /
    *     `cluster_drift` (ok = nothing degraded; n = worst overlap %) /
    *     `recluster_acted` (n = buckets re-sorted). A replay measures
    *     the re-sharpened layout and acts nothing;
    *   - `backups`: (tableDir, backupRoot, keepLast) NIGHTLY BACKUP
    *     ROTATION — after VERIFY/HEAL, back the table's current
    *     snapshot up into `backupRoot/b<runId>`, prune all but the
    *     newest `keepLast` backup dirs, and fsck every retained backup
    *     (a backup IS a single-snapshot table), reporting
    *     `backup_committed` / `backup_rotated` plus aggregated
    *     `fsck_backup_<check>` rows — a torn or rotted backup flags
    *     red BEFORE it's needed.
    * Returns the report rows (also committed to `reportDir`).
    *
    * CONCURRENCY: the pass takes a `_maintenance/lock` token inside
    * `reportDir` after argument validation (atomic create-exclusive)
    * and releases it after the report commits — or on the way out of a
    * THROWN failure in this JVM, so a bad pass never wedges the
    * scheduler behind a hand-removed token. A second scheduler racing it fails
    * loudly naming the holder; a replay of OUR OWN crashed runId
    * adopts the stale lock and completes the pass (the crash-replay
    * contract). A stale lock from a crashed run under a DIFFERENT
    * runId must be replayed to completion (or the token removed by an
    * operator who has verified nothing is running) before new ids run
    * — the same single-writer discipline every committed sink here
    * enforces.
    */
  def runOnce(spark: SparkSession, runId: Long, reportDir: String,
              tables: Seq[(String, Int)] = Seq.empty,
              indexes: Seq[(String, Int)] = Seq.empty,
              keepManifests: Int = 0,
              rebalance: Option[(String, String, String, Int, Double, Long, Int)] = None,
              drift: Option[(String, DataFrame, DataFrame, Long, Double)] = None,
              reportNBuckets: Int = 4,
              heal: Option[String => String] = None,
              backups: Seq[(String, String, Int)] = Seq.empty,
              indexHeal: Option[(DataFrame, Int, Int, Int, Int)] = None,
              folds: Seq[(String, Seq[String], Int, Int)] = Seq.empty,
              clusterBy: Map[String, (Seq[String], Long)] = Map.empty,
              indexFolds: Seq[(String, Int)] = Seq.empty,
              zClusterBy: Map[String, (Seq[String], Long)] = Map.empty,
              retention: Seq[(String, Seq[EventStreams.ColBound])] = Seq.empty,
              reclusters: Seq[(String, Seq[String], Double, Long)] = Seq.empty): DataFrame = {
    import spark.implicits._
    def name(dir: String) = dir.stripSuffix("/").split('/').last
    // ARGUMENT VALIDATION runs BEFORE the lock (ADVICE r13): a
    // deterministic bad-argument error after takeRunLock would leave
    // `_maintenance/lock` held — retries of the same bad call adopt the
    // lock and die again, and every other runId is refused until an
    // operator removes the token by hand.
    // Report rows key by (run_id, artifact, check) and artifacts label
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
    backups.foreach { case (_, _, keepLast) =>
      require(keepLast >= 1, s"backup keepLast must be >= 1, got $keepLast")
    }
    val foldLabels = folds.map(f => s"table-${name(f._1)}")
    require(foldLabels.distinct.size == foldLabels.size,
      s"fold labels collide (${foldLabels.mkString(", ")}): keep " +
        "artifact directory basenames unique across the set")
    // maxDepth <= 0 resolves to the measured default (defaultFoldDepth)
    val idxFoldLabels = indexFolds.map(f => s"ivfpq-${name(f._1)}")
    require(idxFoldLabels.distinct.size == idxFoldLabels.size,
      s"index-fold labels collide (${idxFoldLabels.mkString(", ")}): keep " +
        "artifact directory basenames unique across the set")
    indexFolds.foreach { case (_, maxPending) =>
      require(maxPending >= 1,
        s"index-fold maxPending must be >= 1, got $maxPending")
    }
    val bothClustered = clusterBy.keySet.intersect(zClusterBy.keySet)
    require(bothClustered.isEmpty,
      s"tables ${bothClustered.mkString(", ")} have both clusterBy and " +
        "zClusterBy entries; a fold sorts one way — pick one")
    val retLabels = retention.map(r => s"table-${name(r._1)}")
    require(retLabels.distinct.size == retLabels.size,
      s"retention labels collide (${retLabels.mkString(", ")}): keep " +
        "artifact directory basenames unique across the set")
    retention.foreach { case (dir, bounds) =>
      require(bounds.nonEmpty, s"retention bounds for $dir must be non-empty")
    }
    val recLabels = reclusters.map(r => s"table-${name(r._1)}")
    require(recLabels.distinct.size == recLabels.size,
      s"recluster labels collide (${recLabels.mkString(", ")}): keep " +
        "artifact directory basenames unique across the set")
    reclusters.foreach { case (dir, sortBy, maxOverlap, _) =>
      require(sortBy.nonEmpty, s"recluster sortBy for $dir must be non-empty")
      require(maxOverlap >= 0.0 && maxOverlap < 1.0,
        s"recluster maxOverlap for $dir must be in [0, 1), got $maxOverlap")
    }
    takeRunLock(spark, reportDir, runId)
    // a THROWN failure in this JVM is not a crash: release the lock on
    // the way out so a corrected retry (or another runId) is not wedged
    // behind a token only an operator can remove. A real crash (JVM
    // death) still leaves the token, and the same-runId replay adopts
    // it — the crash-replay contract is unchanged.
    try {
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String, String, Boolean, Long)]()
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
    retention.foreach { case (dir, bounds) =>
      val label = s"table-${name(dir)}"
      // due-ness from metadata alone (one manifest + shard-stats read);
      // acting without a covering stats contract would rewrite the same
      // stat-less files night after night — report red, don't thrash.
      // A probe that THROWS (bound column missing from the schema, no
      // readable manifest) also reports red and the pass CONTINUES
      // (ADVICE r14): aborting here would skip every remaining leg and
      // the report merge — contrary to the pass's own report-and-
      // continue convention (the unreadable-ledger heal path)
      scala.util.Try(EventStreams.retentionBacklog(spark, dir, bounds)) match {
        case scala.util.Failure(e) =>
          // the report row schema has no message column — LOG the
          // failure (class + message) so a genuinely broken probe
          // (missing column, unreadable manifest, a real bug) stays
          // diagnosable from the pass output while the report keeps
          // its report-and-continue posture (ADVICE r15)
          log.warn(s"maintenance run $runId: retention probe failed for " +
            s"$dir — reporting retention_contract red and continuing", e)
          rows += ((runId, label, "retention_contract", false, bounds.size.toLong))
          rows += ((runId, label, "retention_backlog", true, 0L))
          rows += ((runId, label, "retention_acted", true, 0L))
          rows += ((runId, label, "retention_dropped_unread", true, 0L))
        case scala.util.Success((backlog, covers)) =>
          rows += ((runId, label, "retention_contract", covers, bounds.size.toLong))
          rows += ((runId, label, "retention_backlog", backlog == 0, backlog.toLong))
          val acted = covers && backlog > 0
          var droppedUnread = 0L
          if (acted) {
            val id = EventStreams.appliedBatch(spark, dir).getOrElse(-1L) + 1
            val retain = tables.find(_._1 == dir).map(_._2).getOrElse(1)
            val rep = EventStreams.deleteUpsertTableWhere(spark, dir, bounds,
              id, retain)
            droppedUnread = rep.map(_.filesDropped.toLong).getOrElse(0L)
          }
          rows += ((runId, label, "retention_acted", true, if (acted) 1L else 0L))
          rows += ((runId, label, "retention_dropped_unread", true, droppedUnread))
      }
    }
    folds.foreach { case (dir, keyCols, nBuckets, maxDepth0) =>
      // <= 0 opts into the measured default (see [[defaultFoldDepth]])
      val maxDepth = if (maxDepth0 <= 0) defaultFoldDepth else maxDepth0
      val label = s"table-${name(dir)}"
      // depth from the live manifest alone — one metadata read
      val depth = EventStreams.tableManifest(spark, dir)
        .values.map(_.size).maxOption.getOrElse(0)
      rows += ((runId, label, "delta_backlog", depth <= maxDepth, depth.toLong))
      val acted = depth > maxDepth
      if (acted) {
        val id = EventStreams.appliedBatch(spark, dir).getOrElse(-1L) + 1
        // honor the table's configured retention when it also runs the
        // RECLAIM leg — a fold must not narrow the time-travel window
        val retain = tables.find(_._1 == dir).map(_._2).getOrElse(1)
        // a CDC trickle dulls sort clustering (delta files land in
        // arrival order); a clusterBy entry re-sharpens it on every
        // fold, so the table's zone maps keep pruning night after
        // night (statsCols inherit through the manifest contract).
        // zClusterBy is the multi-dimension variant (z-ordered fold:
        // range reads prune on every named column)
        val (sortBy0, maxRec0) = clusterBy.getOrElse(dir, (Nil, 0L))
        // FOLD x RECLUSTER COALESCING (round 16): a delta table due
        // for BOTH a fold (depth) and a re-sort (drift) must rewrite
        // each bucket ONCE, sorted — not folded unsorted here and then
        // re-sorted by the recluster leg (or worse, folded unsorted
        // and left degraded behind the recluster leg's since-fold
        // thrash guard). A table with a reclusters entry but no
        // clusterBy adopts the recluster's sort spec for the fold; the
        // recluster leg then measures the fresh sorted layout and acts
        // nothing.
        val rec = reclusters.find(_._1 == dir)
        val (sortBy, maxRec) =
          if (sortBy0.nonEmpty || zClusterBy.contains(dir)) (sortBy0, maxRec0)
          else rec.map(r => (r._2, r._4)).getOrElse((sortBy0, maxRec0))
        val (zBy, zMax) = zClusterBy.getOrElse(dir, (Nil, 0L))
        EventStreams.compactUpsertTable(spark, dir, keyCols, nBuckets, id,
          retain = retain, sortBy = sortBy,
          maxRecordsPerFile = if (zBy.nonEmpty) zMax else maxRec,
          zOrderBy = zBy)
      }
      rows += ((runId, label, "fold_compacted", true, if (acted) 1L else 0L))
    }
    reclusters.foreach { case (dir, sortBy, maxOverlap, maxRec) =>
      val label = s"table-${name(dir)}"
      // drift from the manifest's recorded ranges alone (one metadata
      // read); a broken contract (no stats on a sort column, no
      // manifest) reports red and the pass continues — the retention-
      // leg convention
      scala.util.Try(
        EventStreams.clusteringDrift(spark, dir, sortBy).collect()) match {
        case scala.util.Failure(e) =>
          log.warn(s"maintenance run $runId: clustering-drift probe failed " +
            s"for $dir — reporting cluster_contract red and continuing", e)
          rows += ((runId, label, "cluster_contract", false, sortBy.size.toLong))
          rows += ((runId, label, "cluster_drift", true, 0L))
          rows += ((runId, label, "recluster_acted", true, 0L))
        case scala.util.Success(drift) =>
          rows += ((runId, label, "cluster_contract", true, sortBy.size.toLong))
          // single-file buckets cannot overlap themselves, and buckets
          // UNCHANGED since their last fold (`folded` — one fold-kind
          // ordinal across every file) re-sort to the same layout, so
          // acting on them would thrash; only multi-file, post-fold-
          // mutated buckets past the threshold are degraded
          val degraded = drift.filter(r =>
            r.getInt(1) > 1 && r.getDouble(2) > maxOverlap && !r.getBoolean(3))
            .map(_.getInt(0)).toSet
          val worst = drift.map(_.getDouble(2)).maxOption.getOrElse(0.0)
          rows += ((runId, label, "cluster_drift", degraded.isEmpty,
            math.round(worst * 100)))
          if (degraded.nonEmpty) {
            val keyCols = EventStreams.tableKeyedBy(spark, dir).getOrElse(
              throw new IllegalArgumentException(
                s"$dir records no key contract; run one merge to adopt it"))
            val nB = EventStreams.tableHistory(spark, dir)
              .orderBy(col("batch_id").desc).select("n_buckets")
              .head().getInt(0)
            val id = EventStreams.appliedBatch(spark, dir).getOrElse(-1L) + 1
            val retain = tables.find(_._1 == dir).map(_._2).getOrElse(1)
            // re-sort ONLY the degraded buckets; healthy buckets'
            // shard pointers (and files) carry over byte-identical.
            // A zClusterBy entry for this table makes the re-sort a
            // Z-ORDERED rewrite (the folds-leg convention): drift is
            // measured on the entry's columns, the rewrite re-sharpens
            // every z-ordered dimension
            val (zBy, zMax) = zClusterBy.getOrElse(dir, (Nil, 0L))
            EventStreams.compactUpsertTableBuckets(spark, dir, keyCols,
              nB, id, degraded,
              sortBy = if (zBy.nonEmpty) Nil else sortBy,
              maxRecordsPerFile = if (zBy.nonEmpty) zMax else maxRec,
              retain = retain, zOrderBy = zBy)
          }
          rows += ((runId, label, "recluster_acted", true, degraded.size.toLong))
      }
    }
    indexFolds.foreach { case (dir, maxPending) =>
      val label = s"ivfpq-${name(dir)}"
      // backlog from metadata alone: incremental batch dirs past the
      // first + removal tokens still hiding rows at the current
      // watermark — the serving costs the upsert path defers to the fold
      val (dirs, hiding) = Similarity.indexBacklog(spark, dir)
      val pending = math.max(dirs - 1, 0) + hiding
      rows += ((runId, label, "index_backlog", pending <= maxPending,
        pending.toLong))
      val acted = pending > maxPending
      if (acted) {
        val id = Similarity.codesHighWater(spark, dir).map(_._1).getOrElse(-1L) + 1
        val retain = indexes.find(_._1 == dir).map(_._2).getOrElse(1)
        Similarity.compactIvfPqIndex(spark, dir, id, retain = retain)
      }
      rows += ((runId, label, "index_folded", true, if (acted) 1L else 0L))
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
    // ---- 3. VERIFY the end state (+ opt-in HEAL) ----------------------
    tables.foreach { case (dir, retain) =>
      // bounded collect: at most the fsck invariant count (~6 rows)
      val fsckRows = EventStreams.fsckUpsertTable(spark, dir).collect()
      fsckRows.foreach(r =>
        rows += ((runId, s"table-${name(dir)}", s"fsck_${r.getString(0)}",
          r.getBoolean(1), r.getLong(2))))
      val filesRed = fsckRows.exists(r =>
        (r.getString(0) == "live_files_exist" ||
          r.getString(0) == "pinned_files_exist") && !r.getBoolean(1))
      heal.filter(_ => filesRed).foreach { backupFor =>
        val label = s"table-${name(dir)}"
        // restore commits under the table's watermark + 1; callers'
        // later batches must use ids above it (the takedown id-window
        // convention). A missing/torn backup reports red, never throws.
        // The mapping may name a concrete backup dir OR a rotation root
        // ([[resolveBackup]]) — roots survive the nightly rotation.
        val restored =
          try {
            val src = resolveBackup(spark, backupFor(dir)).getOrElse(
              throw new IllegalArgumentException("no committed backup"))
            val id = EventStreams.appliedBatch(spark, dir).getOrElse(-1L) + 1
            EventStreams.restoreUpsertTable(spark, src, dir, id,
              retain)
            Some(id)
          } catch { case _: Exception => None }
        rows += ((runId, label, "heal_restored", restored.isDefined,
          restored.getOrElse(0L)))
        restored.foreach { _ =>
          val re = EventStreams.fsckUpsertTable(spark, dir).collect()
          val reds = re.count(r => !r.getBoolean(1)).toLong
          rows += ((runId, label, "heal_verified", reds == 0L, reds))
        }
      }
    }
    indexes.foreach { case (dir, retain) =>
      // bounded collect: at most the fsck invariant count (~8 rows)
      val fsckRows = Similarity.fsckIndex(spark, dir).collect()
      fsckRows.foreach(r =>
        rows += ((runId, s"ivfpq-${name(dir)}", s"fsck_${r.getString(0)}",
          r.getBoolean(1), r.getLong(2))))
      val artifactsRed = fsckRows.exists(r =>
        Set("generation_dirs_exist", "codes_dirs_exist",
          "active_artifacts_complete").contains(r.getString(0)) &&
          !r.getBoolean(1))
      indexHeal.filter(_ => artifactsRed).foreach {
        case (corpus, nlist, m, codebookSize, dim) =>
          val label = s"ivfpq-${name(dir)}"
          // rebuild as the next generation above everything committed;
          // an unreadable ledger (or a failed build) reports red, never
          // throws (the fsck posture)
          val rebuilt =
            try {
              val gen = Similarity.maxCommittedGeneration(spark, dir)
                .getOrElse(0L) + 1
              Similarity.rebuildIvfPqIndex(corpus, dir, gen, nlist, m,
                codebookSize, dim, retain = retain, fromCorpus = true)
              Some(gen)
            } catch { case _: Exception => None }
          rows += ((runId, label, "heal_rebuilt", rebuilt.isDefined,
            rebuilt.getOrElse(0L)))
          rebuilt.foreach { _ =>
            val re = Similarity.fsckIndex(spark, dir).collect()
            val reds = re.count(r => !r.getBoolean(1)).toLong
            rows += ((runId, label, "heal_verified", reds == 0L, reds))
          }
      }
    }
    // ---- 4. BACKUP + ROTATE + VERIFY the backups ----------------------
    backups.foreach { case (dir, backupRoot, keepLast) =>
      val label = s"table-${name(dir)}"
      val dest = f"$backupRoot/b$runId%020d"
      // single-shot dirs keyed by runId: a crashed pass's replay finds
      // the committed backup and returns its id without re-copying
      val backedUp = EventStreams.backupUpsertTable(spark, dir, dest)
      rows += ((runId, label, "backup_committed", true, backedUp))
      // fsck the JUST-COMMITTED backup BEFORE pruning anything (ADVICE
      // r13): rotation ran unconditionally, so with keepLast = 1 a torn
      // or rotted fresh backup could delete the only known-good older
      // one and leave ZERO usable backups. A red fresh backup now SKIPS
      // the rotation (backup_rotated ok = false, n = 0) and keeps every
      // older dir until a green backup lands.
      val newFsck = EventStreams.fsckUpsertTable(spark, dest).collect()
      val newGreen = newFsck.forall(_.getBoolean(1))
      val root = new org.apache.hadoop.fs.Path(backupRoot)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val dirs = fs.listStatus(root).filter(_.isDirectory)
        .map(_.getPath).sortBy(_.getName).toSeq
      val prune = if (newGreen) dirs.dropRight(keepLast) else Seq.empty
      prune.foreach(p => fs.delete(p, true))
      rows += ((runId, label, "backup_rotated", newGreen, prune.size.toLong))
      // every retained backup is itself a single-snapshot table — fsck
      // them all, aggregated per check (all green or the red n sums);
      // the fresh backup's rows are reused, not re-fscked
      val retainedFsck = newFsck.map(r =>
          (r.getString(0), r.getBoolean(1), r.getLong(2))) ++
        dirs.drop(prune.size).filter(_.getName != dest.split('/').last)
          .flatMap(b => EventStreams.fsckUpsertTable(spark, b.toString)
            .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2))))
      retainedFsck.groupBy(_._1).toSeq.sortBy(_._1)
        .foreach { case (check, rs) =>
          rows += ((runId, label, s"fsck_backup_$check",
            rs.forall(_._2), rs.map(_._3).sum))
        }
    }
    val report = rows.toSeq
      .toDF("run_id", "artifact", "check", "ok", "n")
    // the report commits LAST, keyed by (run_id, artifact, check):
    // a crash replays the whole pass under the stale lock; a replayed
    // runId no-ops here
    EventStreams.mergeBatchIntoTable(report, reportDir,
      Seq("run_id", "artifact", "check"), "run_id",
      nBuckets = reportNBuckets, batchId = runId, retain = 2)
    releaseRunLock(spark, reportDir)
    report
    } catch {
      case e: Throwable =>
        try releaseRunLock(spark, reportDir)
        catch { case _: Exception => () } // the original error wins
        throw e
    }
  }

  /** Resolve a heal mapping target to a concrete committed backup dir:
    * a dir that itself holds a committed backup manifest passes
    * through; a ROTATION ROOT (the `backups` leg's `backupRoot`)
    * resolves to its NEWEST committed backup dir. This is the guard
    * that keeps a `heal` mapping valid across rotation (ADVICE r13):
    * rotation renames the live backup every pass (`b<runId>`), so a
    * heal mapping pinned to one fixed dir dangles the night after the
    * rotation prunes it — map `heal` at the rotation ROOT and the
    * newest green backup always resolves. None when neither the dir
    * nor any child holds a committed backup.
    */
  def resolveBackup(spark: SparkSession, dirOrRoot: String): Option[String] = {
    if (EventStreams.latestCommittedBatchId(spark, dirOrRoot).isDefined)
      return Some(dirOrRoot)
    val root = new org.apache.hadoop.fs.Path(dirOrRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
      .sortBy(_.getName).reverseIterator
      .find(p => EventStreams.latestCommittedBatchId(spark, p.toString).isDefined)
      // keep the caller's path form (Path.toString would URI-qualify it)
      .map(p => s"${dirOrRoot.stripSuffix("/")}/${p.getName}")
  }

  /** Single-scheduler run lock: one `_maintenance/lock` token inside
    * the report table, taken by atomic create-exclusive. Concurrent
    * runOnce calls under DIFFERENT runIds race the act/reclaim phases'
    * single-writer primitives — one would die mid-pass with a
    * raced-writer error, leaving its remaining steps unrun while its
    * report claims an honest-but-incomplete pass (r12 verdict "what's
    * wrong" #3); the lock turns that into one clean loud failure at
    * entry. A replay of the SAME runId adopts a stale lock (the
    * crash-replay contract); the lock releases only after the report
    * commits.
    */
  private def takeRunLock(spark: SparkSession, reportDir: String,
                          runId: Long): Unit = {
    val lock = new org.apache.hadoop.fs.Path(s"$reportDir/_maintenance/lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(lock.getParent)
    try {
      val out = fs.create(lock, false) // atomic create-exclusive
      try out.write(runId.toString.getBytes("UTF-8")) finally out.close()
    } catch {
      case _: java.io.IOException =>
        val holder =
          try {
            val in = fs.open(lock)
            try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
          } catch { case _: Exception => "<unreadable>" }
        if (holder != runId.toString)
          throw new IllegalStateException(
            s"maintenance lock $lock is held by run '$holder': a " +
              s"concurrent (or crashed, unreplayed) pass — refusing to run " +
              s"runId $runId alongside it. Replay run '$holder' to " +
              "completion, or remove the lock after verifying nothing is " +
              "running.")
      // holder == our runId: a crashed attempt of THIS run — adopt the
      // lock and complete the pass (every step is idempotent)
    }
  }

  private def releaseRunLock(spark: SparkSession, reportDir: String): Unit = {
    val lock = new org.apache.hadoop.fs.Path(s"$reportDir/_maintenance/lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(lock, false)
    ()
  }
}
