package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE-CALL takedown across every committed artifact — the
  * orchestration layer the per-artifact primitives were missing: a
  * right-to-be-forgotten request names DOCUMENTS, but by export time a
  * document's traces live in several independently-committed artifacts
  * (the corpus upsert table, the dedup signature store, the packed
  * sequence table, the RAG chunk index, the ANN codes table), each with
  * its own delete call — and a MISSED call silently leaves the doc
  * resurrectable from whichever artifact was skipped. [[deleteDocs]]
  * walks the full artifact set under ONE batchId window with a
  * committed per-artifact completion LEDGER, so the request is one
  * transaction boundary:
  *
  *   - each artifact's delete is the existing idempotent primitive
  *     (EventStreams.deleteFromTable / Packing.deleteDocsFromSequences /
  *     Rag.deleteDocs / Similarity.deleteFromIvfPqIndex) — the
  *     orchestrator adds no new mutation machinery;
  *   - after each primitive commits, a ledger token lands
  *     (`ledgerDir/batch=<id>/<artifact>.done`, the tiny-file commit
  *     convention); the final `_complete` token seals the request;
  *   - a crash mid-walk replays with the SAME arguments: completed
  *     artifacts skip via their tokens (their primitives would no-op
  *     anyway — the tokens also spare the corpus re-read the sequence
  *     primitive needs), the remainder completes, `_complete` lands —
  *     the q177 two-commit rule generalized across artifacts
  *     (TakedownSpec proves a mid-walk crash + replay leaves every
  *     artifact equal to its from-scratch-without-docs build).
  *
  * Artifacts are LABELED by their directory basename (`.../corpus` →
  * `table-corpus`) — callers keep basenames unique across the artifact
  * set (they name the ledger tokens and the audit rows).
  *
  * Batch-id contract: every artifact family has its own id space; the
  * request consumes `batchId` AND `batchId + 1` in each (the sequence
  * primitive uses both; the others leave id `batchId + 1` unconsumed
  * but reserved), so later operations on ANY of the artifacts must use
  * ids above `batchId + 1`. As with every multi-commit operation here,
  * a crashed request must be replayed to completion before new batches
  * append.
  *
  * 100 TB shape: each step is the primitive's own bounded work —
  * touched-buckets rewrite, suffix re-lay from the cut point, codes
  * filter-and-republish — never a full-corpus pass beyond what the
  * primitive itself pays; and because the artifacts' roots and id
  * spaces are independent, `concurrency` > 1 overlaps the steps so the
  * request's wall-clock is the slowest artifact, not the sum.
  */
object Takedown {

  /** Walk the artifact set (see object doc). Parameters:
    *   - `sequences`: (corpusToks, tableDir, seqLen, sepId) for the
    *     packed sequence table — `corpusToks` must be the ORIGINAL
    *     unfiltered corpus asset (the
    *     [[Packing.deleteDocsFromSequences]] replay contract);
    *   - `keyedTables`: (tableDir, docIdCol, nBuckets) upsert tables
    *     whose rows key by a doc-id column (corpus table, signature
    *     store, curation state, provenance, ...);
    *   - `ragIndex`: committed chunk-index root;
    *   - `ivfPqIndex` + `vecIds`: composed-ANN index root and the
    *     vector ids to remove (defaults to `docIds` — the
    *     one-embedding-per-doc convention of the embeddings table).
    * `docIds` is the legal request set (bounded by contract).
    *
    * `concurrency` > 1 walks the artifacts from a driver-side thread
    * pool (round-11 debt #1): the primitives mutate INDEPENDENT roots
    * in independent batch-id spaces, so their Spark jobs interleave
    * safely under the scheduler and wall-clock drops to roughly the
    * slowest artifact instead of the sum. The ledger protocol is
    * unchanged — each token still commits only after ITS primitive, so
    * one failed artifact leaves exactly its token absent while the
    * others complete; `_complete` lands only when every step succeeded,
    * and a replay (at any concurrency) finishes the remainder. The
    * first failure is rethrown after all in-flight steps settle.
    *
    * `export` = (shardTableDir, provDir, exportDir) folds the EXPORT
    * REMEDIATION into the same transaction boundary (requires
    * `sequences` — the re-stage reads the takedown's updated sequence
    * table): without it, [[Packing.reexportShards]] is a separate
    * manual call and the exported shard FILES keep serving deleted
    * text until someone remembers. The step runs as a SECOND phase
    * after every primary artifact settles (it depends on the sequence
    * re-lay), under its own ledger token — and because the cut point
    * derives from provenance rows the re-export itself deletes, the
    * cut is COMMITTED FIRST as `<label>.cut` inside the batch dir: a
    * replay that crashed anywhere inside the re-export re-reads the
    * committed cut instead of re-deriving a now-vanished (or worse,
    * different) one. Docs that never reached any committed sequence
    * commit a no-op token (the export is already clean). The provDir
    * belongs to this step — do NOT also list it in `keyedTables`.
    *
    * `rebalance` = (seqsPerShard, minFill) adds the FOLD as a third
    * phase after the re-export (requires `export`): the re-export's
    * frozen map leaves rank holes, and once enough takedowns
    * accumulate the shards run short — [[Packing.rebalanceIfSparse]]
    * measures the fill ratio and folds only below `minFill`, under
    * its own ledger token. With both remediations on, the request
    * consumes batch ids `batchId` through `batchId + 3` in the shard
    * map's and provenance's id spaces (re-export pair, then fold
    * pair); later operations there must use ids above `batchId + 3`.
    *
    * `exportNBuckets` is the bucket count the shard map and its
    * provenance were COMMITTED with (the `keyedTables` nBuckets
    * contract applied to the export pair): delete keys hash under
    * this modulus, so a mismatch silently leaves stale rows alive.
    */
  def deleteDocs(spark: SparkSession, docIds: Seq[Long], batchId: Long,
                 ledgerDir: String,
                 sequences: Option[(DataFrame, String, Int, Int)] = None,
                 keyedTables: Seq[(String, String, Int)] = Seq.empty,
                 ragIndex: Option[String] = None,
                 ivfPqIndex: Option[String] = None,
                 vecIds: Option[Seq[Long]] = None,
                 concurrency: Int = 1,
                 export: Option[(String, String, String)] = None,
                 rebalance: Option[(Int, Double)] = None,
                 exportNBuckets: Int = 8,
                 beforeCommit: () => Unit = () => ()): Unit = {
    import spark.implicits._
    val steps: Seq[(String, () => Unit)] =
      sequences.toSeq.map { case (toks, dir, seqLen, sepId) =>
        (s"sequences-${baseName(dir)}", () =>
          Packing.deleteDocsFromSequences(toks, docIds, dir, seqLen, sepId,
            batchId))
      } ++
      // retain = 2 on every primitive: the pre-request snapshot stays
      // readable through (and after) the walk, so [[auditDocsAt]] pinned
      // at this request's batchId has its snapshots to read — the
      // audit-window contract
      // `beforeCommit` threads into each keyed-table delete leg — the
      // coordination seam (the mergeBatchIntoTable convention): the OCC
      // specs run a full disjoint-bucket ingest merge there, forcing
      // the takedown's OWN commit through the optimistic rebase
      // mid-walk, and prove neither writer's rows are lost
      keyedTables.map { case (dir, keyCol, nBuckets) =>
        (s"table-${baseName(dir)}", () =>
          graft.streaming.EventStreams.deleteFromTable(spark, dir,
            docIds.toDF(keyCol), Seq(keyCol), nBuckets, batchId, retain = 2,
            beforeCommit = beforeCommit))
      } ++
      ragIndex.toSeq.map { dir =>
        (s"rag-${baseName(dir)}", () =>
          Rag.deleteDocs(spark, dir, docIds, batchId, retain = 2))
      } ++
      ivfPqIndex.toSeq.map { dir =>
        (s"ivfpq-${baseName(dir)}", () =>
          Similarity.deleteFromIvfPqIndex(spark, dir,
            vecIds.getOrElse(docIds), batchId, retain = 2))
      }
    require(steps.nonEmpty, "takedown request names no artifacts")
    require(export.isEmpty || sequences.nonEmpty,
      "export remediation requires the sequences artifact (the re-stage " +
        "reads the takedown's updated sequence table)")
    require(rebalance.isEmpty || export.nonEmpty,
      "the fold requires export remediation (it operates on the same " +
        "shard map / provenance / export triple)")
    val exportSteps: Seq[(String, () => Unit)] = export.toSeq.map {
      case (shardTableDir, provDir, exportDir) =>
        val seqTableDir = sequences.get._2
        (s"export-${baseName(exportDir)}", () => {
          val cut = readOrCommitCut(spark, ledgerDir, batchId,
            s"export-${baseName(exportDir)}",
            () => Packing.firstTouchedSeq(spark, provDir, docIds))
          cut.foreach { fromSeq =>
            Packing.reexportShards(
              graft.streaming.EventStreams.readUpsertTable(spark, seqTableDir),
              shardTableDir, provDir, exportDir, fromSeq, batchId,
              nBuckets = exportNBuckets)
          }
        })
    }
    val allLabels = steps.map(_._1) ++ exportSteps.map(_._1)
    require(allLabels.distinct.size == allLabels.size,
      s"artifact labels collide (${allLabels.mkString(", ")}): " +
        "keep artifact directory basenames unique across the set")
    require(concurrency >= 1, s"concurrency must be >= 1, got $concurrency")
    val pending = steps.filterNot { case (label, _) =>
      tokenExists(spark, ledgerDir, batchId, label)
    }
    def runOne(label: String, run: () => Unit): Unit = {
      run()
      writeToken(spark, ledgerDir, batchId, label)
    }
    if (concurrency == 1 || pending.size <= 1) {
      pending.foreach { case (label, run) => runOne(label, run) }
    } else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(concurrency, pending.size))
      try {
        val futures = pending.map { case (label, run) =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = runOne(label, run)
          })
        }
        // settle EVERY step before deciding the request's fate: a slow
        // successful sibling must still land its token so the replay
        // skips it
        val failures = futures.flatMap(f => scala.util.Try(f.get()).failed.toOption)
        failures.headOption.foreach {
          case e: java.util.concurrent.ExecutionException => throw e.getCause
          case e => throw e
        }
      } finally pool.shutdownNow()
    }
    // phase 2: export remediation depends on the sequence re-lay, so it
    // runs only after every primary artifact settled
    exportSteps.filterNot { case (label, _) =>
      tokenExists(spark, ledgerDir, batchId, label)
    }.foreach { case (label, run) => runOne(label, run) }
    // phase 3: the fold runs on the re-exported map (ids +2/+3 — above
    // the re-export pair)
    for {
      (seqsPerShard, minFill) <- rebalance
      (shardTableDir, provDir, exportDir) <- export
      label = s"rebalance-${baseName(exportDir)}"
      if !tokenExists(spark, ledgerDir, batchId, label)
    } runOne(label, () => {
      Packing.rebalanceIfSparse(spark, shardTableDir, provDir, exportDir,
        seqsPerShard, batchId + 2, minFill, nBuckets = exportNBuckets).collect()
      ()
    })
    writeToken(spark, ledgerDir, batchId, completeToken)
  }

  /** The committed CUT POINT of an export-remediation step: read
    * `<label>.cut` if a prior attempt committed it, else derive via
    * `compute` and commit (tmp + rename — the content matters, unlike
    * the empty `.done` tokens). `None` (committed as `-`) means the
    * docs never reached a committed sequence and the export is clean.
    */
  private def readOrCommitCut(spark: SparkSession, ledgerDir: String,
                              batchId: Long, label: String,
                              compute: () => Option[Long]): Option[Long] = {
    val dir = batchDir(ledgerDir, batchId)
    val fs = fsOf(spark, dir)
    val p = new org.apache.hadoop.fs.Path(dir, s"$label.cut")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val body = try new String(in.readAllBytes(), "UTF-8").trim
        finally in.close()
      if (body == "-") None else Some(body.toLong)
    } else {
      val cut = compute()
      if (!fs.exists(dir)) fs.mkdirs(dir)
      val tmp = new org.apache.hadoop.fs.Path(dir, s"$label.cut.tmp")
      val out = fs.create(tmp, true)
      try out.write(cut.map(_.toString).getOrElse("-").getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(tmp, p) && !fs.exists(p))
        throw new IllegalStateException(s"failed to commit cut token $p")
      cut
    }
  }

  /** The request's committed ledger: one row per artifact token under
    * `batch=<batchId>` plus the completion row — (artifact, complete).
    * `complete` is TRUE on every row once `_complete` sealed the
    * request; a crashed request reads back with the finished artifacts
    * listed and complete = FALSE (the replay-me signal).
    */
  def ledger(spark: SparkSession, ledgerDir: String, batchId: Long): DataFrame = {
    import spark.implicits._
    val done = listTokens(spark, ledgerDir, batchId)
    val complete = done.contains(completeToken)
    done.filterNot(_ == completeToken).sorted
      .map(a => (a, complete)).toDF("artifact", "complete")
  }

  /** CROSS-ARTIFACT audit — q182's question widened from "which shards
    * does this takedown touch" to "does ANY committed artifact still
    * reference these docs": one keyed lookup per artifact (pushed id
    * predicates — never a re-derivation of any layout), unioned into
    * (artifact, n_refs) rows. Zero everywhere = the request is fully
    * forgotten; a nonzero row names exactly the artifact that missed
    * its delete. The sequence-table check covers both the committed
    * sequences' span metadata AND the carry spans in its state row.
    * `exportProv` audits the exported shard files through their
    * committed provenance manifest (the q182 lineage read — the
    * export's rows carry token ids, not doc ids, so provenance IS its
    * reference index). Reads each artifact's LATEST snapshot — racing
    * a concurrent [[deleteDocs]] walk this returns a mixed answer; use
    * [[auditDocsAt]] to pin one batch boundary across every artifact.
    */
  def auditDocs(spark: SparkSession, docIds: Seq[Long],
                sequenceTable: Option[String] = None,
                keyedTables: Seq[(String, String)] = Seq.empty,
                ragIndex: Option[String] = None,
                ivfPqIndex: Option[String] = None,
                vecIds: Option[Seq[Long]] = None,
                exportProv: Option[String] = None): DataFrame =
    auditWith(spark, docIds, sequenceTable, keyedTables, ragIndex,
      ivfPqIndex, vecIds, exportProv,
      read = dir => Some(graft.streaming.EventStreams.readUpsertTable(spark, dir)),
      vecIdsRead = dir => Similarity.indexedVecIds(spark, dir),
      // BUCKET-PRUNED when provably safe: a table whose manifest
      // records its key contract as exactly (keyCol) point-reads the
      // requested ids' buckets instead of scanning the table — at
      // 100 TB a handful-of-keys audit must not pay a full pass. Any
      // other contract (multi-column key, partial-key audit, pre-r14
      // manifest with no record) falls back to scan + filter: the
      // audit must never under-count on a guessed bucketing.
      keyedRead = (dir, keyCol) => {
        import spark.implicits._
        val es = graft.streaming.EventStreams
        if (es.tableKeyedBy(spark, dir).contains(Seq(keyCol)))
          Some(es.readUpsertTableForKeys(spark, dir,
            docIds.toDF(keyCol), Seq(keyCol)))
        else Some(es.readUpsertTable(spark, dir)
          .filter(col(keyCol).isin(docIds: _*)))
      })

  /** PINNED cross-artifact audit — [[auditDocs]] AS OF one batch
    * boundary: every artifact reads its latest snapshot committed
    * STRICTLY BELOW `asOfBatch`, composing the per-artifact time-travel
    * primitives (EventStreams.readUpsertTableBefore,
    * Similarity.indexedVecIdsBefore). The race [[auditDocs]] cannot
    * win: racing a concurrent [[deleteDocs]] walk, the LATEST-snapshot
    * audit returns a MIXED answer (artifact A post-delete, artifact B
    * pre) that neither confirms nor denies the takedown — the pinned
    * audit is stable at every point of the walk (pin at the request's
    * `batchId` for the pre-request world, at `batchId + 2` — past the
    * request's id window — for the post-request world).
    *
    * Retention contract: the pin must sit within every artifact's
    * retention window. [[deleteDocs]] retains the pre-request snapshot
    * on each primitive (retain = 2; the sequence/export pairs retain
    * their full manifest span) precisely so both pins above stay
    * readable through and after the walk; an artifact with no commit
    * below the pin fails fast rather than guessing. One documented
    * limit: a request composing export remediation AND the fold
    * consumes up to four manifests on the shard map and provenance
    * (delete/merge twice) — the pre-REQUEST pin over those two tables
    * is only guaranteed for touched buckets through the re-export
    * pair, not past the fold (untouched buckets' files persist across
    * manifests regardless). Audit exported files pre-request BEFORE
    * scheduling a fold, pin post-request (`batchId + 4`, always
    * readable) — or take DURABLE pins with [[pinForAudit]], which
    * holds every artifact's resolving snapshot against any number of
    * later commits until [[releaseAudit]].
    */
  def auditDocsAt(spark: SparkSession, docIds: Seq[Long], asOfBatch: Long,
                  sequenceTable: Option[String] = None,
                  keyedTables: Seq[(String, String)] = Seq.empty,
                  ragIndex: Option[String] = None,
                  ivfPqIndex: Option[String] = None,
                  vecIds: Option[Seq[Long]] = None,
                  exportProv: Option[String] = None,
                  pinLabel: Option[String] = None): DataFrame =
    auditWith(spark, docIds, sequenceTable, keyedTables, ragIndex,
      ivfPqIndex, vecIds, exportProv,
      // COMMITTED-EMPTY is a real snapshot (ADVICE r12): a takedown
      // that emptied a keyed artifact leaves its resolving manifest
      // with no files, and the pinned audit's answer there is 0 refs —
      // the total-takedown case's primary verdict — not an error. Only
      // "no manifest below the pin" fails fast.
      read = dir => graft.streaming.EventStreams
        .readUpsertTableBeforeOpt(spark, dir, asOfBatch)
        .getOrElse(throw new IllegalArgumentException(
          s"$dir has no committed snapshot before batch $asOfBatch " +
            "(the pinned audit needs a snapshot below its pin)")),
      // a [[pinForAudit]]-held audit MUST name its pin: a rebuild
      // committed since the request flips the active generation (whose
      // codes batch-ids restart at 0), so the active-resolved read
      // would silently answer from the wrong epoch — the pinned
      // generation is where the audit's universe lives. Table reads
      // need no label: their resolution is by batch id over manifests
      // the pin keeps readable.
      vecIdsRead = dir => pinLabel match {
        case Some(l) => Similarity.indexedVecIdsBeforePinned(spark, dir, l, asOfBatch)
        case None => Similarity.indexedVecIdsBefore(spark, dir, asOfBatch)
      },
      // BUCKET-PRUNED below the pin when provably safe (the auditDocs
      // rule, time-travel flavor): the RESOLVING manifest must record
      // its key contract as exactly (keyCol) — a contract adopted only
      // after the pin proves nothing about the pinned layout. Any
      // other contract falls back to scan + filter over the pinned
      // file set (already bounded by the snapshot).
      keyedRead = (dir, keyCol) => {
        import spark.implicits._
        val es = graft.streaming.EventStreams
        if (es.tableKeyedByBefore(spark, dir, asOfBatch).contains(Seq(keyCol)))
          es.readUpsertTableForKeysBefore(spark, dir,
            docIds.toDF(keyCol), Seq(keyCol), asOfBatch)
            .getOrElse(throw new IllegalArgumentException(
              s"$dir has no committed snapshot before batch $asOfBatch " +
                "(the pinned audit needs a snapshot below its pin)"))
        else graft.streaming.EventStreams
          .readUpsertTableBeforeOpt(spark, dir, asOfBatch)
          .getOrElse(throw new IllegalArgumentException(
            s"$dir has no committed snapshot before batch $asOfBatch " +
              "(the pinned audit needs a snapshot below its pin)"))
          .map(_.filter(col(keyCol).isin(docIds: _*)))
      })

  /** DURABLE hold for a pinned audit — the retention-contract upgrade:
    * [[auditDocsAt]]'s pin is readable only while every artifact's
    * ROLLING `retain` window still covers it, and the scaladoc above
    * documents the composition that consumes it (export remediation +
    * fold = four manifests on the shard map and provenance). This call
    * replaces that bookkeeping with named pins: every artifact the
    * audit will read gets a retention pin at the snapshot
    * `auditDocsAt(asOfBatch)` resolves (strictly below `asOfBatch` —
    * upsert tables pin `asOfBatch - 1`, the index pins its codes
    * manifest below the boundary plus the ACTIVE generation), and
    * every later sweep — whatever its `retain`, however many commit
    * pairs the request composes — keeps those snapshots until
    * [[releaseAudit]]. Take the pins BEFORE scheduling the request,
    * audit at leisure (days later, racing nothing), release, and the
    * next sweep reclaims the storage.
    *
    * Returns (artifact label -> resolved pin id) — the same labels
    * [[auditDocs]] reports, so a verdict can join them. Table-family
    * entries carry the RESOLVED manifest batchId their pin holds; the
    * ivfpq entry carries the resolved codes-manifest seq
    * ([[Similarity.pinIndexForAudit]]'s return; -1 for a frozen
    * pre-manifest index, which no sweep can ever touch) — each entry
    * is the id of the snapshot the pinned audit actually reads
    * (ADVICE r12: never the raw boundary). Fails fast on an artifact
    * with no snapshot below the boundary (nothing to audit there —
    * the [[auditDocsAt]] contract).
    */
  def pinForAudit(spark: SparkSession, label: String, asOfBatch: Long,
                  sequenceTable: Option[String] = None,
                  keyedTables: Seq[String] = Seq.empty,
                  ragIndex: Option[String] = None,
                  ivfPqIndex: Option[String] = None,
                  exportProv: Option[String] = None,
                  expiresAtMillis: Long = Long.MaxValue): Map[String, Long] = {
    import graft.streaming.EventStreams
    // a partial failure must not strand the pins already taken — an
    // unreleased hold the caller never learns the shape of is exactly
    // the leak this layer guards against. Release ONLY the pins THIS
    // call took (ADVICE r12: a blanket releaseAudit(label) would also
    // delete a PRE-EXISTING hold under the same label — e.g. when
    // pinBatch throws "already holds batch N, unpinBatch it first" the
    // earlier audit's pins on every artifact — destroying the very
    // hold whose existence caused the failure) and rethrow.
    val takenTables = scala.collection.mutable.ArrayBuffer[String]()
    var takenIndex: Option[String] = None
    def pinTable(dir: String): Long = {
      val resolved = EventStreams.pinBatch(spark, dir, label,
        asOfBatch - 1, expiresAtMillis)
      takenTables += dir
      resolved
    }
    try {
      val seqPins = sequenceTable.toSeq.flatMap { dir =>
        val state = s"$dir/_tokstate"
        Seq(s"sequences-${baseName(dir)}" -> pinTable(dir)) ++
          (if (dirExists(spark, state))
            Seq(s"sequences-state-${baseName(dir)}" -> pinTable(state))
          else Seq.empty)
      }
      val tablePins = keyedTables.map(dir => s"table-${baseName(dir)}" -> pinTable(dir))
      val ragPins = ragIndex.toSeq.map(dir => s"rag-${baseName(dir)}" -> pinTable(dir))
      val provPins = exportProv.toSeq.map(dir => s"export-${baseName(dir)}" -> pinTable(dir))
      val indexPins = ivfPqIndex.toSeq.map { dir =>
        val resolvedSeq = Similarity.pinIndexForAudit(spark, dir, label,
          asOfBatch, expiresAtMillis)
        takenIndex = Some(dir)
        s"ivfpq-${baseName(dir)}" -> resolvedSeq
      }
      (seqPins ++ tablePins ++ ragPins ++ provPins ++ indexPins).toMap
    } catch {
      case e: Exception =>
        try {
          takenTables.foreach(dir => EventStreams.unpinBatch(spark, dir, label))
          takenIndex.foreach(dir => Similarity.unpinIndexForAudit(spark, dir, label))
        } catch { case r: Exception => e.addSuppressed(r) }
        throw e
    }
  }

  /** Release every pin [[pinForAudit]] took under `label`; the next
    * sweep on each artifact (or an explicit
    * EventStreams.vacuumUpsertTable) reclaims the held storage.
    * Idempotent — releasing an absent pin is a no-op.
    */
  def releaseAudit(spark: SparkSession, label: String,
                   sequenceTable: Option[String] = None,
                   keyedTables: Seq[String] = Seq.empty,
                   ragIndex: Option[String] = None,
                   ivfPqIndex: Option[String] = None,
                   exportProv: Option[String] = None): Unit = {
    import graft.streaming.EventStreams
    val tables = sequenceTable.toSeq.flatMap(dir =>
        Seq(dir, s"$dir/_tokstate").filter(d => dirExists(spark, d))) ++
      keyedTables ++ ragIndex.toSeq ++ exportProv.toSeq
    tables.foreach(dir => EventStreams.unpinBatch(spark, dir, label))
    ivfPqIndex.foreach(dir => Similarity.unpinIndexForAudit(spark, dir, label))
  }

  /** PURGE-AFTER-AUDIT (round 15): the one-call composition that
    * PROVES a takedown's content is gone from everything still
    * readable. [[deleteDocs]] removes the docs from every artifact's
    * LATEST snapshot, but — by design, for pinned audits — the
    * pre-delete snapshots stay readable via time travel until
    * retention reclaims them. Once the audit window closes (its pins
    * released), this call, per table-family artifact:
    *
    *   1. refuses (reports red, acts nothing) while ANY pin — audit
    *      hold or feed cursor — still resolves below `purgeBelowBatch`
    *      (sweeping under a live hold is the bug the pin layer
    *      exists to prevent);
    *   2. prunes the manifest chain below the boundary
    *      ([[graft.streaming.EventStreams.compactManifests]], which
    *      itself honors pins) and vacuums unreferenced data files;
    *   3. VERIFIES from committed state: time travel below the cut
    *      refuses, every snapshot still readable yields ZERO
    *      references to the docs, and a change-feed window reaching
    *      below the cut refuses (no consumer can replay the deleted
    *      content out of the feed).
    *
    * Backups are verified, not mutated: every committed backup dir
    * under each named root must hold zero references — a red row
    * names the backup that still does (re-run the backup leg and
    * purge again). The composed ANN index vacuums its superseded
    * artifacts and must serve zero references. The call is
    * IDEMPOTENT: a replay re-verifies and reclaims nothing.
    *
    * `purgeBelowBatch` is the takedown request's `batchId` — the
    * first commit of the post-delete world; everything strictly below
    * it is the pre-delete history being purged. Returns one
    * (artifact, check, ok, n) row per verdict.
    */
  def purgeDocs(spark: SparkSession, docIds: Seq[Long],
                purgeBelowBatch: Long,
                sequenceTable: Option[String] = None,
                keyedTables: Seq[(String, String)] = Seq.empty,
                ragIndex: Option[String] = None,
                ivfPqIndex: Option[String] = None,
                vecIds: Option[Seq[Long]] = None,
                exportProv: Option[String] = None,
                backups: Seq[(String, String)] = Seq.empty): DataFrame = {
    import spark.implicits._
    import graft.streaming.EventStreams
    val boxed = docIds.map(java.lang.Long.valueOf)
    // table-family artifacts with their reference predicates (the
    // auditWith shapes, applied per-snapshot here)
    val arts: Seq[(String, String, DataFrame => DataFrame)] =
      sequenceTable.toSeq.flatMap { dir =>
        val spanRefs = (df: DataFrame) => df.filter(exists(col("doc_spans"),
          s => s.getField("doc_id").isin(boxed: _*)))
        val state = s"$dir/_tokstate"
        Seq((s"sequences-${baseName(dir)}", dir, spanRefs)) ++
          (if (dirExists(spark, state))
            Seq((s"sequences-state-${baseName(dir)}", state, (df: DataFrame) =>
              EventStreams.withColumnDefault(df, "carry_spans",
                expr("cast(array() as array<struct<_1:bigint,_2:bigint,_3:bigint>>)"))
                .filter(exists(col("carry_spans"),
                  s => s.getField("_1").isin(boxed: _*)))))
          else Seq.empty)
      } ++
      keyedTables.map { case (dir, keyCol) =>
        (s"table-${baseName(dir)}", dir,
          (df: DataFrame) => df.filter(col(keyCol).isin(docIds: _*)))
      } ++
      ragIndex.toSeq.map { dir =>
        (s"rag-${baseName(dir)}", dir,
          (df: DataFrame) => df.filter(Rag.docIdOf(col("chunk_key")).isin(docIds: _*)))
      } ++
      exportProv.toSeq.map { dir =>
        (s"export-${baseName(dir)}", dir,
          (df: DataFrame) => df.filter(col("doc_id").isin(docIds: _*)))
      }
    val rows = scala.collection.mutable.ArrayBuffer[(String, String, Boolean, Long)]()
    arts.foreach { case (label, dir, refs) =>
      // 1. live holds below the boundary block the purge for THIS
      // artifact — audit pins and feed cursors alike (a feed consumer
      // whose cursor sits below the cut still needs those windows)
      val holdsBelow = EventStreams.listPins(spark, dir)
        .count(_._2 < purgeBelowBatch)
      rows += ((label, "holds_released", holdsBelow == 0, holdsBelow.toLong))
      var reclaimed = 0L
      if (holdsBelow == 0) {
        // 2. prune history below the boundary, then reclaim files
        val ids = EventStreams.tableHistory(spark, dir)
          .select("batch_id").collect().map(_.getLong(0)).sorted
        // keep the whole POST-delete window (the operator's remaining
        // time-travel history); only the pre-delete world purges
        val keep = math.max(1, ids.count(_ >= purgeBelowBatch))
        EventStreams.compactManifests(spark, dir, keep)
        reclaimed = EventStreams.vacuumUpsertTable(spark, dir, retain = keep).toLong
      }
      rows += ((label, "purge_acted", holdsBelow == 0, reclaimed))
      // 3. verify: below-cut time travel refuses; every snapshot still
      // readable yields zero references; the feed cannot reach below
      val belowRefuses = scala.util.Try(
        EventStreams.readUpsertTableAt(spark, dir, purgeBelowBatch - 1)).isFailure
      rows += ((label, "below_cut_travel_refuses", belowRefuses, 0L))
      val ids = EventStreams.tableHistory(spark, dir)
        .select("batch_id").collect().map(_.getLong(0)).sorted
      // a snapshot that FAILS to read must not count as zero references
      // (ADVICE r15): coercing a transient IO failure to 0 would let a
      // proof-of-deletion report green when verification never ran —
      // failed reads report red under their own check instead
      val reads = ids.map(id => scala.util.Try(
        refs(EventStreams.readUpsertTableAt(spark, dir, id)).count()))
      val unreadable = reads.count(_.isFailure).toLong
      val retainedRefs = reads.collect {
        case scala.util.Success(n) => n }.sum
      rows += ((label, "snapshots_unreadable", unreadable == 0L, unreadable))
      rows += ((label, "retained_snapshots_zero_refs", retainedRefs == 0L,
        retainedRefs))
      val feedRefuses = scala.util.Try(
        EventStreams.readChangeFeed(spark, dir, purgeBelowBatch - 1)).isFailure
      rows += ((label, "pre_delete_feed_window_refuses", feedRefuses, 0L))
    }
    ivfPqIndex.foreach { dir =>
      val label = s"ivfpq-${baseName(dir)}"
      // a live generation pin holds a pre-delete epoch readable
      // (indexedVecIdsBeforePinned can still serve the vecs) — the
      // purge refuses for this artifact exactly like a table hold
      val genPins = Similarity.listGenerationPins(spark, dir).size
      rows += ((label, "holds_released", genPins == 0, genPins.toLong))
      var reclaimed = 0L
      if (genPins == 0)
        reclaimed = Similarity.vacuumIndex(spark, dir, retain = 1).toLong
      rows += ((label, "purge_acted", genPins == 0, reclaimed))
      val refs = Similarity.indexedVecIds(spark, dir)
        .filter(col("vec_id").isin(vecIds.getOrElse(docIds): _*)).count()
      rows += ((label, "serving_zero_refs", refs == 0L, refs))
    }
    backups.foreach { case (rootOrDir, docIdCol) =>
      val label = s"backup-${baseName(rootOrDir)}"
      val root = new org.apache.hadoop.fs.Path(rootOrDir)
      val fs = fsOf(spark, root)
      val dirs =
        if (!fs.exists(root)) Seq.empty
        else if (graft.streaming.EventStreams
          .latestCommittedBatchId(spark, rootOrDir).isDefined) Seq(rootOrDir)
        else fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
          .filter(p => graft.streaming.EventStreams
            .latestCommittedBatchId(spark, p.toString).isDefined)
          .map(p => s"${rootOrDir.stripSuffix("/")}/${p.getName}").toSeq
      val refs = dirs.map(b => graft.streaming.EventStreams
        .readUpsertTable(spark, b)
        .filter(col(docIdCol).isin(docIds: _*)).count()).sum
      rows += ((label, "backups_zero_refs", refs == 0L, refs))
    }
    require(rows.nonEmpty, "purge names no artifacts")
    rows.toSeq.toDF("artifact", "check", "ok", "n")
  }

  private def auditWith(spark: SparkSession, docIds: Seq[Long],
                        sequenceTable: Option[String],
                        keyedTables: Seq[(String, String)],
                        ragIndex: Option[String],
                        ivfPqIndex: Option[String],
                        vecIds: Option[Seq[Long]],
                        exportProv: Option[String],
                        read: String => Option[DataFrame],
                        vecIdsRead: String => DataFrame,
                        keyedRead: (String, String) => Option[DataFrame]): DataFrame = {
    import graft.streaming.EventStreams
    val boxed = docIds.map(java.lang.Long.valueOf)
    // `refs` is None for a COMMITTED-EMPTY artifact (the resolving
    // snapshot exists but holds zero rows — a total takedown): the
    // audit's answer is 0 refs, emitted as a literal row
    def cnt(label: String, refs: Option[DataFrame]): DataFrame = refs match {
      case Some(df) => df.agg(count(lit(1)).cast("long").as("n_refs"))
        .select(lit(label).as("artifact"), col("n_refs"))
      case None => spark.range(1)
        .select(lit(label).as("artifact"), lit(0L).cast("long").as("n_refs"))
    }
    val parts: Seq[DataFrame] =
      sequenceTable.toSeq.flatMap { dir =>
        val tbl = cnt(s"sequences-${baseName(dir)}",
          read(dir).map(_
            .filter(exists(col("doc_spans"),
              s => s.getField("doc_id").isin(boxed: _*)))))
        val stateDir = s"$dir/_tokstate"
        val st =
          if (!dirExists(spark, stateDir)) Seq.empty
          // legacy states pre-date the carry_spans widening — adopt
          // with the empty span list (the Packing read convention), so
          // the OLDEST tables, the ones most likely to harbor missed
          // deletes, stay auditable instead of throwing
          else Seq(cnt(s"sequences-state-${baseName(dir)}",
            read(stateDir).map(df => EventStreams.withColumnDefault(
                df, "carry_spans",
                expr("cast(array() as array<struct<_1:bigint,_2:bigint,_3:bigint>>)"))
              .filter(exists(col("carry_spans"),
                s => s.getField("_1").isin(boxed: _*))))))
        tbl +: st
      } ++
      keyedTables.map { case (dir, keyCol) =>
        cnt(s"table-${baseName(dir)}", keyedRead(dir, keyCol))
      } ++
      ragIndex.toSeq.map { dir =>
        cnt(s"rag-${baseName(dir)}",
          read(dir).map(_.filter(Rag.docIdOf(col("chunk_key")).isin(docIds: _*))))
      } ++
      ivfPqIndex.toSeq.map { dir =>
        cnt(s"ivfpq-${baseName(dir)}",
          Some(vecIdsRead(dir)
            .filter(col("vec_id").isin(vecIds.getOrElse(docIds): _*))))
      } ++
      exportProv.toSeq.map { dir =>
        cnt(s"export-${baseName(dir)}",
          read(dir).map(_.filter(col("doc_id").isin(docIds: _*))))
      }
    require(parts.nonEmpty, "audit names no artifacts")
    parts.reduce(_.unionByName(_))
  }

  private val completeToken = "_complete"

  private def baseName(dir: String): String =
    new org.apache.hadoop.fs.Path(dir).getName

  private def batchDir(ledgerDir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(ledgerDir, s"batch=$batchId")

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dirExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    fsOf(spark, p).exists(p)
  }

  private def tokenExists(spark: SparkSession, ledgerDir: String,
                          batchId: Long, label: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(batchDir(ledgerDir, batchId),
      s"$label.done")
    fsOf(spark, p).exists(p)
  }

  /** Token commit: create-and-close of one empty file (the rename-free
    * degenerate of the manifest protocol — an empty file either exists
    * or does not; there is no half-written state to observe).
    */
  private def writeToken(spark: SparkSession, ledgerDir: String,
                         batchId: Long, label: String): Unit = {
    val dir = batchDir(ledgerDir, batchId)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    fs.create(new org.apache.hadoop.fs.Path(dir, s"$label.done"), true).close()
  }

  private def listTokens(spark: SparkSession, ledgerDir: String,
                         batchId: Long): Seq[String] = {
    val dir = batchDir(ledgerDir, batchId)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".done"))
      .map(_.getPath.getName.stripSuffix(".done")).toSeq
  }
}
