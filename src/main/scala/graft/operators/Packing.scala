package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Texts

/** Training-sequence PACKING — the step between a curated corpus and a
  * training run: documents are concatenated (one separator token after
  * each, the EOS convention) into one global token stream in a fixed
  * deterministic order, and the stream is chunked into fixed-length
  * sequences of `seqLen` tokens ("concat-and-chunk", the packing used
  * by the GPT-2/3 and Llama pre-training recipes; the reference
  * pipeline has no analog — this is part of the LLM-pipeline surface,
  * like `Sampling`/`Curation`).
  *
  * The crux at scale is the global token OFFSET of every document — a
  * prefix sum over the corpus in doc order. A window
  * `SUM(cost) OVER (ORDER BY doc_id)` funnels the whole corpus through
  * ONE task; instead the offsets come from
  * [[TimeOps.runningTotalDistributed]]'s two-job pattern (range
  * partition by doc_id, per-partition sums — one Long each — collected
  * and re-broadcast as partition offsets). Everything that shuffles is
  * three Longs per document (doc_id, start, end); the text column dies
  * at the scan after the token count is projected. The per-sequence
  * fan-out is `ceil(n_tokens / seqLen) + 1` rows per doc — bounded,
  * and tiny for any realistic seqLen.
  */
object Packing {

  /** Pack the corpus and report per-SEQUENCE occupancy: how many docs
    * touch the sequence, how many of its slots hold document tokens
    * (the rest are separators), and how many of its docs cross one of
    * its boundaries (the "split document" cost concat-and-chunk pays
    * vs padding-based packing). Order: doc_id ascending; docs with no
    * tokens are dropped before packing (they would contribute a bare
    * separator).
    *
    * Output: (seq_id, n_docs, doc_tokens, n_split_docs), one row per
    * sequence touched by at least one document token.
    */
  def packSequences(documents: DataFrame, seqLen: Int,
                    nParts: Int = 8): DataFrame =
    packSequencesByCount(
      documents.select(col("doc_id"),
        Texts.tokenCount(col("text")).cast("long").as("n_tokens")),
      seqLen, nParts)

  /** [[packSequences]] over CALLER-SUPPLIED token counts — the seam
    * that lets packing compose with any tokenizer: production packing
    * lays out LEARNED-tokenizer tokens (BPE subwords, q146), not
    * whitespace words, and the packer only ever needed the per-doc
    * count. Input: (doc_id, n_tokens); docs with n_tokens <= 0 drop.
    */
  def packSequencesByCount(counts: DataFrame, seqLen: Int,
                           nParts: Int = 8): DataFrame = {
    require(seqLen > 1, s"seqLen must be > 1, got $seqLen")
    val costs = counts
      .select(col("doc_id"), col("n_tokens").cast("long").as("nt"))
      .filter(col("nt") > 0)
      // +1: the separator token written after every document
      .select(col("doc_id"), (col("nt") + lit(1L)).as("cost"))
    val ends = TimeOps.runningTotalDistributed(costs, "doc_id", "cost", nParts, "fin")
    val L = lit(seqLen.toLong)
    // the doc's own tokens span [st, et); its separator sits at et
    ends
      .select(col("doc_id"),
        (col("fin") - col("cost")).as("st"),
        (col("fin") - lit(1L)).as("et"))
      .withColumn("seq_id",
        explode(sequence(expr(s"st div $seqLen"), expr(s"(et - 1) div $seqLen"))))
      .withColumn("ov",
        least(col("et"), (col("seq_id") + lit(1L)) * L) -
          greatest(col("st"), col("seq_id") * L))
      .withColumn("crosses",
        (col("st") < col("seq_id") * L ||
          col("et") > (col("seq_id") + lit(1L)) * L).cast("long"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ov")).as("doc_tokens"),
        sum(col("crosses")).as("n_split_docs"))
  }

  /** INCREMENTAL packing — the streaming twin of [[packSequences]]
    * (the CurationStream convention, applied to the final mile): each
    * arriving shard extends the packed-sequence table WITHOUT
    * re-reading any previous shard's text. Cross-shard state is two
    * manifest-committed tables:
    *   - the sequence table itself (keyed by seq_id) — the boundary
    *     sequence the previous shard left half-filled is read back
    *     (ONE row), this shard's contribution folded in additively
    *     (n_docs / doc_tokens / n_split_docs are all sums over docs,
    *     and a doc's crossing flags depend only on its own global
    *     offsets), and the merged row upserted;
    *   - a one-row `_packstate` cursor carrying the global token total,
    *     which offsets this shard's distributed prefix sum.
    * Reads are AS OF the previous batch and both commits share the
    * batchId (the curateShard replay rule): a crash between the two
    * commits replays into identical decisions, the committed half
    * no-ops, exactly-once for the pair. CONTRACT: shards arrive in
    * ascending doc_id order (the stream watermark's contract — ids
    * below anything processed would change earlier offsets). The
    * contract is ENFORCED, not assumed (the CurationStream.curateShard
    * convention): the `_packstate` cursor also carries the max doc_id
    * ever packed, and a shard at or below it fails fast instead of
    * silently committing offsets that diverge from batch semantics.
    * The cursor commits LAST (after the sequence-table commit), so a
    * failed shard resubmitted under a new batchId is not falsely
    * rejected. PackingSpec proves N incremental passes produce the
    * exact batch table.
    */
  def packShardIncremental(shard: DataFrame, tableDir: String, seqLen: Int,
                           batchId: Long, nParts: Int = 8): Unit = {
    require(seqLen > 1, s"seqLen must be > 1, got $seqLen")
    val spark = shard.sparkSession
    import spark.implicits._
    import graft.streaming.EventStreams
    val stateDir = s"$tableDir/_packstate"
    // read AS OF the previous batch (the curateShard replay rule): on
    // crash-replay of batch N the cursor may already hold N's commit
    val prevState = EventStreams
      .readUpsertTableBefore(spark, stateDir, batchId)
      .map(_.agg(max(col("total_tokens")), max(col("max_doc_id"))).head())
    val prevTotal: Long = prevState.map(_.getLong(0)).getOrElse(0L)
    val prevMaxDoc: Long = prevState.map(_.getLong(1)).getOrElse(Long.MinValue)
    val bounds = shard.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val shardMaxDoc: Long =
      if (bounds.isNullAt(0)) prevMaxDoc else bounds.getLong(1)
    if (!bounds.isNullAt(0) && bounds.getLong(0) <= prevMaxDoc)
      throw new IllegalStateException(
        s"out-of-order shard arrival: batch $batchId carries doc_id " +
          s"${bounds.getLong(0)} <= watermark $prevMaxDoc (max doc_id already " +
          "packed). Incremental packing is batch-equivalent only under " +
          "ascending doc_id arrival (global token offsets are prefix sums in " +
          "doc_id order); re-shard the backfill above the watermark or re-run " +
          "batch packing. A same-batchId replay of a crashed shard is safe " +
          "(reads are as-of the previous batch).")
    val costs = shard
      .select(col("doc_id"), Texts.tokenCount(col("text")).cast("long").as("nt"))
      .filter(col("nt") > 0)
      .select(col("doc_id"), (col("nt") + lit(1L)).as("cost"))
    val ends = TimeOps.runningTotalDistributed(costs, "doc_id", "cost", nParts, "fin")
      .withColumn("fin", col("fin") + lit(prevTotal))
    val L = lit(seqLen.toLong)
    val seqRows = ends
      .select(col("doc_id"),
        (col("fin") - col("cost")).as("st"), (col("fin") - lit(1L)).as("et"))
      .withColumn("seq_id",
        explode(sequence(expr(s"st div $seqLen"), expr(s"(et - 1) div $seqLen"))))
      .withColumn("ov",
        least(col("et"), (col("seq_id") + lit(1L)) * L) -
          greatest(col("st"), col("seq_id") * L))
      .withColumn("crosses",
        (col("st") < col("seq_id") * L ||
          col("et") > (col("seq_id") + lit(1L)) * L).cast("long"))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ov")).as("doc_tokens"),
        sum(col("crosses")).as("n_split_docs"))
    // the previous shard's half-filled boundary sequence (0 or 1 row):
    // its stats add to this shard's contribution for the same seq_id
    val boundarySeq = prevTotal / seqLen
    val combined = EventStreams.readUpsertTableBefore(spark, tableDir, batchId) match {
      case Some(t) =>
        seqRows.unionByName(
            t.filter(col("seq_id") === boundarySeq)
              .select(col("seq_id"), col("n_docs"), col("doc_tokens"),
                col("n_split_docs")))
          .groupBy(col("seq_id"))
          .agg(sum(col("n_docs")).as("n_docs"),
            sum(col("doc_tokens")).as("doc_tokens"),
            sum(col("n_split_docs")).as("n_split_docs"))
      case None => seqRows
    }
    // materialize BEFORE the commits (the curateShard rule): the plan
    // reads the prior table generation, whose superseded files the
    // merge below sweeps
    val out = combined.withColumn("__v", lit(batchId)).localCheckpoint()
    val shardCost = costs.agg(coalesce(sum(col("cost")), lit(0L))).head().getLong(0)
    EventStreams.mergeBatchIntoTable(out, tableDir,
      Seq("seq_id"), "__v", nBuckets = 8, batchId = batchId, retain = 2)
    // state row versioned by batchId (monotone per commit), NOT by
    // total_tokens: a non-empty shard whose docs all tokenize empty
    // leaves the total unchanged, and equal versions would tie
    // nondeterministically in the merge's max_by — the watermark
    // advance must not depend on the tie-break
    EventStreams.mergeBatchIntoTable(
      Seq((0, prevTotal + shardCost, shardMaxDoc, batchId))
        .toDF("k", "total_tokens", "max_doc_id", "__v"), stateDir,
      Seq("k"), "__v", nBuckets = 1, batchId = batchId, retain = 2)
  }

  /** MATERIALIZED concat-and-chunk — [[packSequencesByCount]] reports
    * per-sequence accounting; this builds the sequences THEMSELVES: the
    * actual fixed-length `array<int>` token rows a trainer consumes
    * (the .bin/.idx analog, one row per sequence instead of a byte
    * blob, so the artifact stays a queryable, committable table).
    * Input: (doc_id, toks array<int>) — token IDS, from any tokenizer
    * (production: BPE-encode under a learned vocab). Layout: docs
    * concatenate in doc_id order, `sepId` written after every doc (the
    * EOS convention, same +1 cost [[packSequencesByCount]] accounts),
    * and the stream chunks into sequences of exactly `seqLen`; the
    * trailing partial sequence is DROPPED (the floor(total/L) samples a
    * trainer actually draws — a short tail row would need padding
    * semantics downstream).
    *
    * Scale shape — tokens move, but never one-row-per-token: offsets
    * come from the narrow two-job prefix sum (three Longs per doc);
    * the token arrays join the offsets once on doc_id (uniform key);
    * the only explode is over the SEQUENCES a doc touches
    * (`ceil(nt/L)+1` rows per doc), each row carrying an array SLICE
    * (≤ L ints); and each sequence reassembles from its ≤ few slices
    * by sorting on the slice's global start — a bounded per-group
    * array_sort, not a window. Shuffle row count is
    * O(total_tokens / seqLen + n_docs), payload O(total_tokens) —
    * the minimum any materialization pays. PlanSpec guards the
    * single-Generate shape.
    *
    * Trainer-facing metadata (both opt-in, zero cost when off):
    *   - `withSpans = true` adds `doc_spans: array<struct<doc_id,
    *     start, len>>` per sequence — each document's contiguous
    *     region (within-sequence 0-based `start`, `len` including the
    *     doc's separator when it lands in this sequence), sorted by
    *     start. This is the attention-reset metadata every
    *     concat-and-chunk consumer needs (a trainer masks attention
    *     across span boundaries); the spans ride the pieces the layout
    *     already computes — no extra shuffle, no extra scan.
    *   - `padId = Some(p)` KEEPS the trailing partial sequence, padded
    *     with `p` to exactly `seqLen` (the padded-mode export some
    *     pipelines run instead of dropping the tail); its doc_spans
    *     cover only the real tokens. Default None preserves the
    *     drop-the-tail contract.
    */
  def materializeTokenSequences(docTokens: DataFrame, seqLen: Int, sepId: Int,
                                nParts: Int = 8, withSpans: Boolean = false,
                                padId: Option[Int] = None): DataFrame = {
    require(seqLen > 1, s"seqLen must be > 1, got $seqLen")
    val toks = docTokens
      .select(col("doc_id"), col("toks"))
      .filter(size(col("toks")) > 0)
    val costs = toks.select(col("doc_id"),
      (size(col("toks")).cast("long") + lit(1L)).as("cost"))
    val ends = TimeOps.runningTotalDistributed(costs, "doc_id", "cost", nParts, "fin")
    val assembled = assembleSequences(
      tokenPieces(ends, toks, seqLen, sepId))
    val full = padId match {
      case Some(p) => assembled.withColumn("tokens",
        concat(col("tokens"), array_repeat(lit(p),
          (lit(seqLen) - size(col("tokens"))).cast("int"))))
      case None => assembled.filter(size(col("tokens")) === seqLen)
    }
    if (withSpans) full else full.drop("doc_spans")
  }

  /** The per-(sequence, document) piece projection shared by the batch
    * and incremental materializers: one bounded Generate over the
    * sequences a doc touches, each row carrying the doc's array SLICE
    * for that sequence (plus its separator when it lands there) and the
    * piece's span struct (doc_id, within-seq start, len).
    */
  private def tokenPieces(ends: DataFrame, toks: DataFrame, seqLen: Int,
                          sepId: Int): DataFrame = {
    val L = lit(seqLen.toLong)
    val empty = array().cast("array<int>")
    ends
      .select(col("doc_id"),
        (col("fin") - col("cost")).as("st"), (col("fin") - lit(1L)).as("et"))
      .join(toks, Seq("doc_id"))
      // et div L (not (et-1) div L as in the accounting variant): the
      // separator position et belongs to the layout here
      .withColumn("seq_id",
        explode(sequence(expr(s"st div $seqLen"), expr(s"(et) div $seqLen"))))
      .withColumn("lo", greatest(col("st"), col("seq_id") * L))
      .withColumn("hi", least(col("et"), (col("seq_id") + lit(1L)) * L))
      .withColumn("piece",
        concat(
          when(col("hi") > col("lo"),
            slice(col("toks"), (col("lo") - col("st") + 1L).cast("int"),
              (col("hi") - col("lo")).cast("int"))).otherwise(empty),
          when(col("et") >= col("seq_id") * L &&
              col("et") < (col("seq_id") + lit(1L)) * L,
            array(lit(sepId))).otherwise(empty)))
      .select(col("seq_id"), col("lo"), col("piece"),
        array(struct(col("doc_id"),
          (col("lo") - col("seq_id") * L).as("start"),
          size(col("piece")).cast("long").as("len"))).as("spans"))
  }

  /** Reassemble (seq_id, tokens, doc_spans) from piece rows: ONE
    * array_sort of the collected (lo, piece, spans) structs orders both
    * the token stream and the span list (pieces are disjoint, so lo is
    * a total order within a sequence). `spans` is an ARRAY per piece —
    * single-element for regular pieces, the full saved list for an
    * incremental carry piece — flattened in collection order.
    */
  private def assembleSequences(pieces: DataFrame): DataFrame =
    pieces.groupBy(col("seq_id"))
      .agg(array_sort(collect_list(struct(col("lo"), col("piece"), col("spans"))))
        .as("ps"))
      .select(col("seq_id"),
        flatten(transform(col("ps"), x => x.getField("piece"))).as("tokens"),
        flatten(transform(col("ps"), x => x.getField("spans"))).as("doc_spans"))

  /** INCREMENTAL token materialization — [[packShardIncremental]]'s
    * token-granular twin: each arriving shard of (doc_id, toks) id
    * streams EXTENDS the committed fixed-length sequence table
    * ([[materializeTokenSequences]]'s layout) without re-reading any
    * previous shard's tokens. Cross-shard state is ONE committed row
    * (`_tokstate`): the global token total, the arrival watermark, and
    * the CARRY — the (< seqLen) token ids of the half-filled trailing
    * sequence, which the next shard completes. Only FULL sequences
    * ever land in the table, each committed exactly once (a sequence
    * completes in exactly one shard pass), so the table needs no
    * cross-shard upsert semantics beyond replay idempotency.
    *
    * The tokenizer MUST be frozen across shards (encode under the
    * committed artifact, [[Models.buildTokenizer]]) — a per-shard
    * retrain would change ids mid-stream and silently corrupt the
    * layout; that contract lives with the caller because this operator
    * is tokenizer-agnostic by design (it sees ids only).
    *
    * Replay/ordering contracts are [[packShardIncremental]]'s: reads
    * AS OF the previous batch, state commits LAST, ascending-doc_id
    * arrival ENFORCED against the committed watermark (token offsets
    * are prefix sums in doc_id order). PackingSpec proves N shard
    * passes (including an empty one) produce exactly the batch
    * [[materializeTokenSequences]] table.
    *
    * The committed table carries the batch materializer's `doc_spans`
    * metadata too: the carry row stores the partial trailing sequence's
    * spans alongside its tokens (both bounded by seqLen), so a sequence
    * completed across a shard boundary lands with exactly the spans the
    * batch layout would give it (PackingSpec proves span equality).
    */
  def materializeShardIncremental(shard: DataFrame, tableDir: String,
                                  seqLen: Int, sepId: Int, batchId: Long,
                                  nParts: Int = 8): Unit = {
    require(seqLen > 1, s"seqLen must be > 1, got $seqLen")
    val spark = shard.sparkSession
    import spark.implicits._
    import graft.streaming.EventStreams
    val stateDir = s"$tableDir/_tokstate"
    val prevState = EventStreams
      .readUpsertTableBefore(spark, stateDir, batchId)
      // carry_spans post-dates early state tables: adopt with an empty
      // span list (the schema-adoption convention; a pre-widening carry
      // genuinely had no tracked spans)
      .map(df => EventStreams.withColumnDefault(df, "carry_spans",
          expr("cast(array() as array<struct<_1:bigint,_2:bigint,_3:bigint>>)"))
        .select(col("total_tokens"), col("max_doc_id"), col("carry"),
          col("carry_spans")).head())
    val prevTotal: Long = prevState.map(_.getLong(0)).getOrElse(0L)
    val prevMaxDoc: Long = prevState.map(_.getLong(1)).getOrElse(Long.MinValue)
    val carry: Seq[Int] = prevState.map(_.getSeq[Int](2)).getOrElse(Seq.empty)
    val carrySpans: Seq[(Long, Long, Long)] = prevState
      .map(_.getSeq[org.apache.spark.sql.Row](3)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
      .getOrElse(Seq.empty)
    val bounds = shard.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val shardMaxDoc: Long =
      if (bounds.isNullAt(0)) prevMaxDoc else bounds.getLong(1)
    if (!bounds.isNullAt(0) && bounds.getLong(0) <= prevMaxDoc)
      throw new IllegalStateException(
        s"out-of-order shard arrival: batch $batchId carries doc_id " +
          s"${bounds.getLong(0)} <= watermark $prevMaxDoc (max doc_id already " +
          "materialized). Incremental token materialization is " +
          "batch-equivalent only under ascending doc_id arrival; re-shard " +
          "the backfill above the watermark or re-run the batch " +
          "materializer. A same-batchId replay of a crashed shard is safe " +
          "(reads are as-of the previous batch).")
    val toks = shard.select(col("doc_id"), col("toks"))
      .filter(size(col("toks")) > 0)
    // barrier: costs feeds the prefix sum AND the shardCost aggregate —
    // without it the shard's tokenization lineage evaluates per consumer
    val costs = toks.select(col("doc_id"),
      (size(col("toks")).cast("long") + lit(1L)).as("cost"))
      .localCheckpoint()
    val ends = TimeOps.runningTotalDistributed(costs, "doc_id", "cost", nParts, "fin")
      .withColumn("fin", col("fin") + lit(prevTotal))
    val pieces = tokenPieces(ends, toks, seqLen, sepId)
    // the previous shard's half-filled trailing sequence joins as one
    // more piece (tokens AND spans) at the boundary sequence's base
    val withCarry =
      if (carry.isEmpty) pieces
      else pieces.unionByName(
        Seq((prevTotal / seqLen, (prevTotal / seqLen) * seqLen, carry, carrySpans))
          .toDF("seq_id", "lo", "piece", "sp0")
          .select(col("seq_id"), col("lo"), col("piece"),
            expr("transform(sp0, s -> named_struct(" +
              "'doc_id', s._1, 'start', s._2, 'len', s._3))").as("spans")))
    // materialize BEFORE the commits (the packShardIncremental rule):
    // two consumers below (full-sequence merge + new-carry extraction),
    // and the plan must not read files the merge sweeps
    val seqsAll = assembleSequences(withCarry).localCheckpoint()
    val shardCost = costs.agg(coalesce(sum(col("cost")), lit(0L))).head().getLong(0)
    val newTotal = prevTotal + shardCost
    // the new trailing partial (< seqLen ids + its spans — a bounded
    // driver-side artifact, like the cut tables): absent when the
    // stream lands exactly on a boundary
    val (newCarry, newCarrySpans): (Seq[Int], Seq[(Long, Long, Long)]) =
      if (newTotal % seqLen == 0) (Seq.empty, Seq.empty)
      else seqsAll.filter(col("seq_id") === newTotal / seqLen)
        .select(col("tokens"), col("doc_spans")).collect()
        .headOption.map { r =>
          (r.getSeq[Int](0).toSeq,
            r.getSeq[org.apache.spark.sql.Row](1)
              .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).toSeq)
        }.getOrElse((Seq.empty, Seq.empty))
    EventStreams.mergeBatchIntoTable(
      seqsAll.filter(size(col("tokens")) === seqLen)
        .select(col("seq_id"), col("tokens"), col("doc_spans")),
      tableDir, Seq("seq_id"), "seq_id", nBuckets = 8, batchId = batchId,
      retain = 2)
    // versioned by batchId, not total_tokens (see packShardIncremental:
    // an all-empty-toks shard must still advance the watermark
    // deterministically)
    EventStreams.mergeBatchIntoTable(
      Seq((0, newTotal, shardMaxDoc, newCarry, newCarrySpans, batchId))
        .toDF("k", "total_tokens", "max_doc_id", "carry", "carry_spans", "__v"),
      stateDir,
      Seq("k"), "__v", nBuckets = 1, batchId = batchId, retain = 2)
  }

  /** TAKEDOWN propagation through the committed sequence table — the
    * deletion path a right-to-be-forgotten request walks: remove a doc
    * set from the [[materializeShardIncremental]] artifact so the table
    * equals a FROM-SCRATCH build over the retained corpus (PackingSpec
    * proves the equality; q177 proves it through the correctness gate),
    * WITHOUT re-laying the whole stream.
    *
    * The cut-point argument: token offsets are prefix sums in doc_id
    * order, so every position before the FIRST deleted doc's start is
    * identical in the retained layout. With `cutSeq = firstDelStart div
    * L`, sequences below cutSeq are untouched (they hold only positions
    * < cutSeq·L <= firstDelStart); everything from cutSeq on is
    * re-derived from the retained docs whose retained interval reaches
    * cutSeq·L — docs wholly before the cut are never re-read, so the
    * work is O(corpus after the first deletion), the minimum any
    * offset-preserving layout pays (counts for the prefix sum are still
    * one narrow pass over per-doc lengths).
    *
    * Commit protocol: the stale suffix (seq ids cutSeq..oldTotal/L)
    * deletes under `batchId`, the rebuilt suffix + state commit under
    * `batchId + 1` — both idempotent, nothing reads the table being
    * rewritten (everything derives from `corpusToks`), so a crash
    * anywhere replays to the same result. As with every multi-commit
    * operation here (the curateShard pair rule), a CRASHED takedown
    * must be replayed to completion BEFORE new shards append: an
    * append between the crash and the replay would read the
    * not-yet-updated state row and extend the pre-delete layout. The state keeps the OLD
    * arrival watermark (deletion must not re-open doc_id room below
    * already-packed history) and versions by batchId. The tokenizer
    * stays frozen — deletion never retrains (retraining would
    * re-interpret every surviving sequence).
    *
    * `corpusToks` is the SAME (doc_id, toks) stream that built the
    * table — the ORIGINAL, UNFILTERED asset (production keeps it
    * committed): a replay of a crashed takedown must pass it
    * unchanged, because a pre-filtered stream (deleted docs already
    * absent) makes the request resolve to "nothing to delete" and the
    * replay completes as an empty state generation instead of
    * applying the cut. Ids absent from the corpus are no-ops that
    * still advance the state ledger to batchId+1 (so the no-op and
    * applied paths agree on "later appends use ids above batchId+1").
    * Consumes batchId AND batchId+1.
    */
  def deleteDocsFromSequences(corpusToks: DataFrame, deletedIds: Seq[Long],
                              tableDir: String, seqLen: Int, sepId: Int,
                              batchId: Long, nParts: Int = 8): Unit = {
    require(seqLen > 1, s"seqLen must be > 1, got $seqLen")
    val spark = corpusToks.sparkSession
    import spark.implicits._
    import graft.streaming.EventStreams
    val stateDir = s"$tableDir/_tokstate"
    val prevState = EventStreams
      .readUpsertTableBefore(spark, stateDir, batchId)
      // carry_spans post-dates early state tables: adopt with an empty
      // span list (the schema-adoption convention; a pre-widening carry
      // genuinely had no tracked spans)
      .map(df => EventStreams.withColumnDefault(df, "carry_spans",
          expr("cast(array() as array<struct<_1:bigint,_2:bigint,_3:bigint>>)"))
        .select(col("total_tokens"), col("max_doc_id"), col("carry"),
          col("carry_spans")).head())
    val prevTotal: Long = prevState.map(_.getLong(0)).getOrElse(0L)
    val prevMaxDoc: Long = prevState.map(_.getLong(1)).getOrElse(Long.MinValue)
    val toksAll = corpusToks.select(col("doc_id"), col("toks"))
      .filter(size(col("toks")) > 0)
    // barrier: the cost frame feeds BOTH prefix sums (original +
    // retained) and the retained-total aggregate — two Longs per doc,
    // materialized once, versus re-tokenizing the corpus per consumer
    val costsAll = toksAll.select(col("doc_id"),
      (size(col("toks")).cast("long") + lit(1L)).as("cost"))
      .localCheckpoint()
    // ORIGINAL offsets locate the cut: the first deleted doc's start
    val origEnds = TimeOps.runningTotalDistributed(
      costsAll, "doc_id", "cost", nParts, "fin")
    val delStarts = origEnds.filter(col("doc_id").isin(deletedIds: _*))
      .agg(min(col("fin") - col("cost"))).head()
    if (delStarts.isNullAt(0)) {
      // no deleted doc in the corpus: nothing moves, but the batch-id
      // ledger must still match the applied path (ADVICE r10) — a
      // crashed takedown replayed against an already-filtered corpus
      // stream lands here, and a bare return would leave the delete
      // half-applied-looking forever (state stuck below batchId + 1
      // while appends are told to start above it). Re-commit the
      // UNCHANGED state as an empty generation under batchId + 1 so
      // the replay completes; a table with no committed state at all
      // has nothing half-applied and stays a pure no-op.
      prevState.foreach { s =>
        val carry = s.getSeq[Int](2).toSeq
        val carrySpans = s.getSeq[org.apache.spark.sql.Row](3)
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        EventStreams.mergeBatchIntoTable(
          Seq((0, prevTotal, prevMaxDoc, carry, carrySpans, batchId + 1))
            .toDF("k", "total_tokens", "max_doc_id", "carry", "carry_spans",
              "__v"),
          stateDir,
          Seq("k"), "__v", nBuckets = 1, batchId = batchId + 1, retain = 2)
      }
      return
    }
    val cutSeq = delStarts.getLong(0) / seqLen
    val cutPos = cutSeq * seqLen
    // RETAINED layout: prefix sums over the surviving docs; only docs
    // whose retained interval reaches the cut are re-laid
    val retainedCosts = costsAll.filter(!col("doc_id").isin(deletedIds: _*))
    val retEnds = TimeOps.runningTotalDistributed(
      retainedCosts, "doc_id", "cost", nParts, "fin")
    val suffixEnds = retEnds.filter(col("fin") > cutPos)
    val pieces = tokenPieces(suffixEnds, toksAll, seqLen, sepId)
      .filter(col("seq_id") >= cutSeq)
    val seqsAll = assembleSequences(pieces).localCheckpoint()
    val newTotal = retainedCosts.agg(coalesce(sum(col("cost")), lit(0L)))
      .head().getLong(0)
    val (newCarry, newCarrySpans): (Seq[Int], Seq[(Long, Long, Long)]) =
      if (newTotal % seqLen == 0) (Seq.empty, Seq.empty)
      else seqsAll.filter(col("seq_id") === newTotal / seqLen)
        .select(col("tokens"), col("doc_spans")).collect()
        .headOption.map { r =>
          (r.getSeq[Int](0).toSeq,
            r.getSeq[org.apache.spark.sql.Row](1)
              .map(s => (s.getLong(0), s.getLong(1), s.getLong(2))).toSeq)
        }.getOrElse((Seq.empty, Seq.empty))
    // (1) drop the stale suffix: every sequence id the OLD layout held
    // from the cut on (bounded range frame, never collected)
    EventStreams.deleteFromTable(spark, tableDir,
      spark.range(cutSeq, prevTotal / seqLen + 1).select(col("id").as("seq_id")),
      Seq("seq_id"), nBuckets = 8, batchId = batchId, retain = 2)
    // (2) land the rebuilt suffix; (3) state LAST (the curateShard rule).
    // retain = 3 on the merge half: the request spans manifests
    // (pre, delete, merge) — retaining all three keeps the PRE-request
    // snapshot readable after the pair completes, which is what lets
    // Takedown.auditDocsAt pin an audit at this request's batchId (the
    // audit-window contract; retain = 2 would sweep the pre snapshot
    // the moment the merge commits)
    EventStreams.mergeBatchIntoTable(
      seqsAll.filter(size(col("tokens")) === seqLen)
        .select(col("seq_id"), col("tokens"), col("doc_spans")),
      tableDir, Seq("seq_id"), "seq_id", nBuckets = 8, batchId = batchId + 1,
      retain = 3)
    EventStreams.mergeBatchIntoTable(
      Seq((0, newTotal, prevMaxDoc, newCarry, newCarrySpans, batchId + 1))
        .toDF("k", "total_tokens", "max_doc_id", "carry", "carry_spans", "__v"),
      stateDir,
      Seq("k"), "__v", nBuckets = 1, batchId = batchId + 1, retain = 2)
  }

  /** Deterministic training-order SHUFFLE + shard assignment — the step
    * after packing in every pre-training export: sequences are laid out
    * in a pseudo-random but fully reproducible global order (so a
    * training run reading shard files front to back sees a shuffled
    * corpus), then chunked into contiguous shards of `seqsPerShard`
    * sequences each.
    *
    * The shuffle key is the portable md5 draw
    * [[Sampling.portableUnit]](seq_id, "tshuffle") — any engine
    * re-derives the exact order; `seq_id` breaks the (measure-zero)
    * ties so the order is total. The global RANK over that key is
    * [[Sampling.denseGlobalIndex]]'s range-partition + zipWithIndex
    * two-job pattern — never a one-task `row_number()` window: what
    * shuffles is the (seq_id, stats, u) row, once, into range
    * partitions, and ranks are exact whatever the sampled partition
    * boundaries because range partitions are themselves globally
    * ordered. `shard_id = rank div seqsPerShard` keeps shards
    * contiguous in shuffle order — the property that lets a trainer
    * stream shard k, then k+1, and still see the globally shuffled
    * order.
    *
    * Output: the input columns + (u, rank, shard_id).
    */
  def trainingShards(seqs: DataFrame, seqsPerShard: Int,
                     nParts: Int = 8): DataFrame = {
    require(seqsPerShard > 0, s"seqsPerShard must be > 0, got $seqsPerShard")
    val withU = seqs.withColumn("u",
      Sampling.portableUnit(col("seq_id"), "tshuffle"))
    Sampling.denseGlobalIndex(withU, "rank",
        Seq(col("u"), col("seq_id")), nParts)
      .withColumn("shard_id", expr(s"rank div $seqsPerShard"))
  }

  // --------------------------------------------------------------------
  // Shard-file export + provenance-driven selective re-export
  // --------------------------------------------------------------------

  /** Materialize the committed sharded sequence table as TRAINING SHARD
    * FILES: one `shard_id=<id>/` dir per shard, one parquet file each,
    * rows sorted by rank inside the file — the artifact a trainer
    * streams front to back. One shuffle (hash on shard_id — every
    * shard's rows gather in exactly one task), one partitioned write;
    * never a per-shard driver loop of jobs.
    */
  def exportShardFiles(spark: org.apache.spark.sql.SparkSession,
                       shardTableDir: String, exportDir: String): Unit =
    graft.streaming.EventStreams.readUpsertTable(spark, shardTableDir)
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("rank"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(exportDir)

  /** The first sequence a takedown's re-lay touches, read off the
    * PROVENANCE manifest: the deleted docs' earliest span sits in
    * exactly the cut sequence (`cutSeq = firstDelStart div L`, and the
    * first span's start IS firstDelStart), so `min(seq_id)` over the
    * deleted docs' provenance rows equals the cut point — no layout
    * re-derivation, one pushed keyed lookup (the q182 read). None when
    * no committed region references the docs.
    */
  def firstTouchedSeq(spark: org.apache.spark.sql.SparkSession,
                      provDir: String, deletedIds: Seq[Long]): Option[Long] = {
    val r = graft.streaming.EventStreams.readUpsertTable(spark, provDir)
      .filter(col("doc_id").isin(deletedIds: _*))
      .agg(min(col("seq_id"))).head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** PROVENANCE-DRIVEN SELECTIVE RE-EXPORT — the remediation step after
    * a sequence-table takedown ([[deleteDocsFromSequences]]), which
    * re-lays every sequence from the cut point on: the exported shard
    * files holding any re-laid sequence are stale, but re-materializing
    * the WHOLE export re-writes (and re-uploads, at 100 TB) mostly
    * unchanged bytes. This rewrites EXACTLY the touched shards:
    *
    *   - the TOUCHED set is `distinct shard_id` of provenance rows with
    *     `seq_id >= fromSeq` (use [[firstTouchedSeq]] for `fromSeq`) —
    *     the pre-takedown lineage still names every shard whose member
    *     sequences the re-lay moved OR removed; committed as a tiny
    *     `.reexport-<batchId>.json` manifest FIRST, so a crash after
    *     the provenance update cannot lose the set (replays load it
    *     instead of recomputing);
    *   - the shard MAP is FROZEN: surviving sequences keep their
    *     committed (rank, shard_id) — re-running [[trainingShards]]
    *     over the shrunken id set would re-rank the entire corpus and
    *     touch every shard, defeating selectivity (vanished tail
    *     sequences leave short shards, the standard tombstone trade);
    *   - the sharded table and the provenance manifest update under the
    *     batchId window (stale region deleted at `batchId`, refreshed
    *     rows merged at `batchId + 1` — the [[deleteDocsFromSequences]]
    *     commit pair), then ONLY the touched `shard_id=` dirs re-stage
    *     and swap by rename; untouched shard dirs are never opened, so
    *     their files stay BYTE-identical (PackingSpec asserts content
    *     hashes).
    *
    * `updatedSeqs` is the post-takedown sequence table read
    * (seq_id, tokens, doc_spans). Every commit is idempotent, so a
    * crash anywhere replays to completion with the same arguments;
    * as with every multi-commit operation here, replay a crashed
    * re-export before trusting the export. Returns the touched shard
    * ids (bounded by the shard count — the per-dir swap is a driver
    * FS loop over exactly those dirs). `nBuckets` MUST match the
    * bucket count the shard table and provenance were committed with —
    * delete keys hash under this modulus, so a mismatch leaves stale
    * rows alive in the unmatched buckets while refreshed rows merge
    * elsewhere, silently duplicating seq_ids.
    */
  def reexportShards(updatedSeqs: DataFrame, shardTableDir: String,
                     provDir: String, exportDir: String, fromSeq: Long,
                     batchId: Long, nBuckets: Int = 8): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    import graft.streaming.EventStreams
    val spark = updatedSeqs.sparkSession
    val exp = new Path(exportDir)
    val fs = exp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(exp, s".reexport-$batchId.json")
    val touched: Seq[Long] =
      if (fs.exists(manifest)) { // replay: the committed touched set
        val in = fs.open(manifest)
        val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        """-?\d+""".r.findAllIn(body).map(_.toLong).toSeq
      } else {
        // bounded collect: distinct shard ids of the re-laid region
        val t = EventStreams.readUpsertTable(spark, provDir)
          .filter(col("seq_id") >= fromSeq)
          .select(col("shard_id")).distinct()
          .collect().map(_.getLong(0)).sorted.toSeq
        if (t.nonEmpty) {
          val tmp = new Path(exp, s".reexport-$batchId.json.tmp")
          val out = fs.create(tmp, true)
          try out.write(s"[${t.mkString(",")}]".getBytes("UTF-8"))
          finally out.close()
          if (!fs.rename(tmp, manifest) && !fs.exists(manifest))
            throw new IllegalStateException(
              s"failed to commit re-export manifest $manifest")
        }
        t
      }
    if (touched.isEmpty) return Seq.empty
    // replay guards: each table's half of the commit pair is skipped
    // once its merge landed — recomputing inputs after a completed pair
    // can read a snapshot retention already swept
    val tableDone = EventStreams.appliedBatch(spark, shardTableDir)
      .exists(_ >= batchId + 1)
    val provDone = EventStreams.appliedBatch(spark, provDir)
      .exists(_ >= batchId + 1)
    // the frozen map reads AS-OF the pre-delete snapshot (the
    // read-before-batch replay rule): a crash between the table's
    // delete and its merge replays with the stale region's rows already
    // gone — re-reading the LATEST snapshot would re-derive an EMPTY
    // refresh and commit it, truncating every touched shard
    lazy val mapBefore = EventStreams
      .readUpsertTableBefore(spark, shardTableDir, batchId)
      .getOrElse(throw new IllegalStateException(
        s"$shardTableDir has no committed snapshot before batch $batchId"))
      .select(col("seq_id"), col("rank"), col("shard_id"))
      .filter(col("seq_id") >= fromSeq)
      .localCheckpoint()
    // refreshed region: new content joined with the FROZEN map (inner —
    // vanished sequences drop); barrier: feeds the table merge, the
    // provenance merge and nothing reads files the deletes sweep
    lazy val refreshed = updatedSeqs
      .select(col("seq_id"), col("tokens"), col("doc_spans"))
      .filter(col("seq_id") >= fromSeq)
      .join(mapBefore, Seq("seq_id"))
      .select(col("seq_id"), col("tokens"), col("doc_spans"), col("rank"),
        col("shard_id"))
      .localCheckpoint()
    if (!tableDone) {
      EventStreams.deleteFromTable(spark, shardTableDir,
        mapBefore.select(col("seq_id")),
        Seq("seq_id"), nBuckets = nBuckets, batchId = batchId, retain = 2)
      // retain = 3 keeps the pre-delete snapshot readable while the
      // provenance half may still need mapBefore on a replay
      EventStreams.mergeBatchIntoTable(refreshed, shardTableDir,
        Seq("seq_id"), "seq_id", nBuckets = nBuckets, batchId = batchId + 1,
        retain = 3)
    }
    if (!provDone) {
      EventStreams.deleteFromTable(spark, provDir,
        EventStreams.readUpsertTableBefore(spark, provDir, batchId)
          .getOrElse(throw new IllegalStateException(
            s"$provDir has no committed snapshot before batch $batchId"))
          .filter(col("seq_id") >= fromSeq)
          .select(col("seq_id"), col("doc_id")),
        Seq("seq_id", "doc_id"), nBuckets = nBuckets, batchId = batchId, retain = 2)
      // retain = 3: the pair spans manifests (pre, delete, merge) —
      // keeping all three leaves the PRE-re-export provenance snapshot
      // readable for a batch-pinned audit (Takedown.auditDocsAt)
      EventStreams.mergeBatchIntoTable(
        refreshed.select(col("shard_id"), col("seq_id"),
            explode(col("doc_spans")).as("sp"))
          .select(col("shard_id"), col("seq_id"), col("sp.doc_id").as("doc_id"),
            col("sp.start").as("start"), col("sp.len").as("len")),
        provDir, Seq("seq_id", "doc_id"), "seq_id", nBuckets = nBuckets,
        batchId = batchId + 1, retain = 3)
    }
    // re-stage ONLY the touched shard dirs from the updated table, then
    // swap each by rename; a touched shard whose sequences all vanished
    // ends as a deleted dir
    val stage = new Path(exp, s".inflight-reexport-$batchId")
    if (fs.exists(stage)) fs.delete(stage, true)
    EventStreams.readUpsertTable(spark, shardTableDir)
      .filter(col("shard_id").isin(touched: _*))
      .repartition(touched.length, col("shard_id"))
      .sortWithinPartitions(col("rank"))
      .write.partitionBy("shard_id").parquet(stage.toString)
    touched.foreach { id =>
      val dest = new Path(exp, s"shard_id=$id")
      val src = new Path(stage, s"shard_id=$id")
      if (fs.exists(dest)) fs.delete(dest, true)
      if (fs.exists(src) && !fs.rename(src, dest))
        throw new IllegalStateException(
          s"failed to swap re-exported shard dir $dest")
    }
    fs.delete(stage, true)
    touched
  }

  /** FOLD UNDERSIZED SHARDS — the maintenance transaction behind the
    * tombstone trade [[reexportShards]] documents: takedowns make
    * sequences vanish, the frozen map leaves their ranks as holes, and
    * the touched shards come out SHORT — a trainer streaming
    * shard-by-shard sees progressively smaller files, and after enough
    * takedowns a shard can be nearly empty. A rebalance re-freezes the
    * map DENSE while preserving the streaming order exactly:
    *
    *   - surviving sequences re-number by their committed rank order
    *     (`new_rank` = dense index ORDER BY rank — the order a trainer
    *     streams is untouched, only the holes close up), and shards
    *     re-chunk as `new_rank div seqsPerShard` — every non-final
    *     shard is full again;
    *   - rows whose (rank, shard) did not move are NOT rewritten: the
    *     changed set is the suffix from the FIRST hole (ranks before it
    *     are already dense), so the prefix shards' table rows, their
    *     provenance rows AND their exported files stay byte-identical —
    *     the [[deleteDocsFromSequences]] cut-point argument applied to
    *     the shard map;
    *   - the TOUCHED export set (old ∪ new homes of every moved row) is
    *     committed FIRST as `.rebalance-<batchId>.json` (the
    *     [[reexportShards]] manifest convention): a crash after the
    *     table merges would otherwise recompute an empty changed set
    *     and strand stale export dirs — replays load the set instead;
    *   - the sharded table and provenance update under the
    *     delete-at-`batchId` / merge-at-`batchId + 1` commit pair (the
    *     [[reexportShards]] protocol, including its read-before-batch
    *     replay rule — the moved rows' NEW map derives from the
    *     pre-delete snapshot, so a crash between the halves replays
    *     identically), then only the touched `shard_id=` dirs re-stage
    *     and swap by rename; an old shard id whose rows all moved down
    *     folds away (its dir is deleted).
    *
    * Every commit is idempotent — a crash anywhere replays to
    * completion with the same arguments; later operations on either
    * table must use ids above `batchId + 1`. A table with no holes and
    * no short shards returns empty and commits NOTHING (the
    * monitor-only-cost path). Returns the touched shard ids.
    */
  def rebalanceShards(spark: org.apache.spark.sql.SparkSession,
                      shardTableDir: String, provDir: String,
                      exportDir: String, seqsPerShard: Int, batchId: Long,
                      nParts: Int = 8, nBuckets: Int = 8): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    import graft.streaming.EventStreams
    require(seqsPerShard > 0, s"seqsPerShard must be > 0, got $seqsPerShard")
    val exp = new Path(exportDir)
    val fs = exp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(exp, s".rebalance-$batchId.json")
    // replay guards, the reexportShards convention
    val tableDone = EventStreams.appliedBatch(spark, shardTableDir)
      .exists(_ >= batchId + 1)
    val provDone = EventStreams.appliedBatch(spark, provDir)
      .exists(_ >= batchId + 1)
    // the moved set derives from the PRE-delete snapshot (the
    // read-before-batch replay rule): after the delete half commits,
    // the latest snapshot lacks the moved rows and would re-derive a
    // different (wrong) numbering
    lazy val changed = Sampling.denseGlobalIndex(
        EventStreams.readUpsertTableBefore(spark, shardTableDir, batchId)
          .getOrElse(throw new IllegalStateException(
            s"$shardTableDir has no committed snapshot before batch $batchId"))
          .select(col("seq_id"), col("tokens"), col("doc_spans"),
            col("rank"), col("shard_id")),
        "new_rank", Seq(col("rank")), nParts)
      .withColumn("new_shard", expr(s"new_rank div $seqsPerShard"))
      .filter(col("new_rank") =!= col("rank") ||
        col("new_shard") =!= col("shard_id"))
      .localCheckpoint() // barrier: feeds the touched collect + 2 pairs
    val touched: Seq[Long] =
      if (fs.exists(manifest)) { // replay: the committed touched set
        val in = fs.open(manifest)
        val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        """-?\d+""".r.findAllIn(body).map(_.toLong).toSeq
      } else {
        // bounded collect: old + new homes of the moved rows, each
        // bounded by the shard count
        val t = changed.select(col("shard_id"))
          .union(changed.select(col("new_shard")))
          .distinct().collect().map(_.getLong(0)).sorted.toSeq
        if (t.nonEmpty) {
          val tmp = new Path(exp, s".rebalance-$batchId.json.tmp")
          val out = fs.create(tmp, true)
          try out.write(s"[${t.mkString(",")}]".getBytes("UTF-8"))
          finally out.close()
          if (!fs.rename(tmp, manifest) && !fs.exists(manifest))
            throw new IllegalStateException(
              s"failed to commit rebalance manifest $manifest")
        }
        t
      }
    if (touched.isEmpty) return Seq.empty
    if (!tableDone) {
      EventStreams.deleteFromTable(spark, shardTableDir,
        changed.select(col("seq_id")),
        Seq("seq_id"), nBuckets = nBuckets, batchId = batchId, retain = 2)
      // retain = 3 keeps the pre-delete snapshot readable while the
      // provenance half may still need `changed` on a replay
      EventStreams.mergeBatchIntoTable(
        changed.select(col("seq_id"), col("tokens"), col("doc_spans"),
          col("new_rank").as("rank"), col("new_shard").as("shard_id")),
        shardTableDir, Seq("seq_id"), "seq_id", nBuckets = nBuckets,
        batchId = batchId + 1, retain = 3)
    }
    if (!provDone) {
      EventStreams.deleteFromTable(spark, provDir,
        changed.select(col("seq_id"), explode(col("doc_spans")).as("sp"))
          .select(col("seq_id"), col("sp.doc_id").as("doc_id")),
        Seq("seq_id", "doc_id"), nBuckets = nBuckets, batchId = batchId, retain = 2)
      // retain = 3: the reexportShards convention — keep the pre-fold
      // provenance snapshot readable for batch-pinned audits
      EventStreams.mergeBatchIntoTable(
        changed.select(col("new_shard").as("shard_id"), col("seq_id"),
            explode(col("doc_spans")).as("sp"))
          .select(col("shard_id"), col("seq_id"), col("sp.doc_id").as("doc_id"),
            col("sp.start").as("start"), col("sp.len").as("len")),
        provDir, Seq("seq_id", "doc_id"), "seq_id", nBuckets = nBuckets,
        batchId = batchId + 1, retain = 3)
    }
    // re-stage ONLY the touched shard dirs from the updated table, then
    // swap each by rename; an old shard emptied by the fold ends as a
    // deleted dir
    val stage = new Path(exp, s".inflight-rebalance-$batchId")
    if (fs.exists(stage)) fs.delete(stage, true)
    EventStreams.readUpsertTable(spark, shardTableDir)
      .filter(col("shard_id").isin(touched: _*))
      .repartition(touched.length, col("shard_id"))
      .sortWithinPartitions(col("rank"))
      .write.partitionBy("shard_id").parquet(stage.toString)
    touched.foreach { id =>
      val dest = new Path(exp, s"shard_id=$id")
      val src = new Path(stage, s"shard_id=$id")
      if (fs.exists(dest)) fs.delete(dest, true)
      if (fs.exists(src) && !fs.rename(src, dest))
        throw new IllegalStateException(
          s"failed to swap rebalanced shard dir $dest")
    }
    fs.delete(stage, true)
    touched
  }

  /** Shard-map HEALTH MONITOR — the cheap aggregate that decides
    * whether [[rebalanceShards]] is worth its rewrite: one pass over
    * the committed map's (rank, shard_id) projection returning a
    * single row (n_seqs, n_slots, n_holes, fill_ratio, short_shards)
    * where `n_slots` = max rank + 1 (the rank space takedowns
    * punched holes into) and `short_shards` counts non-final shards
    * below `seqsPerShard`. A healthy map reads fill_ratio 1.0 /
    * short_shards 0. Monitor-only cost: no text, no tokens, no
    * commits — the q179/q183 monitor convention.
    */
  def shardFillStats(spark: org.apache.spark.sql.SparkSession,
                     shardTableDir: String, seqsPerShard: Int): DataFrame = {
    require(seqsPerShard > 0, s"seqsPerShard must be > 0, got $seqsPerShard")
    val map = graft.streaming.EventStreams
      .readUpsertTable(spark, shardTableDir)
      .select(col("rank"), col("shard_id"))
    val perShard = map.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n"))
    val maxShard = perShard.agg(max(col("shard_id")).as("m"))
    val short = perShard.crossJoin(broadcast(maxShard))
      .filter(col("shard_id") =!= col("m") &&
        col("n") < lit(seqsPerShard.toLong))
      .agg(count(lit(1)).cast("long").as("short_shards"))
    // empty map (a total-corpus takedown removed every sequence):
    // max(rank) is NULL — report the healthy zero row (0 slots, fill
    // 1.0) instead of NULL slots that NPE the monitor's readers
    map.agg(count(lit(1)).as("n_seqs"),
        (coalesce(max(col("rank")), lit(-1L)) + 1L).as("n_slots"))
      .withColumn("n_holes", col("n_slots") - col("n_seqs"))
      .withColumn("fill_ratio",
        when(col("n_slots") > 0L,
          col("n_seqs").cast("double") / col("n_slots").cast("double"))
          .otherwise(lit(1.0)))
      .crossJoin(broadcast(short))
      .select(col("n_seqs"), col("n_slots"), col("n_holes"),
        col("fill_ratio"), col("short_shards"))
  }

  /** The CLOSED monitor→fold loop — [[shardFillStats]] and
    * [[rebalanceShards]] in one scheduled-maintenance call: measure
    * the committed map's fill ratio and fold ONLY when it drops below
    * `minFill` (a map with a few scattered holes is not worth the
    * suffix rewrite — the dial [[rebalanceShards]] alone lacks, which
    * folds ANY hole unconditionally). A healthy map costs exactly the
    * monitor's one aggregate and commits NOTHING — not even the
    * rebalance's changed-set derivation runs. Returns ONE row: the
    * monitor's verdict plus what was done —
    * (n_seqs, n_slots, fill_ratio, sparse, rebalanced, n_touched).
    * Replay-safe INCLUDING the gate: a committed
    * `.rebalance-<batchId>.json` manifest means a prior attempt at
    * THIS batchId got past its first commit, so the fold runs
    * UNCONDITIONALLY and its own guards drive the replay to
    * completion — without this, a crash after the table/provenance
    * merges but before the export re-stage would read fill_ratio 1.0
    * on replay, skip the fold, and strand exported shard files
    * permanently inconsistent with the committed map. The manifest
    * commits before any mutation, so its existence covers every
    * crash window the gate could otherwise mask. The returned
    * `sparse` is always the CURRENT measured verdict (false on a
    * replay whose merges already landed); `rebalanced` reports
    * whether this call touched shards.
    */
  def rebalanceIfSparse(spark: org.apache.spark.sql.SparkSession,
                        shardTableDir: String, provDir: String,
                        exportDir: String, seqsPerShard: Int, batchId: Long,
                        minFill: Double = 0.9, nBuckets: Int = 8): DataFrame = {
    import org.apache.hadoop.fs.Path
    import spark.implicits._
    require(minFill > 0.0 && minFill <= 1.0,
      s"minFill must be in (0, 1], got $minFill")
    val exp = new Path(exportDir)
    val fs = exp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inFlight = fs.exists(new Path(exp, s".rebalance-$batchId.json"))
    val s = shardFillStats(spark, shardTableDir, seqsPerShard).head()
    val (nSeqs, nSlots, fill) =
      (s.getLong(0), s.getLong(1), s.getDouble(3))
    val sparse = fill < minFill
    val touched =
      if (inFlight || sparse)
        rebalanceShards(spark, shardTableDir, provDir, exportDir,
          seqsPerShard, batchId, nBuckets = nBuckets)
      else Seq.empty[Long]
    Seq((nSeqs, nSlots, fill, sparse, touched.nonEmpty, touched.length))
      .toDF("n_seqs", "n_slots", "fill_ratio", "sparse", "rebalanced",
        "n_touched")
  }
}
