package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Texts, Vectors}

/** RAG retrieval end-to-end (q156) — the retrieval-side twin of the
  * curation flagship: documents become overlapping sliding-window
  * chunks (the q148 chunking, content kept), each chunk embeds into a
  * deterministic hashed bag-of-words vector, the chunk set is indexed
  * by the hyperplane-LSH family (q29's buckets), and a probe corpus
  * retrieves its top-k chunks bucket-locally. Every step is a
  * deterministic expression, so unlike the float-sensitive
  * KMeans-backed paths (IVF/PQ, verdict-checked) the ENTIRE retrieval
  * — chunk boundaries, embeddings, bucket assignment, scores, ranks —
  * hash-matches a DuckDB re-derivation.
  *
  * Scale shape: chunking and embedding are narrow per-row expressions
  * (bounded explode per doc — `ceil(nt/stride)` chunks, no shuffle);
  * the only shuffle is the bucket-keyed candidate equi-join (q29's
  * posture: candidates O(Σ per-bucket probe×corpus), never corpus ×
  * probes; `nPlanes` is the bucket-width knob — at 100 TB more planes
  * = smaller buckets = fewer candidates per probe); top-k uses the
  * bounded typed aggregator, never a window over the candidate set.
  * In production the embedding column would come from a model via the
  * multimodal batch path — hashed BOW keeps the PLUMBING identical
  * and the result portable.
  */
object Rag {

  /** The chunk-key stride: `chunk_key = doc_id * ChunkStride +
    * chunk_idx` (valid while docs stay under `stride * ChunkStride`
    * tokens — far beyond any real document). ONE definition shared by
    * the key builder ([[chunkVectors]]) and every reader that inverts
    * it ([[docIdOf]], used by [[deleteDocs]] and Takedown.auditDocs) —
    * the two sides must never drift apart, or the audit whose whole
    * job is "nothing was missed" silently checks the wrong doc ids.
    */
  val ChunkStride: Long = 100000L

  /** Recover the doc id from a composite chunk key — the inverse of
    * [[chunkVectors]]'s key construction, shared so a stride change
    * cannot break one side silently (RagSpec pins the round-trip).
    */
  def docIdOf(chunkKey: Column): Column =
    call_function("div", chunkKey, lit(ChunkStride))

  /** Deterministic hashed bag-of-words embedding: `v[i]` = count of
    * tokens whose portable md5 bucket (the q149 feature-hash
    * convention) is `i`, as `array<double>` of length `dim`. A narrow
    * codegen'd expression, no UDF, no shuffle; nonzero for any
    * non-empty token array, so downstream cosine is well-defined.
    *
    * Runs as the native kernel [[graft.plans.HashedBow]] (optimization
    * round 17): the declarative fold below ([[hashedBowHof]], kept as
    * the parity reference RagSpec replays) allocates a fresh
    * `dim`-element array per token inside an interpreted lambda —
    * hashing + histogram were ~60% of q156's chunk-embed stage at
    * sf0.1. Same values bit-for-bit (integer counts as doubles; the
    * kernel documents the null/empty equivalences).
    */
  def hashedBow(toks: Column, dim: Int): Column =
    graft.plans.HashedBow.hashedBow(toks, dim)

  /** The declarative higher-order-function form of [[hashedBow]] —
    * same bucket family and fold, kept as the executable parity
    * reference for the native kernel (RagSpec runs both over real
    * corpus chunks and asserts identical vectors). Not the production
    * path: the fold re-allocates the accumulator array per token.
    *
    * Shape note that still matters for any HOF variant: the md5 rides
    * as the INPUT array of the fold (`transform` first, evaluated once
    * per row), and the fold lambda sees each bucket as a BOUND
    * VARIABLE — so the hash runs once per token. The tempting
    * `transform(0..dim, i -> count tokens with bucket i)` recomputes
    * md5 per token × per slot (HOF lambdas get no common-subexpression
    * elimination): dim=64 made that 64× the hashing work and benched
    * 22.6 s at sf0.1 vs ~2 s for this form.
    */
  private[graft] def hashedBowHof(toks: Column, dim: Int): Column =
    aggregate(
      transform(toks, t =>
        pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"),
          lit(dim.toLong)).cast("int")),
      array_repeat(lit(0.0), dim),
      (acc, b) => transform(acc, (v, i) =>
        when(i === b, v + lit(1.0)).otherwise(v)))

  /** Sliding chunks WITH content vectors: q148's chunk layout
    * (`window`-token chunks every `stride` tokens, 1-based slice)
    * plus the hashed-BOW embedding and a composite chunk key
    * `doc_id * [[ChunkStride]] + chunk_idx` (the key exists so
    * probe/candidate ids stay single Longs through the typed top-k
    * aggregator; [[docIdOf]] is the shared inverse).
    */
  def chunkVectors(documents: DataFrame, window: Int, stride: Int,
                   dim: Int): DataFrame = {
    require(window >= stride && stride > 0,
      s"need window >= stride > 0, got window=$window stride=$stride")
    documents
      .select(col("doc_id"), Texts.tokens(col("text")).as("ws"))
      .withColumn("nt", size(col("ws")))
      .filter(col("nt") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr(s"cast((nt - 1) div $stride as bigint)"))))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("ws"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(window)).as("cw"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("doc_id") * lit(ChunkStride) + col("chunk_idx")).as("chunk_key"),
        hashedBow(col("cw"), dim).as("v"))
  }

  /** Hyperplane bucket for NON-NEGATIVE vectors (BOW counts): the
    * plain sign-of-dot bucket ([[Similarity.hyperplaneBucket]])
    * degenerates on all-positive vectors — every dot's sign is
    * dominated by the plane's mean entry, so most of the corpus lands
    * in the couple of buckets whose planes' entry-sums agree with it
    * (measured at sf0.1: 2 of 16 buckets held 70% of chunks). Center
    * each vector first: dot(v − mean(v)·1, plane) = dot(v, plane) −
    * mean(v)·Σplane — the all-ones component carries no similarity
    * information for count vectors, and removing it restores the sign
    * balance (same 16 planes, measured max bucket share 70% → 40% and
    * the query 5.5 s → 3.6 s at sf0.1; residual concentration is real
    * vocabulary correlation between chunks — nPlanes remains the
    * knob).
    * Σplane folds to a literal, so this is still one narrow codegen'd
    * expression, and the subtraction is order-identical cross-engine
    * (both sides evaluate dot then subtract).
    */
  def centeredBucket(v: Column, nPlanes: Int, dim: Int): Column = {
    val m = aggregate(v, lit(0.0), (a, x) => a + x) / lit(dim.toDouble)
    Similarity.planeValues(nPlanes, dim).zipWithIndex.map { case (pv, i) =>
      val plane = array(pv.map(lit): _*)
      when(graft.plans.VectorOps.vecDot(v, plane) - m * lit(pv.sum) > 0,
        lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Bucket-local top-k chunk retrieval: probe docs' chunks retrieve
    * against corpus docs' chunks sharing the same hyperplane bucket,
    * exact cosine re-rank inside the bucket, ties (cosine desc,
    * chunk_key asc) on the rounded score. Returns (probe_id, vec_id,
    * cosine, rn) keyed by composite chunk keys — one row per retrieved
    * chunk, rn in [1, k].
    *
    * The candidate join is a plain bucket-keyed equi-join (NOT a
    * broadcast of probes): a serving probe workload can be arbitrarily
    * large, and both sides shuffle by the same uniform bucket key.
    */
  /** INCREMENTAL index maintenance — the production ingest path q156's
    * from-scratch build lacks: each arriving document shard chunks,
    * embeds, and bucket-assigns ONLY ITS OWN documents, and the
    * resulting (chunk_key, v, bucket) rows append to a
    * manifest-committed index table (`EventStreams.mergeBatchIntoTable`
    * — atomic publish, idempotent batchId). History is never re-chunked
    * or re-embedded: chunking/embedding/bucketing are all per-document
    * expressions with no cross-document state, so — unlike incremental
    * curation/packing, whose min-id anchors and prefix sums force an
    * arrival-order watermark — ANY shard arrival order produces exactly
    * the batch index. N shard passes ≡ one batch build (q163
    * hash-checks retrieval through the two-pass table against the
    * batch-derivation oracle).
    */
  def indexShard(shard: DataFrame, indexDir: String, window: Int, stride: Int,
                 dim: Int, nPlanes: Int, batchId: Long): Unit = {
    // same barrier as retrieveTopK's corpus side: the bucket derivation
    // consumes v nPlanes times, and the committed column IS v
    val rows = chunkVectors(shard, window, stride, dim).localCheckpoint()
      .select(col("chunk_key"), col("v"),
        centeredBucket(col("v"), nPlanes, dim).as("bucket"))
    graft.streaming.EventStreams.mergeBatchIntoTable(
      rows, indexDir, Seq("chunk_key"), "chunk_key", nBuckets = 8,
      batchId = batchId)
  }

  /** TAKEDOWN tombstoning for the committed chunk index: every chunk of
    * the deleted docs is removed as one committed delete generation
    * (EventStreams.deleteFromTable — touched-buckets-only rewrite,
    * manifest-atomic, replay-idempotent). Chunk derivations are
    * per-document with no cross-document state, so — unlike the
    * sequence table, which must re-lay its suffix — deleting a doc's
    * chunks leaves every other row bit-identical to a from-scratch
    * index over the retained corpus (RagSpec-proven). The key set is
    * read off the index itself ([[docIdOf]] recovers doc_id),
    * checkpointed before the rewrite begins.
    */
  def deleteDocs(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                 deletedIds: Seq[Long], batchId: Long,
                 nBuckets: Int = 8, retain: Int = 1): Unit = {
    val keys = graft.streaming.EventStreams.readUpsertTable(spark, indexDir)
      .filter(docIdOf(col("chunk_key")).isin(deletedIds: _*))
      .select(col("chunk_key"))
    graft.streaming.EventStreams.deleteFromTable(spark, indexDir, keys,
      Seq("chunk_key"), nBuckets, batchId, retain)
  }

  /** Retrieval against the COMMITTED chunk index: probe docs chunk +
    * embed + bucket exactly as [[retrieveTopK]]'s probe side, but the
    * corpus side reads the index table — no corpus text, no
    * re-embedding, no bucket recomputation anywhere in the plan
    * (PlanSpec-guarded). Same bucket-keyed equi-join + bounded typed
    * top-k; identical results to a from-scratch [[retrieveTopK]] over
    * the indexed corpus.
    */
  def retrieveFromIndex(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String, probes: DataFrame, window: Int,
                        stride: Int, dim: Int, nPlanes: Int, k: Int): DataFrame = {
    val c = graft.streaming.EventStreams.readUpsertTable(spark, indexDir)
      .select(col("chunk_key").as("vec_id"), col("v"), col("bucket"))
    val p = chunkVectors(probes, window, stride, dim).localCheckpoint()
      .select(col("chunk_key").as("probe_id"), col("v").as("qv"),
        centeredBucket(col("v"), nPlanes, dim).as("bucket"))
    Similarity.topKPerProbe(
      c.join(p, Seq("bucket"))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("cosine", round(Vectors.cosine(col("v"), col("qv")), 6)),
      k)
  }

  def retrieveTopK(corpus: DataFrame, probes: DataFrame, window: Int,
                   stride: Int, dim: Int, nPlanes: Int, k: Int): DataFrame = {
    // materialize chunk vectors ONCE before deriving buckets: the
    // bucket is nPlanes dots against v, and CollapseProject would
    // inline the hashedBow tree into every dot plus the carried column
    // — (nPlanes+1)× the embedding work per chunk (measured 1.5x whole-
    // query at sf0.1). The checkpoint is also the honest production
    // shape: an embedding column is a materialized asset, not a
    // recompute-per-consumer expression.
    val c = chunkVectors(corpus, window, stride, dim).localCheckpoint()
      .select(col("chunk_key").as("vec_id"), col("v"),
        centeredBucket(col("v"), nPlanes, dim).as("bucket"))
    val p = chunkVectors(probes, window, stride, dim).localCheckpoint()
      .select(col("chunk_key").as("probe_id"), col("v").as("qv"),
        centeredBucket(col("v"), nPlanes, dim).as("bucket"))
    Similarity.topKPerProbe(
      c.join(p, Seq("bucket"))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("cosine", round(Vectors.cosine(col("v"), col("qv")), 6)),
      k)
  }
}
