package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches as plain DataFrames ([ext], SURVEY.md
  * §2.8): a count-min sketch is represented as `depth × width` rows of
  * (d, bucket, cnt) — which makes every sketch operation ordinary
  * relational algebra:
  *
  *   - BUILD is one hash aggregate over the exploded (d, bucket) pairs
  *     (map-side partials; the shuffle carries at most depth × width
  *     rows per input partition, a constant);
  *   - MERGE of shard sketches is union + re-sum — the same aggregate;
  *   - ESTIMATE is a broadcast join of the tiny sketch against the
  *     query items and a min over depth.
  *
  * The bucket hash is the portable md5 family (same discipline as
  * [[Sampling.portableUnit]]): any md5-capable engine rebuilds the
  * identical sketch bit-for-bit, so estimates are oracle-checkable —
  * unlike an opaque binary sketch blob. Standard CMS guarantees hold:
  * estimates never underestimate; overcount ≤ e·N/width with
  * probability 1 − e^(−depth).
  */
object Sketches {

  /** Row hash for depth-row `d`: first 8 md5 hex chars of
    * `item ":cms:" d`, mod width. Pure narrow expression.
    */
  def cmsBucket(item: Column, d: Int, width: Int): Column =
    pmod(conv(substring(md5(concat(item.cast("string"), lit(s":cms:$d"))), 1, 8), 16, 10)
      .cast("long"), lit(width.toLong))

  /** Build the sketch: one row per (d, bucket) with its occurrence
    * count. One scan (the depth replication is a per-row explode, not
    * `depth` passes), one bounded-cardinality aggregate.
    */
  def countMinSketch(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame =
    items
      .select(explode(array((0 until depth).map(d =>
        struct(lit(d).as("d"), cmsBucket(col(itemCol), d, width).as("bucket"))): _*)).as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge shard sketches built with the same (depth, width): cell-wise
    * sum. The mergeability is what makes the sketch a 100 TB citizen —
    * per-partition/per-day sketches combine without touching raw data.
    */
  def mergeSketches(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy(col("d"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `queries`: min over depth rows of the bucket
    * count (0 for a never-seen bucket). The sketch side is depth × width
    * rows — always broadcast-sized by construction.
    */
  def cmsEstimate(sketch: DataFrame, queries: DataFrame, itemCol: String,
                  depth: Int, width: Int): DataFrame = {
    val qCols = queries.columns.toSeq.map(col)
    queries
      .select(qCols :+
        explode(array((0 until depth).map(d =>
          struct(lit(d).as("d"), cmsBucket(col(itemCol), d, width).as("bucket"))): _*)).as("db"): _*)
      .select(qCols :+ col("db.d").as("d") :+ col("db.bucket").as("bucket"): _*)
      .join(broadcast(sketch), Seq("d", "bucket"), "left")
      .groupBy(qCols: _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }
}
