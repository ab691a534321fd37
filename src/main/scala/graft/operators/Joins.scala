package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3) + time-ordered composites (as-of,
  * sessionize).
  *
  * Scale posture: dimension joins broadcast the small side (Catalyst's
  * `autoBroadcastJoinThreshold` picks this up automatically; `broadcast()`
  * hints are added where the small side is known small by construction, so
  * the plan survives stale/absent stats on a real cluster). Fact-fact joins
  * are left to sort-merge + AQE skew handling.
  */
object Joins {

  /** J1: the reference's left fan-out join (ETL.py:109-113) — daily
    * aggregates joined back onto distinct per-row keys; output granularity
    * is the finer right side, all aggregate rows preserved.
    * The aggregate side is small by construction (one row per group key) →
    * broadcast-right works at any fact-table scale when the key domain is
    * bounded (dates); for unbounded keys drop the hint and let AQE decide.
    */
  def fanoutLeft(agg: DataFrame, detail: DataFrame, key: String): DataFrame =
    agg.join(detail, Seq(key), "left")

  /** Star-schema chain join: fact joined through dims; every dim side is
    * broadcast (they are tiny relative to the fact at every SF).
    */
  def starJoin(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, cond)) => acc.join(broadcast(dim), cond) }

  /** Skew-salted equi join: the skewed left side gets a deterministic
    * salt (hash of a high-cardinality column mod `buckets`); the compact
    * right side is replicated once per salt value. Result is identical to
    * the plain join, but a hot key's rows spread over `buckets` reducers
    * instead of one. (AQE's skew-join handles sort-merge skew
    * automatically; explicit salting remains the tool for skewed
    * AGGREGATIONS and for deterministic partition sizing.)
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 highCardCol: String, buckets: Int): DataFrame = {
    val salted = left.withColumn("__salt", pmod(xxhash64(col(highCardCol)), lit(buckets)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Join of two co-bucketed catalog tables (written via
    * [[Load.bucketedTable]] with the SAME bucket count on the join
    * key): the bucketing metadata satisfies both sides' distribution
    * requirement, so the sort-merge join runs with NO ShuffleExchange —
    * each task reads bucket i of both tables. The `merge` hint pins
    * SMJ (at test SFs the right side is broadcast-small, which would
    * hide the property being demonstrated; at fact⋈fact scale SMJ is
    * what Catalyst picks anyway). PlanSpec asserts the executed plan is
    * exchange-free and that the same join on unbucketed data shuffles.
    */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
                   leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge").join(spark.table(rightTable), Seq(key))

  /** Backward as-of join on the NATIVE operator (preference order (c):
    * graft.plans.AsOfJoinPlan/Exec, injected via GraftExtensions): for
    * each left row, all columns of the most recent right row with the
    * same key and rightTs <= leftTs (nulls when none). Key and ts are
    * cast to long (timestamps: call with an epoch-us column). The two
    * sides must not share column names (rename before joining).
    * JoinsTimeOpsSpec proves equivalence with [[asOfBackward]]; the
    * q121 oracle is DuckDB's own ASOF JOIN semantics via q22's SQL.
    */
  def asOfJoinNative(left: DataFrame, right: DataFrame,
                     leftKey: String, leftTs: String,
                     rightKey: String, rightTs: String): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.LongType
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    def asLong(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      if (e.dataType == LongType) e
      else org.apache.spark.sql.catalyst.expressions.Cast(e, LongType)
    ColumnBridge.ofRows(left.sparkSession, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      asLong(attr(lPlan, leftKey)), asLong(attr(rPlan, rightKey)),
      asLong(attr(lPlan, leftTs)), asLong(attr(rPlan, rightTs))))
  }

  /** Backward as-of join, composed from built-ins (preference order (a) of
    * the custom-operator ladder): for each left event, the most recent
    * right event with rightTs <= leftTs, per key.
    *
    * Implementation: union both sides, one window sort per key, running
    * `max(rightTs)` — a single shuffle on the key, no range cross-join.
    * This is the scalable shape: state per key is O(1), unlike an
    * interval-join expansion.
    */
  def asOfBackward(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                   isRight: Column, asOfName: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(asOfName, max(when(isRight, col(tsCol))).over(w))
  }

  /** Bucketed range join: pairs (l, r) with r's timestamp in
    * [l.ts - tolerance, l.ts] and NO equi key. The naive plan for a pure
    * range predicate is a nested-loop cross join — O(n*m). Bucketing by
    * `tolerance`-wide time buckets turns it into an equi join: the left
    * side explodes into the (at most 2) buckets that can contain matches,
    * the right side keeps its single bucket, and the exact range predicate
    * filters the bucket-equal candidates. Shuffle is on the bucket key;
    * candidate volume is matches + O(rows) — the 100 TB shape.
    *
    * Caller supplies frames with disjoint column names; returns the inner
    * pairs.
    */
  def rangeJoinBucketed(left: DataFrame, leftTs: String,
                        right: DataFrame, rightTs: String,
                        toleranceSeconds: Long): DataFrame = {
    val tolUs = toleranceSeconds * 1000000L
    def bucketOf(us: Column): Column = floor(us / tolUs).cast("long")
    val l = left
      .withColumn("__lus", unix_micros(col(leftTs)))
      .withColumn("__bucket",
        explode(array(bucketOf(col("__lus")), bucketOf(col("__lus")) - 1)))
    val r = right
      .withColumn("__rus", unix_micros(col(rightTs)))
      .withColumn("__bucket", bucketOf(col("__rus")))
    l.join(r,
        l("__bucket") === r("__bucket") &&
          col("__rus") >= col("__lus") - tolUs && col("__rus") <= col("__lus"))
      .drop("__lus", "__rus", "__bucket")
  }

  /** Gap-based sessionization: a new session starts when the gap from the
    * previous event of the same key exceeds `gapSeconds`. One shuffle on
    * the key; session ids are per-key dense ranks (key-local, so no global
    * sequence bottleneck).
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                 gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prevTs.isNull ||
        (unix_micros(col(tsCol)) - unix_micros(prevTs)) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    df.withColumn("session_id",
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
