package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY.md §2.4).
  *
  * All of these are single hash-aggregates with map-side partial
  * aggregation (Catalyst plans partial+final automatically) — at 100 TB the
  * shuffle carries only per-group partial states, not rows.
  */
object Aggregates {

  /** A1 analog: group by day with NA-skipping means (pandas `mean` ==
    * Spark `avg`, both ignore nulls — ETL.py:69-73).
    */
  def daily(events: DataFrame, tsCol: String, valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map(c => avg(col(c)).as(s"avg_$c")) :+ count(lit(1)).as("n")
    events.groupBy(to_date(col(tsCol)).as("d")).agg(aggs.head, aggs.tail: _*)
  }

  /** A2 analog: group by month number (ETL.py:116-123). */
  def monthly(events: DataFrame, tsCol: String, valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map(c => avg(col(c)).as(s"avg_$c")) :+ count(lit(1)).as("n")
    events.groupBy(month(col(tsCol)).as("m")).agg(aggs.head, aggs.tail: _*)
  }

  /** A3: deterministic group mode — most frequent value, ties broken by the
    * SMALLEST value, empty/all-null group -> null. This is pandas
    * `mode().iloc[0]` semantics (ETL.py:76,122; pandas `mode()` sorts).
    *
    * Spark 4's built-in `mode()` is non-deterministic on ties, so this is
    * composed from deterministic primitives:
    *   count per (group, value) -> max count per group (window) -> min
    *   value among the argmax set.
    *
    * Scale shape: two shuffles, both on low-cardinality keys; the window
    * partitions by the group key over the already-aggregated (group, value)
    * counts — never over raw rows.
    */
  def deterministicMode(df: DataFrame, groupCol: Column, valueCol: Column,
                        outGroup: String, outMode: String): DataFrame = {
    val counts = df
      .filter(valueCol.isNotNull) // pandas mode() drops NA before counting
      .groupBy(groupCol.as(outGroup), valueCol.as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val w = Window.partitionBy(col(outGroup))
    counts
      .withColumn("__mx", max(col("__cnt")).over(w))
      .filter(col("__cnt") === col("__mx"))
      .groupBy(col(outGroup))
      .agg(min(col("__v")).as(outMode))
  }

  /** A4: exact per-column median (NA-skipping), as one aggregate job —
    * the imputation source (ETL.py:62). `median` is exact (Spark 3.4+);
    * `percentile_approx` is the documented 100 TB escape hatch (exact
    * median requires a full sort of each column's values).
    */
  def medians(df: DataFrame, cols: Seq[String]): Map[String, Double] = {
    val aggs = cols.map(c => median(col(c)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.collect { case (c, i) if !row.isNullAt(i) => c -> row.getDouble(i) }.toMap
  }

  /** F5: median imputation = one agg pass + one fill pass (same two-pass
    * shape as the pandas intent at ETL.py:61-62).
    */
  def imputeMedians(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.fill(medians(df, cols))

  /** Scalable exact distinct-count: phase 1 dedups on (key, value) —
    * partial-aggregated map-side, so a hot key's values spread across all
    * reducers — phase 2 counts per key. Same result as `countDistinct`,
    * which funnels each key's whole value set through one reducer's
    * hash set; at 100 TB with skewed keys this shape is the difference
    * between finishing and OOM.
    */
  def distinctCountTwoPhase(df: DataFrame, key: Column, value: Column,
                            outKey: String, outCount: String): DataFrame =
    df.select(key.as(outKey), value.as("__v")).distinct()
      .groupBy(col(outKey)).agg(count(lit(1)).as(outCount))
}
