package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Beaufort wind-strength bucketing (reference F4, ETL.py:80-107).
  *
  * The reference implements this as a row-wise Python `Series.apply` UDF —
  * an interpreted per-row loop. Here it is a pure `Column` expression
  * (`when` chain): null-safe, codegen'd inside whole-stage codegen, and
  * constant-foldable by Catalyst. No UDF penalty at any scale.
  *
  * Thresholds are the reference's inclusive upper bounds (`speed <= t`).
  * A null speed yields null (every `when` predicate is false on null).
  */
object Winds {

  /** (inclusive upper bound in km/h, label) in ascending order. */
  val beaufortScale: Seq[(Double, String)] = Seq(
    1.5 -> "Calm",
    3.3 -> "Light Air",
    5.4 -> "Light Breeze",
    7.9 -> "Gentle Breeze",
    10.7 -> "Moderate Breeze",
    13.8 -> "Fresh Breeze",
    17.1 -> "Strong Breeze",
    20.7 -> "Near Gale",
    24.4 -> "Gale",
    28.4 -> "Strong Gale",
    32.6 -> "Storm",
  )
  val beaufortTop = "Violent Storm"

  /** Wind speed column -> Beaufort label column. */
  def windStrength(speed: Column): Column = {
    val chain = beaufortScale.foldLeft(Option.empty[Column]) {
      case (None, (bound, label)) => Some(when(speed <= bound, label))
      case (Some(c), (bound, label)) => Some(c.when(speed <= bound, label))
    }.get
    chain.otherwise(when(speed.isNotNull, beaufortTop))
  }

  /** The same chain rendered as ANSI SQL `CASE WHEN`, for oracle parity. */
  def windStrengthSql(speedExpr: String): String = {
    val whens = beaufortScale
      .map { case (b, l) => s"WHEN $speedExpr <= $b THEN '$l'" }
      .mkString(" ")
    s"CASE $whens WHEN $speedExpr IS NOT NULL THEN '$beaufortTop' END"
  }
}
