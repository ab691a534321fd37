package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns ([ext], SURVEY.md
  * §2.8) using higher-order functions (`zip_with` / `aggregate`) — pure
  * Catalyst expressions, no UDF, so vector scoring runs inside codegen
  * and is trivially data-parallel.
  *
  * All math is done in double: the fold is a strict left-to-right sum,
  * which both Spark and DuckDB (`list_sum`) evaluate in array order —
  * that determinism is what makes cosine scores oracle-comparable.
  */
object Vectors {

  /** array<float> -> array<double> (promote before any arithmetic). */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity of two double arrays (null/zero-norm -> null via
    * try_divide under ANSI).
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  /** Euclidean (L2) distance. */
  def l2(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
}
