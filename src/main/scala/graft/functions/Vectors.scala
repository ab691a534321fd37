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

  /** In-order dot product — native codegen'd kernel
    * ([[graft.plans.VectorOps]]), bit-identical to the HOF form
    * `aggregate(zip_with(a, b, _ * _), 0d, _ + _)` it replaced (same
    * left-to-right double sum; see VectorOps scaladoc for the proof
    * sketch), ~10x less per-pair overhead than the interpreted lambda.
    */
  def dot(a: Column, b: Column): Column = graft.plans.VectorOps.vecDot(a, b)

  /** Sum of squares — dot(a, a) accumulates the identical op sequence
    * (x*x then add) as the old `aggregate(a, 0d, (acc, x) => acc + x*x)`.
    */
  def normSq(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity of two double arrays (null/zero-norm -> null via
    * try_divide under ANSI).
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  /** Euclidean (L2) distance (native in-order squared-distance kernel). */
  def l2(a: Column, b: Column): Column =
    sqrt(graft.plans.VectorOps.vecL2Sq(a, b))
}
