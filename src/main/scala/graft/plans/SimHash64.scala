package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array — a custom Catalyst `Expression`
  * (extension ladder step (b), SURVEY.md §2.10): the per-bit weighted
  * counters can't be expressed efficiently with built-in higher-order
  * functions (64 parallel accumulators per row).
  *
  * Per token: a 64-bit hash; each hash bit votes +1/-1 into one of 64
  * counters; output bit j is 1 iff counter j > 0. Near-duplicate docs
  * differ in few bits, so hamming distance (built-in `bit_count(a ^ b)`)
  * gives the similarity test, and 16-bit bands of the fingerprint give
  * LSH-style candidate buckets.
  *
  * CodegenFallback: the eval is a tight per-row loop over tokens; the
  * surrounding plan stays in codegen. Deterministic — no seed state.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash64.compute(input.asInstanceOf[ArrayData]))

  /** Whole-stage codegen via a static call into the per-row loop (no
    * CodegenFallback row boxing; output is a primitive long).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Shared by interpreted eval and generated code. xxHash64 (seed 42)
    * per token — the same family as Spark's built-in `xxhash64`.
    */
  def compute(arr: ArrayData): Long = {
    val counters = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = hash64(arr.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  private def hash64(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, StringType, 42L)

  /** Column-API entry point (Spark 4 Column <-> Expression bridge). */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
