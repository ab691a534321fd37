package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** k-slot MinHash signature of a string array — custom Catalyst
  * expression (ladder step (b), SURVEY.md §2.10).
  *
  * Why not `transform(sequence(0,k-1), i -> array_min(transform(sh, s ->
  * xxhash64(s, i))))`: higher-order functions are interpreted with no
  * subexpression caching, and CollapseProject inlines the shingle
  * subtree into the outer lambda — the shingle pipeline then re-evaluates
  * k times per row (measured 64x blowup, 123 s vs ~2 s at sf0.1). A
  * UnaryExpression evaluates its child exactly once per row by
  * construction and runs the k x n loop over primitive longs.
  *
  * Hash family: slot i of shingle s = xxhash64(xxhash64(s, seed=42),
  * seed=i) — the same xxHash64 core as Spark's built-in `xxhash64`.
  * All-null/empty input array -> null signature.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if k > 0 => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"minhash_sig requires array<string> and k>0, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  /** Whole-stage codegen: a static call into the same tight loop —
    * no per-row InternalRow boxing (which CodegenFallback would cost),
    * and the surrounding operators stay in one codegen span.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.MinHashSig.compute($c, $k);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  import org.apache.spark.sql.graft.ColumnBridge
  import org.apache.spark.sql.functions._

  /** Shared by interpreted eval and generated code (static call target). */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill[Long](k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val base = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < k) {
          val h = XxHash64Function.hash(base, LongType, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  def minhashSig(tokens: Column, k: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(tokens), k))

  /** Jaccard ESTIMATE from two signatures: fraction of agreeing slots —
    * the MinHash property the LSH banding relies on.
    */
  def minhash_sig_est(a: Column, b: Column, k: Int): Column =
    aggregate(
      zip_with(minhashSig(a, k), minhashSig(b, k),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k
}
