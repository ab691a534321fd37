package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector kernels (extension ladder step (b),
  * SURVEY.md §2.10): the hot per-pair math of every similarity/dedup
  * query — dot product and squared-L2 distance over `array<double>`.
  *
  * These are DROP-IN replacements for the higher-order-function forms
  * in [[graft.functions.Vectors]]:
  *
  *   dot:  `aggregate(zip_with(a, b, (x, y) => x * y), 0d, _ + _)`
  *   l2sq: `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)), 0d, _ + _)`
  *
  * Bit-identical by construction: the kernels accumulate LEFT-TO-RIGHT
  * in doubles with the same per-element op order (multiply, then add),
  * and JVM double arithmetic is strictly specified (no FMA fusion), so
  * every value — and therefore every DuckDB oracle hash, which
  * replicates the same in-order `list_sum` — is unchanged. Null
  * semantics also mirror the HOF forms: any null element, or a length
  * mismatch (zip_with pads with null), yields null.
  *
  * Why not the HOFs: `zip_with`/`aggregate` evaluate an interpreted
  * lambda per ELEMENT with boxed doubles and allocate the intermediate
  * product array per ROW — at ~256 pairs per semantic-dedup cell that
  * interpreter overhead dominated q138 (measured ~4.5 s at sf0.1).
  * The kernels run inside whole-stage codegen as one static call on
  * primitive arrays.
  */
abstract class VectorFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<double>, array<double>), got $other")
    }

  /** The static kernel, by JVM name — must accept (ArrayData, ArrayData)
    * and return a boxed Double (null for null-element/length-mismatch).
    */
  protected def kernel: String

  protected def compute(a: ArrayData, b: ArrayData): java.lang.Double

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("fold")
      s"""
         |java.lang.Double $tmp = $kernel($a, $b);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** In-order dot product of two double arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorFold {
  override protected def kernel: String = "graft.plans.VectorOps.dot"
  override protected def compute(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorOps.dot(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "vec_dot"
}

/** In-order squared Euclidean distance of two double arrays. */
case class L2SqDist(left: Expression, right: Expression) extends VectorFold {
  override protected def kernel: String = "graft.plans.VectorOps.l2sq"
  override protected def compute(a: ArrayData, b: ArrayData): java.lang.Double =
    VectorOps.l2sq(a, b)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2SqDist =
    copy(left = l, right = r)
  override def prettyName: String = "vec_l2sq"
}

object VectorOps {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Shared by interpreted eval and generated code. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def l2sq(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Column-API entry points (Spark 4 Column <-> Expression bridge). */
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def vecL2Sq(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqDist(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
