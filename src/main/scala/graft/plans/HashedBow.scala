package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Hashed bag-of-words histogram of a token array — custom Catalyst
  * expression (ladder step (b), SURVEY.md §2.10; optimization round 17).
  *
  * Replaces [[graft.operators.Rag.hashedBowHof]]'s
  * `aggregate(transform(toks, md5-bucket), zeros, (acc, b) ->
  * transform(acc, ...))` form, which is bit-identical but pays the
  * interpreted-HOF tax TWICE per token: the fold lambda allocates a
  * fresh `dim`-element array per token and the inner `transform` walks
  * it with boxed doubles (HOFs are CodegenFallback — no codegen, no
  * subexpression caching). This kernel is one pass over the tokens with
  * a primitive `double[dim]` accumulator and a thread-local MD5.
  *
  * Value-identical by construction: bucket(t) =
  * `conv(substring(md5(t), 1, 8), 16, 10) % dim` — the first 4 digest
  * bytes read as an unsigned 32-bit integer, mod dim (non-negative, so
  * `pmod` == `%`), exactly the HOF's and the DuckDB oracle's
  * `('0x' || substr(md5(t), 1, 8))::BIGINT % dim`. Null ARRAY -> null
  * (the HOF aggregate over a null array); null ELEMENT contributes
  * nothing (the HOF's `when(i === null-bucket)` falls to otherwise);
  * empty array -> the zero vector. RagSpec pins kernel ≡ HOF over real
  * corpus chunks.
  */
case class HashedBow(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if dim > 0 => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"hashed_bow requires array<string> and dim>0, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HashedBow.compute(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.HashedBow.compute($c, $dim);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HashedBow =
    copy(child = newChild)

  override def prettyName: String = "hashed_bow"
}

object HashedBow {
  import org.apache.spark.sql.graft.ColumnBridge

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code (static call target). */
  def compute(arr: ArrayData, dim: Int): ArrayData = {
    val n = arr.numElements()
    val acc = new Array[Double](dim)
    val d = md5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        d.reset()
        val dig = d.digest(arr.getUTF8String(i).getBytes)
        // first 8 hex chars of the digest == first 4 bytes, unsigned
        val v = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        acc((v % dim).toInt) += 1.0
      }
      i += 1
    }
    new GenericArrayData(acc)
  }

  def hashedBow(tokens: Column, dim: Int): Column =
    ColumnBridge.column(HashedBow(ColumnBridge.expression(tokens), dim))
}
