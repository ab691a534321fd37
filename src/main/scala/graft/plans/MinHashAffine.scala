package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Portable 8-slot affine MinHash signature of a token array — custom
  * Catalyst expression (ladder step (b), SURVEY.md §2.10; optimization
  * round 17).
  *
  * Slot i of token t = min over tokens of `(a_i * h(t) + b_i) % prime`,
  * where `h(t) = conv(substring(md5(t), 1, 8), 16, 10)` — the md5-
  * derived 32-bit token hash every md5-capable engine can replay (the
  * q88 portability contract; the DuckDB oracles re-derive each slot
  * with the same constants). Arithmetic is Java long multiply/add/rem —
  * exactly the built-in `Multiply`/`Add`/`Remainder` semantics of the
  * HOF form it replaces, token order irrelevant (min is commutative).
  *
  * Why not the explode+groupBy form ([[graft.operators.Dedup
  * .portableMinhashSignatures]]'s original shape): exploding tokens
  * materializes |tokens| rows and runs a hash aggregate per doc —
  * partial aggregation keeps the shuffle small, but the explode +
  * aggregate machinery dominated the signature stage, and the
  * md5/affine math ran through interpreted HOF lambdas in the narrow
  * q113 variant. This kernel is ONE pass over the token array per row:
  * md5 once per token (thread-local digest), then k running minima in
  * primitive longs — no explode, no shuffle, whole-stage codegen.
  *
  * Null ARRAY -> null; null ELEMENTS contribute nothing; an array with
  * no non-null element -> null (callers filter empty-token docs first,
  * matching the explode form's "no row" contract). DedupSimilaritySpec
  * pins kernel ≡ explode+agg over real corpus text.
  */
case class MinHashAffine(child: Expression, multipliers: Seq[Long],
                         offsets: Seq[Long], prime: Long)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _)
        if multipliers.nonEmpty && multipliers.size == offsets.size =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"minhash_affine requires array<string> and aligned perms, got $other")
    }

  private lazy val as: Array[Long] = multipliers.toArray
  private lazy val bs: Array[Long] = offsets.toArray

  override def nullSafeEval(input: Any): Any =
    MinHashAffine.compute(input.asInstanceOf[ArrayData], as, bs, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mults", as, "long[]")
    val bRef = ctx.addReferenceObj("offs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.MinHashAffine.compute($c, $aRef, $bRef, ${prime}L);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashAffine =
    copy(child = newChild)

  override def prettyName: String = "minhash_affine"
}

object MinHashAffine {
  import org.apache.spark.sql.graft.ColumnBridge

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by interpreted eval and generated code (static call target). */
  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long],
              prime: Long): ArrayData = {
    val n = arr.numElements()
    val k = as.length
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val d = md5.get()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        d.reset()
        val dig = d.digest(arr.getUTF8String(i).getBytes)
        val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
          ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % prime
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  def minhashAffine(tokens: Column, perms: Seq[(Long, Long)],
                    prime: Long): Column =
    ColumnBridge.column(MinHashAffine(ColumnBridge.expression(tokens),
      perms.map(_._1), perms.map(_._2), prime))
}
