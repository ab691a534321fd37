package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE ENCODE of a token array under a fixed merge list — custom
  * Catalyst expression (ladder step (b), SURVEY.md §2.10).
  *
  * Semantics are EXACTLY [[graft.operators.TextAnalysis.bpeEncode]]'s
  * higher-order-function form (and therefore the DuckDB oracle's
  * `list_reduce` replay): per word — split to code points, then for
  * each merge `(lhs, rhs)` in rank order run one greedy left-to-right
  * non-overlapping fusion pass (the accumulator's LAST symbol fuses
  * with the next symbol exactly when they equal `lhs`/`rhs` as WHOLE
  * symbols) — then flatten the per-word symbol lists in token order.
  * A parity spec in TextsSpec replays the HOF form against this kernel
  * over real corpus data.
  *
  * Why not the HOF form: `aggregate` over an array accumulator
  * evaluates an interpreted lambda per ELEMENT and rebuilds the
  * accumulator array per step (`slice` + `concat` allocate fresh
  * arrays), so one word costs O(merges × len²) allocations under an
  * interpreter — measured 9.0 s for q146 at sf0.1, the slowest query
  * in the bench by 3.4×. This kernel runs the same recurrence as a
  * tight two-buffer loop on plain strings inside whole-stage codegen:
  * O(merges × len) with two small array allocations per word.
  *
  * The merge list rides inside the expression as a bounded driver-side
  * constant (the IVF-centroid / PQ-codebook convention) via
  * `ctx.addReferenceObj`, so the op stays a pure per-row projection —
  * no shuffle, no explode, streaming-composable (PlanSpec guards
  * q146's plan).
  */
case class BpeEncodeTokens(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bpe_encode requires array<string>, got $other")
    }

  // flat (lhs0, rhs0, lhs1, rhs1, ...) — one reference object, plain
  // java.lang.String[] so generated code needs no scala imports
  @transient private lazy val flatMerges: Array[String] =
    merges.iterator.flatMap { case (l, r) => Iterator(l, r) }.toArray

  override def nullSafeEval(input: Any): Any =
    BpeEncodeTokens.encode(input.asInstanceOf[ArrayData], flatMerges)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flatMerges, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.plans.BpeEncodeTokens.encode($c, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeTokens =
    copy(child = newChild)

  override def prettyName: String = "bpe_encode"
}

object BpeEncodeTokens {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Shared by interpreted eval and generated code (static call target).
    * Null tokens are skipped (the tokenizer never emits them); a null
    * input array yields null via nullSafeEval/nullSafeCodeGen.
    */
  def encode(tokens: ArrayData, flatMerges: Array[String]): ArrayData = {
    val nTok = tokens.numElements()
    val out = new java.util.ArrayList[UTF8String]()
    var t = 0
    while (t < nTok) {
      if (!tokens.isNullAt(t)) {
        val w = tokens.getUTF8String(t).toString
        // split to code points (surrogate-pair safe, matching the
        // regex split("")'s code-point boundaries)
        var syms = new java.util.ArrayList[String](w.length)
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          val n = Character.charCount(cp)
          syms.add(w.substring(i, i + n))
          i += n
        }
        // one greedy left-to-right fusion pass per merge, in rank order
        var m = 0
        while (m < flatMerges.length) {
          val lhs = flatMerges(m); val rhs = flatMerges(m + 1)
          val next = new java.util.ArrayList[String](syms.size())
          var j = 0
          while (j < syms.size()) {
            val s = syms.get(j)
            val last = next.size() - 1
            if (last >= 0 && next.get(last) == lhs && s == rhs)
              next.set(last, lhs + rhs)
            else next.add(s)
            j += 1
          }
          syms = next
          m += 2
        }
        var k = 0
        while (k < syms.size()) {
          out.add(UTF8String.fromString(syms.get(k)))
          k += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size())))
  }

  /** Column-API entry point. */
  def bpeEncodeTokens(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeTokens(ColumnBridge.expression(tokens), merges))
}
