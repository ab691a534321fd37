package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (SURVEY.md §7): registers the custom Catalyst
  * expressions as SQL functions so `spark.sql("... simhash64(x) ...")`
  * works, via `SparkSession.builder.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "simhash64" -> (
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash fingerprint"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    "minhash_sig" -> (
      info("minhash_sig", "minhash_sig(array<string>, k) - k-slot MinHash signature"),
      (exprs: Seq[Expression]) => {
        val k = exprs(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(s"k must be a literal int, got $other")
        }
        MinHashSig(exprs.head, k)
      }),
  )

  /** Register into an existing session (tests / REPL convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, (i, builder)) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
}
