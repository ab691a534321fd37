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

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => CollapseRound)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL MERGE INTO / UPDATE on graft tables (round 17): claim the
    // resolved nodes after the Resolution batch — Spark's own
    // row-level rewrite only claims SupportsRowLevelOperations tables,
    // and post-hoc runs before CheckAnalysis would reject the rest
    ext.injectPostHocResolutionRule(s => graft.sources.GraftSqlWrites(s))
    ext.injectPlannerStrategy(_ => graft.sources.GraftSqlWriteStrategy)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  val functions: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "simhash64" -> (
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash fingerprint"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"simhash64(tokens) expects exactly 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }),
    "minhash_sig" -> (
      info("minhash_sig", "minhash_sig(array<string>, k) - k-slot MinHash signature"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"minhash_sig(tokens, k) expects exactly 2 arguments, got ${exprs.length}")
        val k = exprs(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(s"k must be a literal int, got $other")
        }
        MinHashSig(exprs.head, k)
      }),
    // portable_unit(id, salt) — the cross-engine md5 hash in [0,1)
    // behind sampling/split membership (Sampling.portableUnit). Built as
    // an explicit catalyst tree: an injected function must return a
    // RESOLVED Expression (a composed Column is an unresolved node tree
    // that never re-enters analysis from here). The ScaleOpsSpec
    // SQL-vs-Column test guards the two formulations against drift.
    "portable_unit" -> (
      info("portable_unit", "portable_unit(id, salt) - engine-portable uniform hash in [0,1)"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Cast, Concat, Conv, Divide, Literal, Md5, Substring}
        import org.apache.spark.sql.types.{BinaryType, DoubleType, StringType}
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"portable_unit(id, salt) expects exactly 2 arguments, got ${exprs.length}")
        val salt = exprs(1).eval() match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(s"salt must be a literal string, got $other")
        }
        val hex = Md5(Cast(Concat(Seq(
          Cast(exprs.head, StringType), Literal(":" + salt))), BinaryType))
        Divide(
          Cast(Conv(Substring(hex, Literal(1), Literal(8)), Literal(16), Literal(10)), DoubleType),
          Literal(4294967296.0))
      }),
  )

  /** Register into an existing session (tests / REPL convenience). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    functions.foreach { case (name, (i, builder)) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), i, builder)
    }
    // runtime analog of injectOptimizerRule for already-built sessions
    if (!spark.experimental.extraOptimizations.contains(CollapseRound))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CollapseRound
    // runtime analog of injectPlannerStrategy
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraStrategies
        .contains(graft.sources.GraftSqlWriteStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.sources.GraftSqlWriteStrategy
    // NOTE: the SQL MERGE/UPDATE post-hoc resolution rule has no
    // runtime injection point — sessions that need the SQL write
    // surface must carry spark.sql.extensions=graft.plans.GraftExtensions
    // (Verify/Bench/SharedSpark all do)
  }
}
