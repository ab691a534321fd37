package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared verdict-query machinery (optimization round 17).
  *
  * The verdict queries decide 5–12 independent booleans each, and until
  * this round every one of them ran as its own sequential driver action
  * — at sf0.1 the top of the bench was verdict queries paying 10–20
  * back-to-back small jobs whose per-job latency (scheduling + one
  * exchange round-trip), not compute, dominated. Two shared levers:
  *
  *   - [[multisetEq]]: the ubiquitous `a.exceptAll(b)
  *     .unionByName(b.exceptAll(a)).count() == 0` equality check costs
  *     TWO full union+aggregate passes (Spark rewrites each exceptAll as
  *     a union with +1/-1 counts and an aggregate over every column)
  *     plus a third job to count. Multiset equality needs ONE
  *     aggregation over a ∪ b: tag each side, sum the tags per row, any
  *     nonzero sum = unequal (guide §2.4 — remove shuffles outright;
  *     same truth value by construction: per-row multiplicities match
  *     iff every signed count sums to zero).
  *
  *   - [[fork]]/[[join]]: independent verdict actions submitted from a
  *     small daemon pool so the local scheduler overlaps their jobs
  *     (guide §2.6 — overlap independent jobs; actions are only
  *     sequential because driver code calls them sequentially). The
  *     booleans are unchanged; only the idle driver-wait between jobs
  *     collapses.
  */
object VerdictOps {

  /** Small fixed pool, daemon threads (must never block JVM exit —
    * Verify/Bench call System-exit-less spark.stop()). 8 concurrent
    * verdict actions is plenty to fill the scheduler without thrashing
    * the 32-core local executor (guide §2.6: "2-3 jobs in flight is
    * plenty" per independent stage; verdict jobs are smaller).
    */
  private lazy val pool: ExecutionContext =
    ExecutionContext.fromExecutorService(
      Executors.newFixedThreadPool(8, (r: Runnable) => {
        val t = new Thread(r, "graft-verdict-par")
        t.setDaemon(true)
        t
      }))

  /** Submit an independent verdict computation; [[join]] collects it.
    * Failures propagate on join (same stack discipline as sequential
    * code — a verdict that throws still fails the query loudly).
    */
  def fork[A](f: => A): Future[A] = Future(f)(pool)

  def join[A](x: Future[A]): A = Await.result(x, Duration.Inf)

  /** Per-`key` symmetric-diff multiplicity count in ONE aggregation
    * pass over a ∪ b — replaces the exceptAll-both-ways → groupBy(key)
    * count shape (two union+aggregate passes, each evaluating BOTH
    * input subtrees). Row-for-row equal by construction: exceptAll
    * both ways emits |c_a − c_b| copies of every distinct row, so its
    * per-key count is Σ|c_a − c_b| — exactly `sum(abs(d))` over the
    * signed per-row counts. Emits one row per key with a nonzero diff
    * (callers left-join + coalesce(0), unchanged).
    */
  def perKeyDiffCount(a: DataFrame, b: DataFrame, key: String,
                      name: String): DataFrame = {
    val names = a.columns.toSeq
    val keys = names.map(col)
    a.select(keys: _*).withColumn("__side", lit(1L))
      .unionByName(b.select(names.map(col): _*).withColumn("__side", lit(-1L)))
      .groupBy(keys: _*).agg(sum(col("__side")).as("__d"))
      .filter(col("__d") =!= 0L)
      .groupBy(col(key)).agg(sum(abs(col("__d"))).as(name))
  }

  /** Multiset equality of two same-schema frames in ONE aggregation
    * pass over a ∪ b (replaces exceptAll-both-ways + count, which pays
    * two union+aggregate passes and a count job for the same boolean).
    * Columns are matched BY NAME (the call sites' unionByName
    * convention); null keys group together, exactly as exceptAll
    * compares them.
    */
  def multisetEq(a: DataFrame, b: DataFrame): Boolean = {
    val names = a.columns.toSeq
    val keys = names.map(col)
    a.select(keys: _*).withColumn("__side", lit(1L))
      .unionByName(b.select(names.map(col): _*).withColumn("__side", lit(-1L)))
      .groupBy(keys: _*).agg(sum(col("__side")).as("__d"))
      .filter(col("__d") =!= 0L)
      .isEmpty
  }
}
