package graft.tools
import org.apache.spark.sql.SparkSession

/** Single-query timing harness for plan-reshape A/B runs: warms up once,
  * then prints 5 timed executions (same session config as Bench). Usage:
  * `sbt "runMain graft.tools.TimeOne q113_neardup_decontam [sfDir]"` —
  * Bench times all 128 queries, which is too slow a feedback loop when
  * iterating on one.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-t1-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val fn = graft.SparkEntry.queries(name)
    // same action as Bench: run the query's own plan, all columns (a
    // df.count() here lets the count rewrite prune/eliminate the work)
    def materialize(): Unit = fn(spark, sfDir).queryExecution.toRdd.count()
    // same per-rep hygiene as Bench: queries with internal
    // localCheckpoint barriers (q113/q135/q136...) persist RDD blocks
    // that outlive the run — without the unpersist, rep 5 times against
    // ~5 generations of dead executor storage (the r6 11% drift effect),
    // biasing exactly the min-of-5 this tool exists to report
    def clearSweepState(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
    }
    materialize(); clearSweepState()
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); materialize()
      val dt = (System.nanoTime() - t0) / 1e9
      clearSweepState() // untimed: between-rep cleanup, not query work
      dt
    }
    println(f"TIMES ${ts.map(t => f"$t%.3f").mkString(",")} min=${ts.min}%.3f")
    spark.stop()
  }
}
