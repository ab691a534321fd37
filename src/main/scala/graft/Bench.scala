package graft
import java.nio.file.Files
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // per-process warehouse: layout queries (q104/q116/...) saveAsTable
      // by fixed names — a shared ./spark-warehouse lets a concurrent
      // test/verify JVM clobber this process's table files mid-read
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-bench-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen/parquet-reader classes load once here so the
    // first timed query isn't charged ~5 s of cold-start.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Steady-state timing: one untimed run pays plan compilation + janino
    // codegen (~0.3 s/query), then best-of-3 timed runs damps GC/scheduler
    // noise (the r4 q09/q01/q60 "regressions" were exactly this noise —
    // all three reverted with no code change). Queries run in name order
    // for stable output.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm-up: compile + codegen + page cache
        var lastDf: org.apache.spark.sql.DataFrame = null
        // the capped quadratic recall oracles (q25/q26) are the noisiest
        // timings in the suite (one big nested-loop task — scheduler
        // jitter dominates); best-of-5 instead of 3 pins their drift
        val reps = if (name.startsWith("q25") || name.startsWith("q26")) 5 else 3
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          df.count()
          lastDf = df
          (System.nanoTime() - t0) / 1e9
        }
        // canonicalized optimized-plan hash: exprIds normalized, so the
        // hash is stable run-over-run and changes iff the PLAN changes —
        // separates "code reshaped the plan" from scheduler noise when
        // diffing BENCH_r{N}.json round-over-round. Typed-Aggregator
        // nodes print object identity (`$$anon$1@1f2e3d`) and typed ops
        // print lambda hidden-class addresses (`$$Lambda$2524/0x7f67...`)
        // — normalize both, they change per JVM, not per plan.
        // hash the LAST timed run's plan — re-invoking fn here would pay
        // a whole extra untimed execution for eager builders (q104's
        // table writes, q106's observed noop write, q109's CC loop)
        // the per-process temp warehouse dir leaks into scan locations
        // (q116's partitioned table) — normalize it or the hash flips
        // every run with no plan change
        // partition COUNTS are normalized too: a localCheckpoint's
        // LogicalRDD records the AQE-coalesced partition count of the
        // materialized frame, which depends on measured sizes at the
        // runtime coalesce boundary — q108's hash flipped between runs
        // of identical code. Structure still hashes; counts don't.
        val planStr = lastDf.queryExecution.optimizedPlan.canonicalized
          .toString.replaceAll("@[0-9a-f]+", "@id")
          .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+", "\\$\\$Lambda")
          .replaceAll("graft-bench-wh[0-9a-zA-Z]*", "graft-bench-wh")
          .replaceAll("partitioning\\(([^()]*?),\\s*\\d+\\)", "partitioning($1, N)")
          // partitionings whose toString has no expression list (no comma)
          // slip past the regex above: RoundRobinPartitioning(32),
          // UnknownPartitioning(5) — counts are runtime facts, not plan
          .replaceAll("Partitioning\\(\\d+\\)", "Partitioning(N)")
        val planHash = java.security.MessageDigest.getInstance("MD5")
          .digest(planStr.getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
        name -> (times.min, planHash, planStr)
      } catch { case _: Throwable => name -> (-1.0, "err", "") }
    }.toMap
    // 4-decimal rounding keeps the stdout line compact (the r3 line was
    // long enough to get tail-truncated in the driver's log capture)
    def r4(v: Double): String = if (v < 0) "-1" else f"$v%.4f"
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, (v, _, _)) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val plans = results.toSeq.sortBy(_._1)
      .map { case (k, (_, h, _)) => s"\"" + k + "\":\"" + h + "\"" }
      .mkString("{", ",", "}")
    // full normalized plan STRINGS, one artifact per bench run: the hash
    // tells you THAT a plan changed; this is what you diff to see WHY.
    // Two hashes (q108/q116) flipped across sessions with identical code
    // and no string to compare — never lose that evidence again.
    val planDump = results.toSeq.sortBy(_._1)
      .map { case (k, (_, h, s)) => s"##### $k $h\n$s" }.mkString("\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "/root/repo/BENCH_PLANS_LATEST.txt")),
      planDump + "\n")
    val total = if (results.nonEmpty) results.values.map(_._1).filter(_ > 0).sum else 0.0
    val json = s"""{"metric":"total","value":${r4(total)},"unit":"sec","queries":$qs,"plans":$plans,"sf":"$sfDir"}"""
    println(json)
    // machine-readable artifact: same JSON, immune to log truncation, so
    // per-query timings can be diffed round-over-round
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(
        sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LATEST.json")),
      json + "\n")
    spark.stop()
  }
}
