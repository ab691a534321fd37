package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession

/** Debug aid: print the Bench-normalized canonicalized plan of one query
  * (args: queryName [sfDir]) — for diffing plan-hash instabilities
  * across processes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q116_dynamic_pruning")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-bench-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // mimic Bench: warm-up + 3 timed invocations, hash the LAST
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    var df: org.apache.spark.sql.DataFrame = null
    (1 to 3).foreach { _ =>
      df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count()
    }
    val planStr = df.queryExecution.optimizedPlan.canonicalized
      .toString.replaceAll("@[0-9a-f]+", "@id")
      .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+", "\\$\\$Lambda")
      .replaceAll("graft-bench-wh[0-9a-zA-Z]*", "graft-bench-wh")
      .replaceAll("partitioning\\(([^()]*?),\\s*\\d+\\)", "partitioning($1, N)")
    println("=====PLAN START=====")
    println(planStr)
    println("=====PLAN END=====")
    spark.stop()
  }
}
