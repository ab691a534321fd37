package graft.tools
import org.apache.spark.sql.SparkSession

/** Print one query's rows — the fast feedback loop for verdict
  * queries (TimeOne materializes but never shows the booleans).
  * Usage: `sbt "runMain graft.tools.ShowOne q203_delete_where [sfDir]"`.
  */
object ShowOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-s1-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir).show(500, truncate = false)
    spark.stop()
  }
}
