package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM-wide SparkSession; suites are
  * read-only over it).
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      // full engine surface incl. the post-hoc SQL-write rule (which
      // has no runtime injection point, unlike functions/strategies)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // per-process warehouse (same rationale as Bench/Verify: fixed-name
      // layout tables must not be shared across concurrent JVMs)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-test-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // same engine surface as Verify/Bench: functions, optimizer rule,
    // planner strategy
    graft.plans.GraftExtensions.register(s)
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
}
