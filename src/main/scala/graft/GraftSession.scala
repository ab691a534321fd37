package graft

import org.apache.spark.sql.SparkSession

/** Single place where engine session policy is decided (SURVEY.md §7):
  *
  *   - UTC session timezone — oracle (DuckDB) parity for all date/time math.
  *   - ANSI mode stays ON (Spark 4 default): it matches the oracle's SQL
  *     semantics; every "coerce to null" site in the engine uses the `try_`
  *     function family instead of disabling ANSI globally.
  *   - AQE on: runtime re-planning (skew joins, coalesced shuffle partitions)
  *     is the 100 TB posture — plans are written declaratively and the
  *     runtime picks partitioning from real stats.
  *   - shuffle partitions default to the local core count for the test
  *     harness; on a real cluster this is overridden by the submitter (AQE
  *     coalescing makes the initial number non-critical).
  */
object GraftSession {
  def builder(master: String = s"local[${defaultCpus}]"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", defaultCpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")

  def defaultCpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
