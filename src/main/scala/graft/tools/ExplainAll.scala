package graft.tools

import graft.SparkEntry

/** Dump formatted physical plans for selected queries (plan audit). */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
