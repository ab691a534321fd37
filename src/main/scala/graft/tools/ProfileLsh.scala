package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.{Hashes, Texts}
import graft.sources.Tables

/** Scratch profiler for the LSH dedup pipeline stages. */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, dir)
    val toks = docs.select(col("doc_id"),
      array_distinct(Texts.shingles(col("text"), 1)).as("sh"))
      .filter(size(col("sh")) > 0)
    time("toks.count")(toks.count())
    val sig = toks.withColumn("sig", Hashes.minhashSignature(col("sh"), 64))
      .select(col("doc_id"), col("sig"))
    time("sig.count")(sig.count())
    val banded = sig
      .select(col("doc_id"), col("sig"), explode(sequence(lit(0), lit(15))).as("band"))
      .withColumn("bkey", xxhash64(slice(col("sig"), col("band") * 4 + 1, lit(4)), col("band")))
      .select(col("doc_id"), col("band"), col("bkey"))
    time("banded.count")(banded.count())
    val anchors = banded.groupBy(col("band"), col("bkey")).agg(min(col("doc_id")).as("anchor"))
    println(anchors.queryExecution.optimizedPlan.treeString.take(6000))
    time("anchors.count")(anchors.count())
    val candidates = banded.join(anchors, Seq("band", "bkey"))
      .filter(col("doc_id") > col("anchor"))
      .select(col("anchor"), col("doc_id")).distinct()
    time("candidates.count")(candidates.count())
    val verified = candidates
      .join(toks.select(col("doc_id").as("anchor"), col("sh").as("ta")), Seq("anchor"))
      .join(toks.select(col("doc_id"), col("sh").as("tb")), Seq("doc_id"))
      .withColumn("jaccard", round(Hashes.jaccardSet(col("ta"), col("tb")), 6))
      .filter(col("jaccard") >= 0.9)
    time("verified.count")(verified.count())
    spark.stop()
  }
}
