package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq((1L, "hello world"), (2L, ""))
    .toDF("id", "payload_s")
    .withColumn("payload", col("payload_s").cast("binary"))

  test("media metadata struct: byte length, crc, sha") {
    val r = Multimodal.withMediaMetadata(media, "payload")
      .select(col("id"), col("media_meta.n_bytes"), col("media_meta.sha"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(r(1L)._1 === 11)
    assert(r(1L)._2 === "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9")
    assert(r(2L)._1 === 0)
  }

  test("stub feature extraction is deterministic and batch-shaped") {
    val f = Multimodal.withStubFeatures(media, "payload", dim = 4)
      .filter(col("id") === 1L).select("features").head().getSeq[Double](0)
    // 'h','e','l','l' = 104,101,108,108 scaled by /255
    assert(f.size === 4)
    assert(math.abs(f(0) - 104.0 / 255.0) < 1e-9)
    assert(math.abs(f(3) - 108.0 / 255.0) < 1e-9)
  }

  test("resize truncates long vectors and zero-pads short ones") {
    val df = Seq(Seq(1.0, 2.0, 3.0)).toDF("features")
    val shrunk = df.select(Multimodal.resizeFeatures(col("features"), 2)).head().getSeq[Double](0)
    val grown = df.select(Multimodal.resizeFeatures(col("features"), 5)).head().getSeq[Double](0)
    assert(shrunk === Seq(1.0, 2.0))
    assert(grown === Seq(1.0, 2.0, 3.0, 0.0, 0.0))
  }

  test("mapPartitions decode seam agrees with the expression stub") {
    val viaExpr = Multimodal.withStubFeatures(media.filter(col("id") === 1L), "payload", dim = 4)
      .select("features").head().getSeq[Double](0)
    val viaPart = Multimodal.decodeViaMapPartitions(media, "id", "payload", dim = 4)
      .filter(col("id") === 1L).select("features").head().getSeq[Double](0)
    assert(viaPart === viaExpr)
    // empty payload: zero-padded, not null/crash
    val empty = Multimodal.decodeViaMapPartitions(media, "id", "payload", dim = 4)
      .filter(col("id") === 2L).select("features").head().getSeq[Double](0)
    assert(empty === Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("decode paths agree on payloads shorter than dim (zero-pad contract)") {
    // "ab" = 2 bytes against dim 4: positions 2-3 must be 0.0 on BOTH seams
    val short = Seq((1L, "ab"), (2L, "")).toDF("id", "payload_s")
      .withColumn("payload", col("payload_s").cast("binary"))
    for (id <- Seq(1L, 2L)) {
      val viaExpr = Multimodal.withStubFeatures(short, "payload", dim = 4)
        .filter(col("id") === id).select("features").head().getSeq[Double](0)
      val viaPart = Multimodal.decodeViaMapPartitions(short, "id", "payload", dim = 4)
        .filter(col("id") === id).select("features").head().getSeq[Double](0)
      assert(viaExpr === viaPart, s"short-payload divergence for id=$id")
      assert(viaExpr.length === 4 && !viaExpr.exists(_.isNaN))
    }
    val f1 = Multimodal.withStubFeatures(short, "payload", dim = 4)
      .filter(col("id") === 1L).select("features").head().getSeq[Double](0)
    assert(f1 === Seq('a'.toInt / 255.0, 'b'.toInt / 255.0, 0.0, 0.0))
  }

  test("frame sampling yields one row per stride") {
    val frames = Multimodal.sampledFrames(media, "id", "payload", stride = 4)
      .filter(col("id") === 1L).collect().map(_.getInt(1)).sorted
    assert(frames.toSeq === Seq(0, 1, 2)) // 11 bytes / stride 4 -> frames 0..2
  }
}
