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

  test("decodeImages decodes real PNG bytes to pixel-accurate dims and luminance") {
    import Multimodal.{solidPng => png}
    val rows = Seq(
      (0L, png(3, 2, 0xff0000)),              // solid red
      (1L, png(4, 4, 0x808080)),              // solid gray 128
      (2L, "not an image".getBytes("UTF-8")), // corrupt: null columns, no crash
      (3L, null.asInstanceOf[Array[Byte]]))   // null payload
      .toDF("id", "payload")
    val r = Multimodal.decodeImages(rows, "id", "payload")
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)), Option(x.get(2)), Option(x.get(3)))).toMap
    assert(r(0L)._1 === Some(3) && r(0L)._2 === Some(2))
    // Rec.601 luma of pure red: 0.299 exactly (PNG is lossless)
    assert(math.abs(r(0L)._3.get.asInstanceOf[Double] - 0.299) < 1e-12)
    assert(r(1L)._1 === Some(4) && r(1L)._2 === Some(4))
    assert(math.abs(r(1L)._3.get.asInstanceOf[Double] - 128.0 / 255.0) < 1e-9)
    assert(r(2L) === ((None, None, None)))
    assert(r(3L) === ((None, None, None)))
  }

  test("luma histogram and pair gate: closed-form bins, aligned/misaligned/corrupt") {
    import Multimodal.{pixelPng, solidPng}
    def gray(g: Int) = (g << 16) | (g << 8) | g
    val rows: Seq[(Long, Array[Byte], String)] = Seq(
      (0L, solidPng(4, 4, gray(16)), "coal dog sea"),       // aligned: cosine 1
      (1L, solidPng(4, 4, gray(16)), "snow moon beam"),     // orthogonal: cosine 0
      (2L, pixelPng(4, 4, (x, _) => if (x < 2) gray(16) else gray(240)),
        "coal moon ash"),                                    // 3/sqrt(10)
      (3L, Array[Byte](9, 9, 9), "coal dog sea"))            // corrupt: null
    val pairs = rows.toDF("pair_id", "payload", "caption")
    val hist = Multimodal.lumaHistogram(pairs, "pair_id", "payload")
      .collect().map(r => r.getLong(0) ->
        Option(r.getSeq[Double](1)).map(_.toSeq)).toMap
    assert(hist(0L) === Some(Seq(16.0, 0, 0, 0, 0, 0, 0, 0)))
    assert(hist(2L) === Some(Seq(8.0, 0, 0, 0, 0, 0, 0, 8.0)))
    assert(hist(3L) === None)
    val gate = Multimodal.pairAlignmentGate(pairs,
        "pair_id", "payload", "caption", dim = 8, minCos = 0.9)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Boolean]))).toMap
    assert(gate(0L) === ((Some(1.0), Some(true))))
    assert(gate(1L) === ((Some(0.0), Some(false))))
    assert(gate(2L)._1.get === BigDecimal(3.0 / math.sqrt(10.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(gate(2L)._2 === Some(true))
    assert(gate(3L) === ((None, None)))
  }

  test("frame sampling yields one row per stride") {
    val frames = Multimodal.sampledFrames(media, "id", "payload", stride = 4)
      .filter(col("id") === 1L).collect().map(_.getInt(1)).sorted
    assert(frames.toSeq === Seq(0, 1, 2)) // 11 bytes / stride 4 -> frames 0..2
  }

  test("dHash: scale-invariant on block upsampling, null on corrupt/small payloads") {
    import Multimodal.pixelPng
    def gray(g: Int) = (g << 16) | (g << 8) | g
    val rows = Seq(
      (0L, pixelPng(9, 8, (x, _) => gray(x * 20))),          // base ramp
      // the same ramp rendered at 2x: every 9x8 cell area-averages a
      // constant 2x2 block back to the base value — dHash must be
      // IDENTICAL (the perceptual point: resizing preserves the hash)
      (1L, pixelPng(18, 16, (x, _) => gray((x / 2) * 20))),
      (2L, "not an image".getBytes("UTF-8")),                // corrupt
      (3L, null.asInstanceOf[Array[Byte]]),                  // null payload
      (4L, pixelPng(4, 4, (x, _) => gray(x * 20))))          // below the 9x8 grid
      .toDF("id", "payload")
    val h = Multimodal.dHash64(rows, "id", "payload")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(h(0L) === Some(-1L)) // strictly increasing ramp: all 64 bits
    assert(h(1L) === h(0L))
    assert(h(2L) === None && h(3L) === None && h(4L) === None)
  }
}
