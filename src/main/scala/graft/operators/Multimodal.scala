package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing ([ext], SURVEY.md §2.8): media payloads are
  * opaque `binary` columns + a typed metadata struct. The Spark-side
  * contract (schema, partitioning, batch shape) is real; the actual
  * image/audio DECODE step is a clearly-marked deterministic STUB — the
  * codec libraries are not in this environment, and a real decoder would
  * slot into the same expression/mapPartitions seam.
  */
object Multimodal {

  /** Attach payload metadata: byte size, CRC-32, SHA-256. Pure codegen'd
    * expressions — computing these at 100 TB is one narrow scan.
    */
  def withMediaMetadata(df: DataFrame, binCol: String): DataFrame =
    df.withColumn("media_meta", struct(
      octet_length(col(binCol)).as("n_bytes"),
      crc32(col(binCol)).as("crc"),
      sha2(col(binCol), 256).as("sha")))

  /** STUB decode: a deterministic fake "feature extraction" — the first
    * `dim` bytes of the payload scaled to [0,1]. A real image decoder
    * (JPEG -> pixels -> embedding) replaces exactly this expression (or a
    * mapPartitions over the binary payloads for heavyweight codecs);
    * schema and batch shape stay identical.
    *
    * The hex string is aliased to an attribute FIRST: referencing an
    * expensive expression inside a `transform` lambda re-evaluates it per
    * element after CollapseProject inlining (same trap as MinHashSig).
    *
    * Payloads shorter than `dim` (and null payloads) yield 0.0 for the
    * missing byte positions — the same zero-padding contract as
    * [[decodeViaMapPartitions]], so the two seams agree on every input.
    */
  def withStubFeatures(df: DataFrame, binCol: String, dim: Int = 8): DataFrame =
    df.withColumn("__hex", hex(substring(col(binCol), 1, dim)))
      .withColumn("features",
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(
            conv(substring(col("__hex"), i * 2 + 1, lit(2)), 16, 10)
              .cast("double") / 255.0,
            lit(0.0))))
      .drop("__hex")

  /** The heavyweight-codec seam: per-partition typed decode via
    * mapPartitions — where a real JNI/JavaCV/FFmpeg decoder slots in
    * (the handle is created ONCE per partition, amortizing codec init
    * across that partition's rows; per-row init is the classic
    * mapPartitions-vs-map mistake). The STUB decode is the same
    * deterministic byte-scaling as [[withStubFeatures]], and the spec
    * asserts the two paths agree — swapping in a real decoder changes
    * only the inner function, never the schema or partitioning.
    */
  def decodeViaMapPartitions(df: DataFrame, idCol: String, binCol: String,
                             dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real decoder handle would be constructed HERE, once per partition
        it.map { case (id, bytes) =>
          val feats = Array.tabulate(dim) { i =>
            if (bytes != null && i < bytes.length) (bytes(i) & 0xff) / 255.0 else 0.0
          }
          (id, feats)
        }
      }
      .toDF(idCol, "features")
  }

  /** Deterministic per-pixel PNG fixture (lossless, so decoded pixels
    * are exact literals) — the generalization of [[solidPng]] used by
    * the perceptual-dedup fixtures (gradients, planted perturbations).
    */
  def pixelPng(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic solid-color PNG fixture — shared by the q105 oracle
    * query and MultimodalSpec so the two always validate the same byte
    * stream.
    */
  def solidPng(w: Int, h: Int, rgb: Int): Array[Byte] =
    pixelPng(w, h, (_, _) => rgb)

  /** PERCEPTUAL fingerprint (dHash, the standard published recipe:
    * grayscale → downsample to a 9×8 luminance grid → one bit per
    * horizontal neighbor pair, set iff the right cell is brighter):
    * near-identical images — recompressions, small edits, minor
    * crops — land within a few bits of each other, while distinct
    * images differ in ~32, so Hamming distance over the 64-bit hash is
    * the image near-dup metric (the text analog is SimHash, q28).
    *
    * Runs through the SAME mapPartitions decode seam as
    * [[decodeImages]] (JDK ImageIO — a heavier codec swaps in with a
    * per-partition handle): decode, Rec.601 luminance, area-average
    * binning into the 9×8 grid (each source pixel accumulates into bin
    * (x·9/w, y·8/h) — integer binning, so the mapping is exact and
    * engine-free), then bit r·8+c compares bin (r, c+1) > (r, c).
    * Undecodable, null, or sub-grid (< 9×8) payloads yield a NULL
    * hash — corrupt bytes are data, not exceptions. One narrow pass;
    * the 100 TB shape is scan → 8-byte hash, nothing else shuffles.
    */
  def dHash64(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth < 9 || img.getHeight < 8)
            (id, Option.empty[Long])
          else {
            val w = img.getWidth
            val h = img.getHeight
            val sums = Array.ofDim[Double](8, 9)
            val counts = Array.ofDim[Long](8, 9)
            var y = 0
            while (y < h) {
              val ty = (y.toLong * 8 / h).toInt
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val tx = (x.toLong * 9 / w).toInt
                sums(ty)(tx) += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                counts(ty)(tx) += 1
                x += 1
              }
              y += 1
            }
            var hash = 0L
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 8) {
                if (sums(r)(c + 1) / counts(r)(c + 1) >
                    sums(r)(c) / counts(r)(c))
                  hash |= 1L << (r * 8 + c)
                c += 1
              }
              r += 1
            }
            (id, Some(hash))
          }
        }
      }
      .toDF(idCol, "phash")
  }

  /** REAL image decode through the same mapPartitions seam as the stub:
    * `javax.imageio` is JDK-builtin (no external codec jars needed), so
    * PNG/JPEG/GIF/BMP payloads decode to actual pixels here. Emits
    * (id, width, height, mean_luma) with mean_luma the Rec.601 luminance
    * averaged over all pixels, in [0, 1]. Undecodable or null payloads
    * yield null columns — at 100 TB corrupt bytes are DATA, not
    * exceptions; a task must not die on one bad file. Heavier codecs
    * (video/audio) swap into the same seam with a per-partition handle,
    * exactly as [[decodeViaMapPartitions]] documents.
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else
              // NonFatal, not just IOException: malformed images also
              // throw RuntimeExceptions (CMMException on corrupt ICC
              // profiles, ArrayIndexOutOfBounds from truncated GIFs) —
              // all of them are data, none may kill the task
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) (id, Option.empty[Int], Option.empty[Int], Option.empty[Double])
          else {
            val w = img.getWidth
            val h = img.getHeight
            var sum = 0.0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            (id, Some(w), Some(h), Some(sum / (w.toLong * h * 255.0)))
          }
        }
      }
      .toDF(idCol, "width", "height", "mean_luma")
  }

  /** Luminance-histogram image embedding through the REAL ImageIO seam
    * (the [[dHash64]] convention — mapPartitions is correct here: a JDK
    * codec call, no Expression fits): decode, Rec.601 luminance per
    * pixel, `bins` equal-width buckets over [0, 256) as raw counts
    * (`array<double>` — cosine is scale-invariant, so no normalization
    * pass). Undecodable/null payloads yield a NULL vector — corrupt
    * bytes are data, not exceptions. A learned image encoder (CLIP
    * image tower) swaps into exactly this seam with a per-partition
    * model handle; schema and batch shape stay identical. One narrow
    * pass; at 100 TB the shape is scan → `bins` doubles, nothing else
    * shuffles.
    */
  def lumaHistogram(df: DataFrame, idCol: String, binCol: String,
                    bins: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) (id, Option.empty[Seq[Double]])
          else {
            val h = new Array[Double](bins)
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                val luma = 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                val b = math.min((luma * bins / 256.0).toInt, bins - 1)
                h(b) += 1.0
                x += 1
              }
              y += 1
            }
            (id, Some(h.toSeq))
          }
        }
      }
      .toDF(idCol, "img_v")
  }

  /** MULTIMODAL PAIR GATE — the CLIP-filtering shape (LAION's recipe:
    * embed image and caption into one space, keep pairs whose cosine
    * clears a threshold) with deterministic proxy towers: the image
    * side is the [[lumaHistogram]] through the real decode seam, the
    * text side the q156 hashed-BOW ([[Rag.hashedBow]]) over the
    * caption tokens, both `dim`-dimensional. The PLUMBING is the
    * product — paired binary + text columns, two embedding seams, a
    * per-pair cosine, a threshold decision; swapping in real CLIP
    * towers changes only the two encoder seams. Pairs whose image
    * fails to decode gate NULL (cosine and keep) — undecodable data
    * must be inspectable, not silently dropped. One narrow pass per
    * side + a doc-keyed join; nothing shuffles but (id, vector).
    */
  def pairAlignmentGate(pairs: DataFrame, idCol: String, binCol: String,
                        textCol: String, dim: Int = 8,
                        minCos: Double = 0.9): DataFrame = {
    val img = lumaHistogram(pairs, idCol, binCol, dim)
    val txt = pairs.select(col(idCol),
      Rag.hashedBow(graft.functions.Texts.tokens(col(textCol)), dim).as("txt_v"))
    img.join(txt, Seq(idCol))
      .withColumn("cosine",
        round(graft.functions.Vectors.cosine(col("img_v"), col("txt_v")), 6))
      .select(col(idCol), col("cosine"), (col("cosine") >= minCos).as("keep"))
  }

  /** STUB resize: fix a feature vector to `n` dims — truncate long,
    * zero-pad short (what an image-resize step does to the model-input
    * shape; a real resampler replaces the expression).
    */
  def resizeFeatures(features: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => coalesce(try_element_at(features, i + 1), lit(0.0))) // ANSI: element_at throws OOB

  /** STUB frame sampling for "video"-shaped payloads: every `stride`-th
    * byte as one "frame" id. Real frame extraction replaces the
    * expression; the explode/partitioning shape is what is being tested.
    */
  def sampledFrames(df: DataFrame, idCol: String, binCol: String, stride: Int = 64): DataFrame =
    df.select(col(idCol),
        explode(sequence(lit(0),
          floor((octet_length(col(binCol)) - 1) / stride).cast("int"))).as("frame_no"))
}
