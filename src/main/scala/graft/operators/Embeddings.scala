package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Embedding-matrix statistics and PCA / whitening ([ext]) — the
  * linear-algebra preprocessing step modern training-data pipelines
  * run before semantic dedup and ANN indexing (SemDeDup and retrieval
  * stacks whiten or PCA-reduce embeddings so cosine thresholds mean
  * the same thing across the corpus; see also the IVF/PQ family in
  * [[Similarity]], which consumes these vectors).
  *
  * Scale shape: the ONLY corpus-sized pass is one typed-Aggregator
  * scan whose buffer is the raw Gram accumulator — n, the d
  * coordinate sums, and the d(d+1)/2 upper-triangle second moments
  * (d=64 → 2 145 doubles). Spark plans it like any built-in agg
  * (map-side partials, merge tree), so the shuffle carries ONE buffer
  * per partition and nothing grows with the corpus. Covariance,
  * eigenvectors (cyclic Jacobi — the classic symmetric eigensolver,
  * deterministic rotation order), and the projection matrix are then
  * O(d²)/O(d³) DRIVER-side arithmetic on that bounded state (the
  * IVF-centroid / PQ-codebook bounded-model convention), and
  * projection itself is a narrow per-row expression over the native
  * [[graft.plans.VectorOps]] dot kernel — no shuffle, composes into
  * any scan.
  */
object Embeddings {

  /** Raw Gram state: count, per-coordinate sums, upper-triangle (i<=j,
    * row-major) raw second moments. All finite arithmetic — centering
    * happens once at the end (cov = (g - s·sᵀ/n) / (n-1)), so one pass
    * suffices and no mean pre-pass is needed.
    */
  final case class GramBuf(n: Long, s: Seq[Double], g: Seq[Double])

  private def gramAgg(d: Int): Aggregator[Seq[Double], GramBuf, GramBuf] =
    new Aggregator[Seq[Double], GramBuf, GramBuf] {
      private val tri = d * (d + 1) / 2
      override def zero: GramBuf =
        GramBuf(0L, new Array[Double](d), new Array[Double](tri))
      override def reduce(b: GramBuf, v: Seq[Double]): GramBuf = {
        require(v.length == d, s"expected dim $d, got ${v.length}")
        val x = v.toArray
        val s = b.s.toArray; val g = b.g.toArray
        var i = 0; var t = 0
        while (i < d) {
          s(i) += x(i)
          var j = i
          while (j < d) { g(t) += x(i) * x(j); j += 1; t += 1 }
          i += 1
        }
        GramBuf(b.n + 1, s, g)
      }
      override def merge(a: GramBuf, b: GramBuf): GramBuf =
        GramBuf(a.n + b.n,
          a.s.zip(b.s).map { case (x, y) => x + y },
          a.g.zip(b.g).map { case (x, y) => x + y })
      override def finish(r: GramBuf): GramBuf = r
      override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
      override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    }

  /** One-pass raw Gram state of `vecCol` (array<float|double>, dim d). */
  private def gramOf(emb: DataFrame, vecCol: String, d: Int): GramBuf = {
    val spark = emb.sparkSession
    import spark.implicits._
    emb.select(graft.functions.Vectors.asDouble(col(vecCol)).as("v"))
      .as[Seq[Double]]
      .select(udaf(gramAgg(d)).apply(col("v")).as("gram"))
      .select(col("gram.n"), col("gram.s"), col("gram.g"))
      .as[GramBuf]
      .head() // bounded by contract: one row of O(d²) doubles
  }

  /** Sample covariance matrix of the embedding column as (i, j, cov)
    * rows for the upper triangle i <= j (0-based), cov rounded to 6 —
    * the oracle-checkable face of the Gram pass.
    */
  def covarianceMatrix(emb: DataFrame, vecCol: String, d: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val gb = gramOf(emb, vecCol, d)
    val n = gb.n.toDouble
    val rows = Seq.newBuilder[(Int, Int, Double)]
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = (gb.g(t) - gb.s(i) * gb.s(j) / n) / (n - 1)
        rows += ((i, j,
          java.math.BigDecimal.valueOf(cov)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()))
        j += 1; t += 1
      }
      i += 1
    }
    rows.result().toDF("i", "j", "cov")
  }

  /** Trained PCA model: mean vector, eigenvalues (desc), eigenvectors
    * as rows (unit-norm, matching the eigenvalue order).
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                            components: Array[Array[Double]])

  /** Cyclic Jacobi eigensolver for a symmetric matrix — deterministic
    * (fixed sweep order, threshold-free rotations), O(d³) per sweep,
    * driver-side on the bounded covariance. Returns (values desc,
    * vectors as rows) with a sign convention (largest-|coordinate|
    * entry positive) so the model is reproducible run to run.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]]):
      (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var i = 0
      while (i < d - 1) {
        var j = i + 1
        while (j < d) { off = math.max(off, math.abs(a(i)(j))); j += 1 }
        i += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      // sign convention: the largest-magnitude coordinate is positive
      val m = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(m) < 0) col.map(-_) else col
    }.toArray
    (values, vectors)
  }

  /** Fit PCA on the embedding column: one Gram pass + driver Jacobi. */
  def fitPca(emb: DataFrame, vecCol: String, d: Int): PcaModel = {
    val gb = gramOf(emb, vecCol, d)
    val n = gb.n.toDouble
    val mean = gb.s.map(_ / n).toArray
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = (gb.g(t) - gb.s(i) * gb.s(j) / n) / (n - 1)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(cov)
    PcaModel(mean, values, vectors)
  }

  /** Project (and optionally whiten) the embedding column onto the
    * model's top `k` components. Centering folds into the constant
    * term ((v - μ)·w = v·w - μ·w, with μ·w a driver-side double), so
    * each coordinate is ONE native [[graft.plans.VectorOps]] dot
    * against a component literal — no per-component re-centering (the
    * MinHashSig lesson: CollapseProject inlines a shared centering
    * subtree into every coordinate's lambda, re-evaluating it k
    * times). `vecDouble` must already be `array<double>`
    * ([[graft.functions.Vectors.asDouble]] once, in the caller's
    * projection) for the same reason. Narrow, codegen'd, no shuffle —
    * composes into any scan.
    */
  def pcaProjectCol(vecDouble: Column, model: PcaModel, k: Int,
                    whiten: Boolean = false): Column = {
    val coords = (0 until k).map { c =>
      val comp = model.components(c)
      val compLit = array(comp.map(lit(_)).toSeq: _*)
      var off = 0.0
      var i = 0
      while (i < comp.length) { off += model.mean(i) * comp(i); i += 1 }
      val dot = graft.plans.VectorOps.vecDot(vecDouble, compLit) - lit(off)
      // rank-deficient / near-degenerate data gives Jacobi eigenvalues
      // that are ~0 or slightly negative (float noise); dividing by
      // sqrt of those yields silent Inf/NaN whitened coordinates.
      // Clamp to a small positive epsilon so degenerate directions get
      // a large-but-finite scale instead of poisoning downstream math.
      if (whiten) dot / math.sqrt(math.max(model.eigenvalues(c), 1e-12)) else dot
    }
    array(coords: _*)
  }
}
