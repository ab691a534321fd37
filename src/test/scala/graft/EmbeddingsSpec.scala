package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves a known symmetric system with the sign convention") {
    // [[2,1],[1,2]] → λ = 3, 1; vectors (1,1)/√2 and (1,−1)/√2.
    // Sign convention: the largest-|coordinate| entry positive (first
    // index wins magnitude ties), so both come out with +0.7071 first.
    val (values, vectors) = Embeddings.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(values(0) - 3.0) < 1e-12 && math.abs(values(1) - 1.0) < 1e-12)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(vectors(0)(0) - r2) < 1e-12 && math.abs(vectors(0)(1) - r2) < 1e-12)
    assert(math.abs(vectors(1)(0) - r2) < 1e-12 && math.abs(vectors(1)(1) + r2) < 1e-12)
  }

  test("covarianceMatrix matches the hand-computed sample covariance") {
    // three 2-d points (0,0), (2,2), (4,1): means (2, 1);
    // cov = [[4, 1], [1, 1]] (sample, n−1)
    val df = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(2.0f, 2.0f)), (2L, Seq(4.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Embeddings.covarianceMatrix(df, "embedding", d = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got === Map((0, 0) -> 4.0, (0, 1) -> 1.0, (1, 1) -> 1.0))
  }

  test("fitPca finds the planted variance direction; projection and whitening check out") {
    // points spread along (1,1) with small (1,−1) jitter → the first
    // component must align with (1,1)/√2 and carry most variance
    val pts = (0 until 40).map { i =>
      val t = (i - 19.5) / 4.0
      val j = ((i % 5) - 2.0) / 40.0
      (i.toLong, Seq((t + j).toFloat, (t - j).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val m = Embeddings.fitPca(df, "embedding", d = 2)
    val r2 = 1.0 / math.sqrt(2.0)
    assert(math.abs(math.abs(m.components(0)(0)) - r2) < 1e-2)
    assert(m.eigenvalues(0) > 10 * m.eigenvalues(1))
    // distributed projection variance reproduces the eigenvalues, and
    // whitened coordinates have unit sample variance
    val vd = df.select(graft.functions.Vectors.asDouble(col("embedding")).as("vd"))
    val proj = vd.select(
      Embeddings.pcaProjectCol(col("vd"), m, 2).as("p"),
      Embeddings.pcaProjectCol(col("vd"), m, 2, whiten = true).as("pw"))
    val r = proj.agg(
      var_samp(element_at(col("p"), 1)).as("v0"),
      var_samp(element_at(col("p"), 2)).as("v1"),
      var_samp(element_at(col("pw"), 1)).as("w0"),
      var_samp(element_at(col("pw"), 2)).as("w1")).head()
    assert(math.abs(r.getDouble(0) - m.eigenvalues(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - m.eigenvalues(1)) < 1e-9)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
  }
}
