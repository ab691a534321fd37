package graft

import org.apache.spark.sql.functions._
import graft.functions.{Hashes, Vectors}

class VectorsHashesSpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1; orthogonal is 0") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0), Seq(0.0, 2.0))).toDF("a", "b", "c")
    val r = df.select(
      Vectors.cosine(col("a"), col("b")),
      Vectors.cosine(col("a"), col("c"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("zero-norm vector yields null cosine (try_divide), not an ANSI error") {
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    val r = df.select(Vectors.cosine(col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }

  test("l2 distance matches the hand computation") {
    val df = Seq((Seq(1.0, 2.0), Seq(4.0, 6.0))).toDF("a", "b")
    assert(math.abs(df.select(Vectors.l2(col("a"), col("b"))).head().getDouble(0) - 5.0) < 1e-12)
  }

  test("minhash signature: deterministic, k slots, null on empty") {
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("a", "b", "c")),
      (3L, Seq.empty[String])).toDF("id", "sh")
    val rows = df.select(col("id"), Hashes.minhashSignature(col("sh"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L).size === 16)
    assert(rows(3L) === null)
  }

  test("jaccardSet is set-semantics (multiplicity ignored) and null-safe on empties") {
    val df = Seq((Seq("a", "a", "b"), Seq("a", "b", "b"), Seq.empty[String])).toDF("a", "b", "e")
    val r = df.select(
      Hashes.jaccardSet(col("a"), col("b")),
      Hashes.jaccardSet(col("e"), col("e"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12) // same sets {a,b}
    assert(r.isNullAt(1)) // 0/0 -> null via try_divide
  }
}
