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

  test("hashedBow native kernel matches the HOF fold on real corpus chunks") {
    // parity proof for graft.plans.HashedBow (the r17 kernel): both
    // forms over the sf0.001 documents' sliding chunks — real token
    // distributions, real multi-byte text — plus null/empty edges.
    // Vector-for-vector identical (counts are exact doubles, so ===).
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val chunks = docs
      .select(col("doc_id"), graft.functions.Texts.tokens(col("text")).as("ws"))
      .filter(size(col("ws")) > 0)
    val both = chunks.select(col("doc_id"),
        graft.operators.Rag.hashedBow(col("ws"), 64).as("k"),
        graft.operators.Rag.hashedBowHof(col("ws"), 64).as("h"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Double](1) === r.getSeq[Double](2),
        s"doc ${r.getLong(0)} kernel != HOF")
    }
    val edges = Seq(
      (0L, Seq("a", "b", "a")),
      (1L, Seq.empty[String]),
      (2L, null.asInstanceOf[Seq[String]])).toDF("id", "ws")
    val er = edges.select(col("id"),
        graft.operators.Rag.hashedBow(col("ws"), 8).as("k"),
        graft.operators.Rag.hashedBowHof(col("ws"), 8).as("h"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1),
          if (r.isNullAt(2)) null else r.getSeq[Double](2))).toMap
    assert(er(0L)._1 === er(0L)._2)
    assert(er(0L)._1.asInstanceOf[Seq[Double]].sum === 3.0)
    assert(er(1L)._1 === Seq.fill(8)(0.0))
    assert(er(1L)._1 === er(1L)._2)
    assert(er(2L)._1 === null && er(2L)._2 === null)
  }
}
