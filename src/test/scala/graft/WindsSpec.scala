package graft

import org.apache.spark.sql.functions._
import graft.functions.Winds

class WindsSpec extends SparkSpec {
  import spark.implicits._

  private def bucketOf(speed: java.lang.Double): String =
    Seq(speed).toDF("s").select(Winds.windStrength(col("s"))).head().getString(0)

  test("all Beaufort boundary values use inclusive upper bounds") {
    // each boundary belongs to its own bucket; epsilon above moves up
    val expected = Winds.beaufortScale
    for (((bound, label), idx) <- expected.zipWithIndex) {
      assert(bucketOf(bound) === label, s"at $bound")
      val above = bound + 0.01
      val nextLabel =
        if (idx + 1 < expected.size) expected(idx + 1)._2 else Winds.beaufortTop
      assert(bucketOf(above) === nextLabel, s"just above $bound")
    }
  }

  test("zero and negative speeds are Calm; huge is Violent Storm") {
    assert(bucketOf(0.0) === "Calm")
    assert(bucketOf(-1.0) === "Calm")
    assert(bucketOf(999.0) === "Violent Storm")
  }

  test("null speed yields null bucket") {
    val r = Seq[java.lang.Double](null).toDF("s")
      .select(Winds.windStrength(col("s"))).head()
    assert(r.isNullAt(0))
  }

  test("SQL rendering matches the Column expression") {
    val speeds = Seq(0.0, 1.5, 1.6, 10.7, 32.6, 32.7, 100.0)
    val df = speeds.toDF("s")
    val viaCol = df.select(Winds.windStrength(col("s"))).collect().map(_.getString(0))
    val viaSql = df.selectExpr(Winds.windStrengthSql("s")).collect().map(_.getString(0))
    assert(viaCol.toSeq === viaSql.toSeq)
  }
}
