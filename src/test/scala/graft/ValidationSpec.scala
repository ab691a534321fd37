package graft

import graft.operators.Validation
import graft.operators.Validation._

class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private val checks = Seq(
    NotNull("t"), InRange("t", -50, 50), NonNegative("w"), Outlier("t", -30, 40))

  test("clean frame passes the gate unchanged") {
    val df = Seq((10.0, 1.0), (20.0, 2.0)).toDF("t", "w")
    assert(Validation.enforce(df, checks).count() === 2)
  }

  test("violations throw with counts and sample values") {
    val df = Seq((10.0, 1.0), (99.0, -3.0)).toDF("t", "w")
    val e = intercept[ValidationException] {
      Validation.enforce(df, checks)
    }
    assert(e.getMessage.contains("range_t: 1"))
    assert(e.getMessage.contains("nonneg_w: 1"))
    assert(e.getMessage.contains("99.0")) // sample value surfaced
  }

  test("report is a single row with one count per check") {
    val df = Seq((Option(10.0), 1.0), (None, 2.0)).toDF("t", "w")
    val r = Validation.report(df, checks).head()
    assert(r.getAs[Long]("n_rows") === 2L)
    assert(r.getAs[Long]("notnull_t") === 1L)
    assert(r.getAs[Long]("nonneg_w") === 0L)
  }
}
