package graft

import org.apache.spark.sql.types._

/** DECIMAL semantics (SURVEY.md §7.4 risk 1): the reference runs
  * DECIMAL_V2 (`common/thrift/ImpalaInternalService.thrift:233` —
  * stricter types, errors on overflow instead of NULL). Spark's ANSI
  * mode (default in Spark 4) matches that stance; these tests pin the
  * result-type rules and exactness we rely on in the oracle queries.
  */
class DecimalSpec extends SparkSpecBase {

  private def typeOf(expr: String): DataType =
    spark.sql(s"SELECT $expr AS x").schema.head.dataType

  test("addition/subtraction result types") {
    assert(typeOf("CAST(1 AS DECIMAL(12,2)) + CAST(1 AS DECIMAL(12,2))") ==
      DecimalType(13, 2))
    assert(typeOf("CAST(1 AS DECIMAL(10,2)) + CAST(1 AS DECIMAL(10,4))") ==
      DecimalType(13, 4))
  }

  test("multiplication result types (the q1 money-math shape)") {
    // dec2 * frac2 — the lineitem revenue term
    assert(typeOf("CAST(1 AS DECIMAL(12,2)) * CAST(1 AS DECIMAL(4,2))") ==
      DecimalType(17, 4))
  }

  test("division keeps at least 6 scale digits (DECIMAL_V2 minimum)") {
    val dt = typeOf("CAST(1 AS DECIMAL(12,2)) / CAST(3 AS DECIMAL(12,2))")
      .asInstanceOf[DecimalType]
    assert(dt.scale >= 6, dt)
  }

  test("exactness: no binary-float drift") {
    val r = spark.sql(
      "SELECT CAST(0.1 AS DECIMAL(10,2)) + CAST(0.2 AS DECIMAL(10,2)) = CAST(0.3 AS DECIMAL(10,2))")
      .head().getBoolean(0)
    assert(r)
  }

  test("overflow errors under ANSI (DECIMAL_V2 behavior, not NULL)") {
    // V1 returned NULL on overflow; V2 (and Spark ANSI) raise
    val e = intercept[Exception] {
      spark.sql(
        "SELECT CAST(99999999999999999999 AS DECIMAL(20,0)) * CAST(99999999999999999999 AS DECIMAL(20,0)) * CAST(99999999999999999999 AS DECIMAL(20,0))")
        .collect()
    }
    assert(e.getMessage.contains("overflow") ||
      e.getMessage.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      e.getMessage.contains("cannot be represented"), e.getMessage)
  }

  test("aggregate decimal sum is exact across repartitioning") {
    import spark.implicits._
    val df = (1 to 9999).map(i => BigDecimal(i) / 100).toDF("d")
    val expected = new java.math.BigDecimal("499950.00")
    assert(df.repartition(7).agg(org.apache.spark.sql.functions.sum(
      $"d".cast(DecimalType(12, 2)))).head().getDecimal(0) == expected)
  }
}
