package graft

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

case class GeoBuf(logSum: Double, n: Long)

/** SURVEY §2.9 UDF/UDA surface: the reference's CREATE FUNCTION
  * (native-code UDFs via `be/src/udf/udf.h`, UDAs via
  * init/update/merge/finalize in `be/src/exprs/agg-fn.h`) maps to
  * `spark.udf.register` for scalars and a typed [[Aggregator]]
  * registered the same way — same lifecycle (per-row update, partial
  * merge, finish), JVM-native instead of an ABI boundary.
  */
class UdfSpec extends SparkSpecBase {

  test("scalar UDF: register + call from SQL and the gate tables") {
    spark.udf.register("graft_udf_clip",
      (x: Double, lo: Double, hi: Double) => math.max(lo, math.min(hi, x)))
    assert(spark.sql("SELECT graft_udf_clip(99.0, 0.0, 10.0)")
      .head().getDouble(0) == 10.0)
    GraftSession.registerAll(spark, sfDir)
    val n = spark.sql(
      "SELECT COUNT(*) FROM lineitem WHERE graft_udf_clip(l_quantity, 10, 40) = l_quantity")
      .head().getLong(0)
    val direct = spark.sql(
      "SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 10 AND 40")
      .head().getLong(0)
    assert(n == direct)
  }

  test("UDA: init/update/merge/finish Aggregator (geometric mean)") {
    // the reference UDA lifecycle: Init → Update per row → Merge partials
    // → Finalize; an Aggregator has the identical contract
    val geomean = new Aggregator[Double, GeoBuf, Double] {
      def zero: GeoBuf = GeoBuf(0.0, 0L)                         // Init
      def reduce(b: GeoBuf, x: Double): GeoBuf =                 // Update
        GeoBuf(b.logSum + math.log(x), b.n + 1)
      def merge(a: GeoBuf, b: GeoBuf): GeoBuf =                  // Merge
        GeoBuf(a.logSum + b.logSum, a.n + b.n)
      def finish(b: GeoBuf): Double =                            // Finalize
        if (b.n == 0) Double.NaN else math.exp(b.logSum / b.n)
      def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    spark.udf.register("graft_geomean", org.apache.spark.sql.functions.udaf(geomean))
    val r = spark.sql(
      "SELECT graft_geomean(CAST(x AS DOUBLE)) FROM VALUES (2.0),(8.0) t(x)")
      .head().getDouble(0)
    assert(math.abs(r - 4.0) < 1e-12) // sqrt(2*8)
    // partial-merge path: force multiple partitions
    GraftSession.registerAll(spark, sfDir)
    val g = spark.sql(
      "SELECT graft_geomean(CAST(l_quantity AS DOUBLE)) FROM lineitem")
      .head().getDouble(0)
    assert(g > 1 && g < 50)
  }
}
