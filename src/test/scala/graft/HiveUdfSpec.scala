package graft

import org.apache.spark.sql.functions._

/** Hive/Java UDF bridge (`be/src/exprs/hive-udf-call.h:75`): classes
  * written against Hive's UDF contracts run as Catalyst expressions via
  * GraftFunctions.registerHiveUdf. Guarded: the hive-exec classes ship
  * with Spark's hive module; if a deployment strips them, the spec
  * documents the block instead of failing.
  */
class HiveUdfSpec extends SparkSpecBase {

  private def hiveClassesPresent: Boolean =
    try {
      Class.forName("org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper")
      true
    } catch { case _: Throwable => false }

  test("GenericUDF class registers and evaluates (upper)") {
    assume(hiveClassesPresent, "hive-exec not on classpath")
    graft.functions.GraftFunctions.registerHiveUdf(spark, "hive_upper",
      "org.apache.hadoop.hive.ql.udf.generic.GenericUDFUpper")
    val r = spark.sql("SELECT hive_upper('graft engine') AS u").head().getString(0)
    assert(r == "GRAFT ENGINE")
    // over a real column, distributed
    GraftSession.registerAll(spark, sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM region WHERE hive_upper(r_name) = upper(r_name)")
      .head().getLong(0)
    assert(n == 5)
  }

  test("classic reflective UDF class registers and evaluates (ascii)") {
    assume(hiveClassesPresent, "hive-exec not on classpath")
    graft.functions.GraftFunctions.registerHiveUdf(spark, "hive_ascii",
      "org.apache.hadoop.hive.ql.udf.UDFAscii", generic = false)
    val r = spark.sql("SELECT hive_ascii('A') AS a").head().getInt(0)
    assert(r == 65)
  }

  test("misdeclared class fails with a clear error, not a wrong answer") {
    assume(hiveClassesPresent, "hive-exec not on classpath")
    graft.functions.GraftFunctions.registerHiveUdf(spark, "hive_broken",
      "java.lang.String") // not a UDF contract
    val e = intercept[Throwable] {
      spark.sql("SELECT hive_broken('x')").collect()
    }
    assert(e.getMessage != null)
  }
}
