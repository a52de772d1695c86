package org.apache.spark.sql.hive

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.hive.HiveShim.HiveFunctionWrapper

/** Package-access bridge to Spark's Hive UDF adapter expressions
  * (`HiveSimpleUDF` / `HiveGenericUDF` are private[hive]) — the engine
  * half of the reference's Java-UDF support (`be/src/exprs/
  * hive-udf-call.h:75`, `CREATE FUNCTION ... USING JAR`): a class
  * implementing Hive's UDF or GenericUDF contract runs as a Catalyst
  * expression. Jar distribution itself is Spark's `ADD JAR`; this
  * bridge covers the call path. No logic of its own.
  */
object GraftHiveBridge {

  /** Adapter for a Hive GenericUDF class. */
  def genericUdf(className: String, children: Seq[Expression]): Expression =
    HiveGenericUDF(className.split('.').last,
      HiveFunctionWrapper(className), children)

  /** Adapter for a classic Hive UDF (reflective `evaluate`) class. */
  def simpleUdf(className: String, children: Seq[Expression]): Expression =
    HiveSimpleUDF(className.split('.').last,
      HiveFunctionWrapper(className), children)
}
