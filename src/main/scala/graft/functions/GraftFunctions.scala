package graft.functions

import org.apache.spark.sql.SparkSession

/** Registration point for the Impala-compat function layer
  * (SURVEY.md §2.8/§2.4): name aliases over Spark built-ins plus custom
  * Catalyst expressions/aggregates for the true gaps.
  *
  * Filled in incrementally; must stay idempotent per session.
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    Aliases.registerAll(spark)
  }
}
