package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc driver for poking at one query/fixture during development:
  * `sbt "Test/runMain graft.tools.Scratch"`.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.FunctionalTables.register(spark)
    val sql = args.headOption.getOrElse("select count(*) from alltypes")
    val df = graft.ImpalaDialect.sql(spark, sql)
    df.explain(false)
    df.show(50, false)
    spark.stop()
  }
}
