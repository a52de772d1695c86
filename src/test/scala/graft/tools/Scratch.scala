package graft.tools

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.PruneFilters," +
        "org.apache.spark.sql.catalyst.optimizer.PropagateEmptyRelation")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    spark.read.format("graft.sources.AllTypesDataSourceTwin").load()
      .createOrReplaceTempView("alltypes_datasource")
    val q = """select string_col from alltypes_datasource
      where string_col = 'VALIDATE_PREDICATES##id LT 1 && id GT 1 && id LE 1 && id GE 1 && int_col EQ 1 && id NE 1'
            and id < 1 and id > 1 and id <= 1 and id >= 1 and int_col = 1 and id != 1"""
    val df = graft.ImpalaDialect.sql(spark, q)
    df.explain(false)
    df.show(false)
    spark.stop()
  }
}
