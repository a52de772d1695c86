package graft.tools

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.FunctionalTables.register(spark)
    spark.table("alltypes").createOrReplaceTempView("__fx_functional__alltypes")
    val ddl = new graft.GoldenDdl(spark)
    ddl.exec("create table alltypes like __fx_functional__alltypes")
    ddl.exec("insert into alltypes partition(year, month) select * from __fx_functional__alltypes")
    ddl.exec("alter table alltypes add partition (year=NULL, month=NULL)")
    ddl.exec("alter table alltypes add partition (year=2011, month=NULL)")
    ddl.exec("alter table alltypes drop partition (year=NULL, month=NULL)")
    spark.stop()
  }
}
