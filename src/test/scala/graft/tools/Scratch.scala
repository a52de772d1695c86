package graft.tools

import org.apache.spark.sql.SparkSession

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", "/tmp/dbgwh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("subplan_outer_join_sub", "subplan_anti_join_sub").foreach { n =>
      graft.SparkEntry.queries.get(n) match {
        case Some(fn) =>
          try {
            val df = fn(spark, "/root/testdata/sf0.01")
            println(s"$n: rows=" + df.count())
          } catch { case e: Throwable =>
            println(s"$n: FAIL " + e.toString.replaceAll("\n", " ").take(250)) }
        case None => println(s"$n: NOT IN queries")
      }
    }
    println("oracle: " + graft.SparkEntry.oracleSql.contains("subplan_anti_join_sub"))
    spark.stop()
  }
}
