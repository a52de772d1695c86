package graft.tools

/** Dev tool: print the dialect-rewritten SQL (and optionally run it)
  * for one TPC-DS golden query — `Test/runMain graft.tools.RewriteDebug
  * <num> [run]`.
  */
object RewriteDebug {
  def main(args: Array[String]): Unit = {
    val n = args(0)
    val c = graft.queries.TpcdsGoldenQueries.tpcdsCase(n)
    val q = c.query.stripSuffix(";")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.queries.TpcdsGoldenQueries.catalog
      .registerMaterialized(spark, "/root/testdata/sf0.01", "/tmp/graft_tpcds")
    val rewritten = graft.ImpalaDialect.rewrite(
      graft.NestedRefs.rewrite(spark, q))
    println("==== REWRITTEN ====")
    println(rewritten)
    if (args.length > 1 && args(1) == "run") {
      val df = graft.ImpalaDialect.sql(spark, q)
      df.show(5, false)
    }
    spark.stop()
  }
}
