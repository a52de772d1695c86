package graft

import org.apache.spark.sql.functions._

/** DSv2 source + COMPUTE STATS analog specs. */
class SourcesV2Spec extends SparkSpecBase {

  private val fmt = "graft.sources.SyntheticDocsSource"

  test("DSv2 synthetic source: deterministic rows across partitions") {
    val df = spark.read.format(fmt)
      .option("rows", 1000).option("partitions", 8).load()
    assert(df.count() == 1000)
    assert(df.select(countDistinct(col("doc_id"))).head().getLong(0) == 1000)
    // deterministic: same content on re-read
    val df2 = spark.read.format(fmt)
      .option("rows", 1000).option("partitions", 3).load()
    val a = df.orderBy("doc_id").collect().map(_.mkString("|"))
    val b = df2.orderBy("doc_id").collect().map(_.mkString("|"))
    assert(a.sameElements(b))
    assert(df.filter(col("lang") === "de").count() == 100)
  }

  test("DSv2 column pruning reaches the source") {
    val df = spark.read.format(fmt)
      .option("rows", 10).option("partitions", 2).load()
      .select("doc_id")
    df.collect()
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("doc_id") && !scan.contains("text"), scan)
  }

  test("DSv2 limit pushdown") {
    val df = spark.read.format(fmt)
      .option("rows", 1000000).option("partitions", 4).load()
      .limit(5)
    assert(df.collect().length == 5) // fast because each split stops early
  }

  test("COMPUTE STATS analog populates CBO column statistics") {
    GraftSession.analyzeTables(spark, sfDir, Seq("nation", "region"))
    val stats = spark.sql("DESCRIBE EXTENDED nation_t n_nationkey")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(stats.get("distinct_count").exists(_.toLong > 0), stats)
    // row count visible to the planner
    val rel = spark.table("nation_t").queryExecution.optimizedPlan
    assert(rel.stats.rowCount.exists(_.toLong == 25), rel.stats)
    spark.sql("DROP TABLE IF EXISTS nation_t")
    spark.sql("DROP TABLE IF EXISTS region_t")
  }
}
