package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * removes the shuffle entirely (the Spark analog of Impala's
  * partitioned hash-join distribution when both inputs are already
  * partitioned on the key — `DistributedPlanner.java:479-575`).
  * At 100 TB this is the difference between joining in place and
  * re-shuffling the fact table every query.
  */
class BucketingSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key has no Exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    GraftSession.table(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    GraftSession.table(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // disable broadcast so the join would otherwise shuffle both sides
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("q"), max(col("o_totalprice")).as("p"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not re-shuffle its bucketed inputs
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      val joinSubtree = plan.substring(joinIdx)
      assert(!joinSubtree.contains("Exchange hashpartitioning"), plan)
      // sanity: result matches the unbucketed join
      val expect = GraftSession.table(spark, sfDir, "lineitem")
        .join(GraftSession.table(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .count()
      val got = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
