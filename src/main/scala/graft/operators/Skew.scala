package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for joins and aggregations at scale.
  *
  * AQE's skew-join splitting (enabled in GraftSession) handles *shuffle*
  * skew transparently; these operators cover the cases AQE can't:
  * a broadcast-infeasible join where one key holds a large share of all
  * rows, and high-cardinality aggregation with a few hot groups.
  *
  * Salting trades an R-fold replication of the (small) right side for an
  * R-way split of the hot keys' partitions — the standard fix when one
  * key would otherwise pin a single reducer at 100 TB.
  */
object Skew {

  /** Left side: append a deterministic salt in [0, R) derived from a
    * uniformly-distributed column (so the same row always gets the same
    * salt — keeps retries/speculation consistent, no rand() involved).
    */
  def saltLeft(df: DataFrame, saltSrc: Column, r: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSrc), lit(r)).cast("int"))

  /** Right side: replicate each row R times with salt 0..R-1. */
  def saltRight(df: DataFrame, r: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(r - 1))))

  /** Salted equi-join: join keys + the salt column. The join spreads a
    * hot left key across R reducers; `r` should cover executor-count /
    * hottest-key share. Right side grows R× — keep it the smaller input.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, saltSrc: Column, r: Int,
      joinType: String = "inner"): DataFrame = {
    val l = saltLeft(left, saltSrc, r)
    val rt = saltRight(right, r)
    l.join(rt, l(leftKey) === rt(rightKey) && l("__salt") === rt("__salt"),
      joinType)
      .drop("__salt")
  }

  /** Two-phase hot-group aggregation: partial agg on (key, salt), then
    * final agg on key — the manual form of map-side combine for
    * aggregates Spark can't partially evaluate (e.g. exact collect-based
    * ones). `aggs` must be decomposable (sum/count/min/max style).
    */
  def twoPhaseAgg(df: DataFrame, key: Column, saltSrc: Column, r: Int,
      partial: Seq[(Column => Column, Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSrc), lit(r)))
    val phase1 = salted.groupBy(key.as("__k"), col("__salt"))
      .agg(partial.head._1(partial.head._2).as(s"__p0"),
        partial.tail.zipWithIndex.map { case ((f, c, _), i) =>
          f(c).as(s"__p${i + 1}")
        }: _*)
    phase1.groupBy(col("__k"))
      .agg(partial.head._1(col("__p0")).as(partial.head._3),
        partial.tail.zipWithIndex.map { case ((f, _, n), i) =>
          f(col(s"__p${i + 1}")).as(n)
        }: _*)
      .withColumnRenamed("__k", "key")
  }
}
