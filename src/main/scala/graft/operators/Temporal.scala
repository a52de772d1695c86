package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators. The reference has none (theta joins go
  * through its nested-loop path — SURVEY.md §2.3), but event analytics
  * needs them; per the custom-operator preference order this is tier
  * (a): *composed from existing operators*, no custom SparkPlan.
  *
  * The backward as-of join is expressed as union → window → filter:
  * both sides shuffle ONCE on the key, the "most recent right row ≤ ts"
  * is a running `last(ignoreNulls)` over the merged, time-ordered
  * stream. That is one shuffle + one sort per side — same cost shape as
  * a sort-merge join, no per-row range probe, no skew amplification —
  * and it scales to arbitrarily many probe rows per key.
  */
object Temporal {

  /** Backward as-of join: for each left row, attach `payloadCols` from
    * the latest right row with the same `key` and `rightTs <= leftTs`
    * (left-outer semantics — unmatched left rows keep NULL payloads).
    *
    * Ties (equal timestamps) match the right row, like DuckDB/Pandas
    * ASOF. Left columns are preserved.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // payload travels as ONE struct so every attached column comes from
    // the same right row even when payload fields are null
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val l = left.select(
      col(key).as("__k") +: col(leftTs).as("__ts") +:
        lit(1).as("__src") +:
        lit(null).cast(payloadType).as("__p") +:
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = right.select(
      col(key).as("__k") +: col(rightTs).as("__ts") +:
        lit(0).as("__src") +:
        payloadStruct.as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    // right rows sort before left at equal ts → ties match
    val w = Window.partitionBy(col("__k"))
      .orderBy(asc_nulls_last("__ts"), asc_nulls_last("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payloadCols.map(c => col(s"__f.$c").as(c)): _*)
  }

  /** Range (interval-containment) join: left rows with `leftTs` inside
    * `[rightStart, rightEnd]` of same-key right rows. A plain theta join
    * would be a per-key nested loop (`BroadcastNestedLoopJoin` — the
    * reference's NestedLoopJoinNode path); instead both sides bucket by
    * time (`bucketMs`), the right interval explodes into the buckets it
    * covers, and an equi-join on (key, bucket) + residual BETWEEN does
    * the rest. Shuffle cost: O(rows × avg interval/bucketMs) — pick
    * bucketMs near the typical interval length.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightStart: String, rightEnd: String,
      bucketMs: Long): DataFrame = {
    // NTZ columns cast through the session zone (pinned UTC) for epoch math
    def millis(c: String) = unix_millis(col(c).cast("timestamp"))
    val lb = left.withColumn("__bucket",
      (millis(leftTs) / bucketMs).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        (millis(rightStart) / bucketMs).cast("long"),
        (millis(rightEnd) / bucketMs).cast("long"))))
    lb.join(rb,
        lb(key) === rb(key) && lb("__bucket") === rb("__bucket") &&
          col(leftTs).between(col(rightStart), col(rightEnd)))
      .drop(rb(key)).drop("__bucket")
  }

  /** Forward as-of join: earliest right row with `rightTs >= leftTs`
    * (mirror of [[asofJoinBackward]]; ties match).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadStruct = struct(payloadCols.map(col): _*)
    val payloadType = right.select(payloadStruct).schema.head.dataType
    val l = left.select(
      col(key).as("__k") +: col(leftTs).as("__ts") +:
        lit(1).as("__src") +:
        lit(null).cast(payloadType).as("__p") +:
        leftCols.map(c => col(c).as(s"__l_$c")): _*)
    val r = right.select(
      col(key).as("__k") +: col(rightTs).as("__ts") +:
        lit(2).as("__src") +:
        payloadStruct.as("__p") +:
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)
    // scan time DESCENDING; right rows (src 2) sort after left at equal
    // ts in descending src order → ties match
    val w = Window.partitionBy(col("__k"))
      .orderBy(desc_nulls_last("__ts"), desc_nulls_last("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__f", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(c => col(s"__l_$c").as(c)) ++
        payloadCols.map(c => col(s"__f.$c").as(c)): _*)
  }
}
