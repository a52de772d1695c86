package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Structured Streaming mirror of the events tumbling-window aggregation
  * (EventsQueries q_events_tumbling): the same `window()` groupBy runs
  * incrementally over a stream with a watermark and must produce the
  * same result as the batch query on the same data.
  *
  * The reference has no streaming engine (SURVEY.md §2.11) — this is the
  * Spark-native upgrade of its "fast incremental batch" story.
  */
case class Ev(ts: Timestamp, event_type: String, value: Double)

class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  test("streaming tumbling-window agg == batch agg on the same events") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      Ev(Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0),
      Ev(Timestamp.valueOf("2024-01-01 10:15:00"), "click", 2.0),
      Ev(Timestamp.valueOf("2024-01-01 10:45:00"), "view", 3.0),
      Ev(Timestamp.valueOf("2024-01-01 11:05:00"), "click", 4.0),
      Ev(Timestamp.valueOf("2024-01-01 11:30:00"), "view", 5.0),
      Ev(Timestamp.valueOf("2024-01-01 12:10:00"), "click", 6.0),
    )

    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("value_sum"))
      .select(date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("h"),
        $"event_type", $"n", $"value_sum")

    val batch = agg(events.toDF()).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val stream = MemoryStream[Ev]
    val q = agg(stream.toDF().withWatermark("ts", "10 minutes"))
      .writeStream
      .format("memory")
      .queryName("ev_windows")
      .outputMode(OutputMode.Complete())
      .start()
    try {
      stream.addData(events.take(3))
      q.processAllAvailable()
      stream.addData(events.drop(3))
      q.processAllAvailable()
      val streamed = spark.table("ev_windows").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("watermark drops late data in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Ev]
    val q = stream.toDF()
      .withWatermark("ts", "5 minutes")
      .groupBy(window($"ts", "10 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select(date_format($"window.start", "HH:mm").as("w"), $"event_type", $"n")
      .writeStream.format("memory").queryName("ev_late")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(Ev(Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      // advance watermark far past the first window → it closes and emits
      stream.addData(Ev(Timestamp.valueOf("2024-01-01 11:00:00"), "click", 1.0))
      q.processAllAvailable()
      // this event is behind the watermark → dropped, no new output row
      stream.addData(Ev(Timestamp.valueOf("2024-01-01 10:06:00"), "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("ev_late").collect()
        .map(r => (r.getString(0), r.getLong(2))).toMap
      assert(rows.get("10:00").contains(1L)) // closed with 1 event, late one dropped
    } finally q.stop()
  }
}
