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
case class UEv(ts: Timestamp, user_id: Long, event_type: String, value: Double, props: String)
case class SDoc(ts: Timestamp, doc_id: Long, text: String)

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

  test("streaming dedup drops within-watermark re-deliveries, keeps distinct content") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UEv]
    val q = graft.streaming.EventsStream.dedupStream(stream.toDF(), "1 hour")
      .writeStream.format("memory").queryName("ev_dedup")
      .outputMode(OutputMode.Append())
      .start()
    try {
      val a = UEv(Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0, "p1")
      val b = UEv(Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "view", 2.0, "p2")
      stream.addData(a, b)
      q.processAllAvailable()
      // same content re-delivered (at-least-once source) → dropped
      stream.addData(a.copy(ts = Timestamp.valueOf("2024-01-01 10:02:00")))
      // genuinely new content → kept
      stream.addData(UEv(Timestamp.valueOf("2024-01-01 10:03:00"), 2L, "click", 3.0, "p3"))
      q.processAllAvailable()
      val types = spark.table("ev_dedup").collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
      assert(types.length == 3, types.toSeq)
      assert(types.count(_ == ("click", 1.0)) == 1)
    } finally q.stop()
  }

  test("stream-stream interval join == batch join on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      UEv(Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "click", 1.0, ""),
      UEv(Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "purchase", 9.0, ""),
      UEv(Timestamp.valueOf("2024-01-01 10:30:00"), 1L, "purchase", 7.0, ""), // outside 15m of click
      UEv(Timestamp.valueOf("2024-01-01 10:06:00"), 2L, "purchase", 5.0, ""), // other user, no click
      UEv(Timestamp.valueOf("2024-01-01 11:00:00"), 9L, "click", 0.0, ""),    // watermark pusher
    )
    val clicks = events.filter(_.event_type == "click")
    val purchases = events.filter(_.event_type == "purchase")

    val batch = graft.streaming.EventsStream.intervalJoin(
        clicks.toDF(), purchases.toDF())
      .select($"l_user", $"l_value", $"r_value").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet

    val ls = MemoryStream[UEv]
    val rs = MemoryStream[UEv]
    val q = graft.streaming.EventsStream.intervalJoin(ls.toDF(), rs.toDF())
      .select($"l_user", $"l_value", $"r_value")
      .writeStream.format("memory").queryName("ev_join")
      .outputMode(OutputMode.Append())
      .start()
    try {
      ls.addData(clicks)
      rs.addData(purchases)
      q.processAllAvailable()
      val streamed = spark.table("ev_join").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(batch == Set((1L, 1.0, 9.0))) // only the within-15m same-user pair
    } finally q.stop()
  }

  test("streaming sessionize: event-time timeout closes sessions, state evicted") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[UEv]
    val q = graft.streaming.EventsStream.sessionizeStream(spark,
        stream.toDF(), gapMs = 30L * 60 * 1000, watermark = "10 minutes")
      .writeStream.format("memory").queryName("ev_sess_stream")
      .outputMode(OutputMode.Append())
      .start()
    def ev(t: String, u: Long, v: Double) =
      UEv(Timestamp.valueOf(t), u, "click", v, "")
    try {
      // batch 1: user 1 has a 2-event session; user 2 a 1-event session;
      // the second user-1 event arrives out of order (fragment merge)
      stream.addData(ev("2024-01-01 10:10:00", 1L, 2.0),
        ev("2024-01-01 10:00:00", 1L, 1.0), ev("2024-01-01 10:05:00", 2L, 5.0))
      q.processAllAvailable()
      assert(spark.table("ev_sess_stream").count() == 0) // nothing closed yet
      // batch 2 advances max event time to 12:00 (watermark lags a batch)
      stream.addData(ev("2024-01-01 12:00:00", 9L, 0.0))
      q.processAllAvailable()
      // batch 3 runs with watermark 11:50 → timeouts fire for users 1, 2
      // even though they sent no further events
      stream.addData(ev("2024-01-01 12:01:00", 9L, 0.0))
      q.processAllAvailable()
      val sessions = spark.table("ev_sess_stream").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("value_sum"))).toSet
      assert(sessions == Set((1L, 2L, 3.0), (2L, 1L, 5.0)), sessions)
      // closed keys are evicted: only user 9's open session remains
      val stateRows = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal)
      assert(stateRows.contains(1L), s"state rows: $stateRows")
    } finally q.stop()
  }

  test("streaming minhash signatures == batch signatures (stateless ingest head)") {
    implicit val sqlCtx = spark.sqlContext
    GraftSession.registerAll(spark, sfDir) // minhash kernels on the registry
    val docs = Seq(
      SDoc(Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "the quick brown fox jumps over the lazy dog"),
      SDoc(Timestamp.valueOf("2024-01-01 10:01:00"), 2L, "the quick brown fox jumps over the lazy dog"),
      SDoc(Timestamp.valueOf("2024-01-01 10:02:00"), 3L, "completely different text about astronomy and stars"),
    )
    val batch = graft.streaming.EventsStream.minhashStream(
        docs.toDF(), "doc_id", "text")
      .select($"id", $"buckets").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap

    val stream = MemoryStream[SDoc]
    val q = graft.streaming.EventsStream.minhashStream(stream.toDF(), "doc_id", "text")
      .select($"id", $"buckets")
      .writeStream.format("memory").queryName("doc_sigs")
      .outputMode(OutputMode.Append())
      .start()
    try {
      stream.addData(docs.take(2))
      q.processAllAvailable()
      stream.addData(docs.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("doc_sigs").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
      assert(streamed == batch)
      // identical docs share every band bucket; the unrelated one shares none
      assert(streamed(1L) == streamed(2L))
      assert(!streamed(1L).toSet.exists(streamed(3L).toSet.contains))
    } finally q.stop()
  }
}
