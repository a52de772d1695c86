package graft

import java.sql.Timestamp

import graft.operators.Temporal

/** Hand-computed as-of join cases: before/after/tie/no-match, plus the
  * multi-payload atomicity guarantee.
  */
class TemporalSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of: latest right row at-or-before each left row") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), "t1"),
      (1L, ts("2024-01-01 10:00:10"), "t2"), // tie with quote q2
      (1L, ts("2024-01-01 09:59:00"), "t0"), // before any quote
      (2L, ts("2024-01-01 10:00:07"), "t3"),
    ).toDF("sym", "ts", "trade_id")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0, 1L),
      (1L, ts("2024-01-01 10:00:10"), 101.0, 2L),
      (2L, ts("2024-01-01 10:00:06"), 200.0, 3L),
      (2L, ts("2024-01-01 10:00:08"), 201.0, 4L), // after t3 → not matched
    ).toDF("sym", "ts", "price", "qid")

    val joined = Temporal.asofJoinBackward(trades, quotes, "sym", "ts", "ts",
      Seq("price", "qid"))
      .collect()
      .map(r => r.getString(2) -> (Option(r.get(3)), Option(r.get(4)))).toMap

    assert(joined("t0") == ((None, None)))            // no quote yet
    assert(joined("t1") == ((Some(100.0), Some(1L)))) // q1 at 10:00:00
    assert(joined("t2") == ((Some(101.0), Some(2L)))) // tie matches
    assert(joined("t3") == ((Some(200.0), Some(3L)))) // 10:00:06, not 08
  }

  test("forward as-of: earliest right row at-or-after each left row") {
    val l = Seq(
      (1L, ts("2024-01-01 10:00:05"), "a"),
      (1L, ts("2024-01-01 10:00:10"), "b"), // tie with q at 10
      (1L, ts("2024-01-01 10:00:20"), "c"), // nothing after
    ).toDF("k", "ts", "id")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:10"), 7L),
      (1L, ts("2024-01-01 10:00:01"), 5L), // before everything
    ).toDF("k", "ts", "qid")
    val j = Temporal.asofJoinForward(l, r, "k", "ts", "ts", Seq("qid"))
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    assert(j("a") == Some(7L))
    assert(j("b") == Some(7L)) // tie matches
    assert(j("c") == None)
  }

  test("rangeJoin == plain theta join on interval containment") {
    val points = Seq(
      (1L, ts("2024-01-01 00:10:00"), "p1"),
      (1L, ts("2024-01-01 05:00:00"), "p2"),
      (2L, ts("2024-01-01 00:10:00"), "p3"),
    ).toDF("k", "ts", "pid")
    val intervals = Seq(
      (1L, ts("2024-01-01 00:00:00"), ts("2024-01-01 01:00:00"), "i1"),
      (1L, ts("2024-01-01 04:00:00"), ts("2024-01-01 06:00:00"), "i2"),
      (2L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00"), "i3"),
    ).toDF("k", "start", "end", "iid")
    val got = graft.operators.Temporal.rangeJoin(points, intervals, "k",
        "ts", "start", "end", bucketMs = 15 * 60 * 1000)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expect = points.join(intervals, points("k") === intervals("k") &&
        points("ts").between(intervals("start"), intervals("end")))
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expect)
    assert(got == Set(("p1", "i1"), ("p2", "i2"))) // p3 outside i3
  }

  test("payload atomicity: both columns come from the same right row") {
    val l = Seq((1L, ts("2024-01-01 00:00:10"), "x")).toDF("k", "ts", "id")
    val r = Seq(
      (1L, ts("2024-01-01 00:00:01"), Some("a"), None: Option[Long]),
      (1L, ts("2024-01-01 00:00:02"), None: Option[String], Some(7L)),
    ).toDF("k", "ts", "s", "n")
    val row = Temporal.asofJoinBackward(l, r, "k", "ts", "ts", Seq("s", "n"))
      .head()
    // latest right row is (null, 7) — s must NOT leak "a" from the older row
    assert(row.isNullAt(3) && row.getLong(4) == 7L)
  }
}
