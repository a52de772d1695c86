package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events fixture's `ts` schema is driver-owned and has changed across
  * rounds (TIMESTAMP(NANOS) → timestamp[µs] NTZ). `GraftSession.table`
  * must normalize every historic shape to `TimestampType` with identical
  * values, so a future regeneration can't dark the whole SQL-text gate
  * again (round-7 postmortem).
  */
class FixtureShapeSpec extends SparkSpecBase {

  // 2024-03-05 12:34:56.789012 UTC, in micros since epoch.
  private val micros = 1709642096789012L

  private def writeEvents(dir: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
    mk.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def readTs(dir: String): (DataType, Long) = {
    val df = GraftSession.table(spark, dir, "events")
    val dt = df.schema("ts").dataType
    val v = df.select(unix_micros(col("ts").cast("timestamp"))).head.getLong(0)
    (dt, v)
  }

  test("events.ts long-nanos shape normalizes to TimestampType, µs-truncated") {
    val dir = Files.createTempDirectory("graft_fix_nanos").toString
    // nanos value with sub-µs residue: truncation must floor to `micros`.
    writeEvents(dir) {
      spark.range(1).select(
        lit(1L).as("event_id"), lit(micros * 1000L + 345L).as("ts"))
    }
    val (dt, v) = readTs(dir)
    assert(dt === TimestampType)
    assert(v === micros)
  }

  test("events.ts timestamp_ntz (current fixture shape) normalizes, value-identical") {
    val dir = Files.createTempDirectory("graft_fix_ntz").toString
    writeEvents(dir) {
      spark.range(1).select(lit(1L).as("event_id"),
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"))
    }
    val (dt, v) = readTs(dir)
    assert(dt === TimestampType)
    assert(v === micros)
  }

  test("events.ts instant timestamp shape passes through unchanged") {
    val dir = Files.createTempDirectory("graft_fix_ltz").toString
    writeEvents(dir) {
      spark.range(1).select(lit(1L).as("event_id"),
        timestamp_micros(lit(micros)).as("ts"))
    }
    val (dt, v) = readTs(dir)
    assert(dt === TimestampType)
    assert(v === micros)
  }

  test("live fixture dir registers all ten views and events SQL runs") {
    GraftSession.registerAll(spark, sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts IS NOT NULL").head.getLong(0)
    assert(n > 0)
    // unix_micros path (sessionization) must work on the live shape too.
    val q = queries.EventsQueries.defs.find(_.name == "q_events_session").get
    assert(q.fn(spark, sfDir).count() > 0)
  }
}
