package graft

import java.sql.DriverManager

/** The reference is a SERVER whose primary client surface is
  * HiveServer2-protocol JDBC/ODBC (`be/src/service/impala-hs2-server.cc:
  * 455`, default port 21050). The Spark-native equivalent is
  * `HiveThriftServer2.startWithContext` over a graft session — this
  * probe starts it on a free port, runs one query through the stock
  * Hive JDBC driver, and shuts it down, pinning the last user-facing
  * entry point (SURVEY §2 "What's missing" item 5, round 3).
  *
  * Guarded like IcebergSpec: when spark-hive-thriftserver / hive-jdbc
  * are absent from the runtime classpath the spec pins the clean
  * failure mode instead.
  */
class Hs2Spec extends SparkSpecBase {

  private def classPresent(name: String): Boolean =
    try { Class.forName(name); true } catch { case _: Throwable => false }

  test("HiveThriftServer2 over a graft session answers a Hive-JDBC query") {
    val serverPresent =
      classPresent("org.apache.spark.sql.hive.thriftserver.HiveThriftServer2")
    val driverPresent = classPresent("org.apache.hive.jdbc.HiveDriver")
    assume(serverPresent && driverPresent,
      "hive-thriftserver/hive-jdbc not on classpath — probe pins absence")

    // free port (the reference binds 21050; the Spark server's default
    // 10000 may be taken by a concurrent suite)
    val sock = new java.net.ServerSocket(0)
    val port = sock.getLocalPort
    sock.close()

    GraftSession.tune(spark)
    spark.conf.set("hive.server2.thrift.port", port.toString)
    spark.conf.set("hive.server2.thrift.bind.host", "localhost")

    import org.apache.spark.sql.hive.thriftserver.HiveThriftServer2
    val server = HiveThriftServer2.startWithContext(spark.sqlContext)
    try {
      // the thrift endpoint binds asynchronously
      var conn: java.sql.Connection = null
      var attempts = 0
      while (conn == null && attempts < 50) {
        try conn = DriverManager.getConnection(
          s"jdbc:hive2://localhost:$port/default", "graft", "")
        catch { case _: Throwable => attempts += 1; Thread.sleep(200) }
      }
      assert(conn != null, s"no JDBC connection after ${attempts} attempts")
      try {
        // path-addressed parquet: no shared-catalog dependency between
        // the JDBC session and the spec session
        val st = conn.createStatement()
        val rs = st.executeQuery(
          s"SELECT r_name, r_regionkey FROM parquet.`$sfDir/region.parquet` " +
            "ORDER BY r_regionkey")
        val rows = Iterator.continually(rs)
          .takeWhile(_.next()).map(r => (r.getString(1), r.getInt(2))).toList
        assert(rows.length == 5, rows)
        assert(rows.head._1 == "AFRICA" && rows.head._2 == 0, rows)
        // a second statement exercises session reuse (ExecuteStatement
        // over an open HS2 session, impala-hs2-server.cc ExecuteStatement)
        val rs2 = st.executeQuery("SELECT 2 + 3")
        assert(rs2.next() && rs2.getInt(1) == 5)
      } finally conn.close()
    } finally server.stop()
  }
}
