package graft

/** Exact-value checks for the Impala alias layer (expr-test.cc style):
  * every registered alias name is exercised through SQL at least once.
  */
class AliasSpec extends SparkSpecBase {

  private def one[T](q: String): T =
    spark.sql(s"SELECT $q").head().get(0).asInstanceOf[T]

  test("math aliases") {
    assert(one[Number]("dceil(1.2)").longValue == 2L)
    assert(one[Number]("dfloor(1.8)").longValue == 1L)
    assert(one[Number]("dround(1.257, 2)").doubleValue == 1.26)
    assert(one[Number]("dsqrt(16.0)").doubleValue == 4.0)
    assert(one[Number]("dexp(0.0)").doubleValue == 1.0)
    assert(one[Number]("dlog10(1000.0)").doubleValue == 3.0)
    assert(one[Number]("dpow(2.0, 10.0)").doubleValue == 1024.0)
    assert(one[Number]("fpow(3.0, 2.0)").doubleValue == 9.0)
    assert(one[Number]("fmod(7.5, 2.0)").doubleValue == 1.5)
    assert(one[Number]("quotient(7, 2)").longValue == 3L)
    assert(one[Number]("truncate(3.789, 2)").doubleValue == 3.78)
    assert(one[Number]("truncate(-3.789, 2)").doubleValue == -3.78)
    assert(one[Number]("dtrunc(9.99)").doubleValue == 9.0)
    assert(one[Boolean]("is_inf(CAST('Infinity' AS DOUBLE))"))
    assert(!one[Boolean]("is_inf(1.0)"))
    assert(one[Boolean]("is_nan(CAST('NaN' AS DOUBLE))"))
    assert(one[Int]("max_int()") == Int.MaxValue)
    assert(one[Long]("max_bigint()") == Long.MaxValue)
    assert(one[Byte]("min_tinyint()") == Byte.MinValue)
    assert(one[Short]("max_smallint()") == Short.MaxValue)
  }

  test("string aliases") {
    assert(one[String]("strleft('hello', 3)") == "hel")
    assert(one[String]("strright('hello', 3)") == "llo")
    assert(one[String]("base64encode('abc')") == "YWJj")
    assert(one[String]("base64decode('YWJj')") == "abc")
    assert(one[Int]("regexp_match_count('a1b2c3', '[0-9]')") == 3)
    assert(one[String]("regexp_escape('a.b')") == "a\\.b")
    assert(one[Int]("charlength('abcd')") == 4)
    assert(one[Double]("jaro_winkler('abc', 'abc')") == 0.0)
  }

  test("timestamp arithmetic aliases (years/months/.../microseconds)") {
    val ts = "TIMESTAMP '2024-02-29 12:30:45.123456'"
    assert(one[java.sql.Timestamp](s"years_add($ts, 1)").toString ==
      "2025-02-28 12:30:45.123456")
    assert(one[java.sql.Timestamp](s"years_sub($ts, 4)").toString ==
      "2020-02-29 12:30:45.123456")
    assert(one[java.sql.Timestamp](s"months_add($ts, 1)").toString ==
      "2024-03-29 12:30:45.123456")
    assert(one[java.sql.Timestamp](s"weeks_add($ts, 1)").toString ==
      "2024-03-07 12:30:45.123456")
    assert(one[java.sql.Timestamp](s"days_sub($ts, 29)").toString ==
      "2024-01-31 12:30:45.123456")
    assert(one[java.sql.Timestamp](s"hours_add($ts, 12)").toString ==
      "2024-03-01 00:30:45.123456")
    assert(one[java.sql.Timestamp](s"minutes_sub($ts, 31)").toString ==
      "2024-02-29 11:59:45.123456")
    assert(one[java.sql.Timestamp](s"seconds_add($ts, 15)").toString ==
      "2024-02-29 12:31:00.123456")
    assert(one[java.sql.Timestamp](s"milliseconds_add($ts, 877)").toString ==
      "2024-02-29 12:30:46.000456")
    assert(one[java.sql.Timestamp](s"microseconds_sub($ts, 456)").toString ==
      "2024-02-29 12:30:45.123")
    assert(one[String](s"dayname($ts)") == "Thursday")
    assert(one[String](s"monthname($ts)") == "February")
    assert(one[Int](s"int_months_between($ts, TIMESTAMP '2023-11-15 00:00:00')") == 3)
    assert(one[Int](s"timestamp_cmp($ts, $ts)") == 0)
    assert(one[Int](s"timestamp_cmp($ts, TIMESTAMP '2025-01-01 00:00:00')") == -1)
    assert(one[AnyRef]("timestamp_cmp(CAST(NULL AS TIMESTAMP), TIMESTAMP '2025-01-01 00:00:00')") == null)
  }

  test("mask aliases (mask-functions-ir.cc positional variants)") {
    assert(one[String]("mask_hash('abc')") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(one[String]("mask_first_n('abcd1234', 4)") == "xxxx1234")
    assert(one[String]("mask_last_n('abcd1234', 4)") == "abcdnnnn")
    assert(one[String]("mask_show_first_n('abcd1234', 4)") == "abcdnnnn")
    assert(one[String]("mask_show_last_n('abcd1234', 4)") == "xxxx1234")
    assert(one[String]("mask_last_n('ab', 4)") == "xx")
    assert(one[String]("mask_show_last_n('ab', 4)") == "ab")
  }

  test("utility + aggregate aliases") {
    assert(one[String]("effective_user()") != null)
    assert(one[Boolean]("sleep(100)"))
    GraftSession.registerAll(spark, sfDir)
    val ndv = spark.sql("SELECT ndv(c_custkey) FROM customer").head().getLong(0)
    val exact = spark.sql("SELECT COUNT(DISTINCT c_custkey) FROM customer")
      .head().getLong(0)
    assert(math.abs(ndv - exact).toDouble / exact < 0.1)
    val med = spark.sql("SELECT appx_median(l_quantity) FROM lineitem")
      .head().getDouble(0)
    assert(med >= 20 && med <= 30)
    val gc = spark.sql(
      "SELECT group_concat(r_name, '|') FROM (SELECT r_name FROM region ORDER BY r_name)")
      .head().getString(0)
    assert(gc.split("\\|").sorted.toSeq ==
      Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
    // DISTINCT flows through the native AggregateFunction (round-1 gap:
    // the alias-builder path dropped it)
    val gcd = spark.sql(
      """SELECT group_concat(DISTINCT n_regionkey, ',') FROM nation""")
      .head().getString(0)
    assert(gcd.split(",").sorted.toSeq == Seq("0", "1", "2", "3", "4"))
    // empty group → NULL; nulls skipped; default separator ', '
    assert(spark.sql(
      "SELECT group_concat(r_name) FROM region WHERE r_regionkey < 0")
      .head().isNullAt(0))
    val gcn = spark.sql(
      """SELECT group_concat(v) FROM (SELECT CASE WHEN r_regionkey = 0 THEN NULL
         ELSE r_name END AS v FROM region ORDER BY r_name)""").head().getString(0)
    assert(gcn.split(", ").length == 4)
  }
}
