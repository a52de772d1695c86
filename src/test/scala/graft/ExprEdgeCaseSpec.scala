package graft

/** Edge-case hardening in the spirit of the reference's
  * `be/src/exprs/expr-test.cc` (10k LoC of per-builtin corner cases):
  * null propagation, negative/boundary arithmetic, unicode, empty
  * strings, extreme arguments — through the SQL surface.
  */
class ExprEdgeCaseSpec extends SparkSpecBase {

  private def row(q: String) = spark.sql(s"SELECT $q").head()

  test("null propagation through scalar functions") {
    val r = row("""1 + CAST(NULL AS INT), concat('a', CAST(NULL AS STRING)),
                   upper(CAST(NULL AS STRING)), abs(CAST(NULL AS DOUBLE)),
                   coalesce(CAST(NULL AS INT), CAST(NULL AS INT), 3)""")
    (0 to 3).foreach(i => assert(r.isNullAt(i), s"pos $i"))
    assert(r.getInt(4) == 3)
  }

  test("null propagation through custom expressions") {
    val r = row("""fnv_hash(CAST(NULL AS STRING)),
                   damerau_levenshtein(CAST(NULL AS STRING), 'x'),
                   rotateleft(CAST(NULL AS INT), 1),
                   jaro_similarity('a', CAST(NULL AS STRING))""")
    (0 to 3).foreach(i => assert(r.isNullAt(i), s"pos $i"))
  }

  test("negative and boundary integer arithmetic") {
    val r = row("""-7 % 3, pmod(-7, 3), -7 div 3,
                   CAST(-128 AS TINYINT)""")
    assert(r.getInt(0) == -1) // % keeps sign of dividend
    assert(r.getInt(1) == 2)  // pmod non-negative
    assert(r.getLong(2) == -2) // div truncates toward zero
    assert(r.getByte(3) == Byte.MinValue)
    // ANSI (like DECIMAL_V2's stance): abs at the type minimum errors
    // instead of silently wrapping
    val e = intercept[Exception](row("abs(CAST(-32768 AS SMALLINT))"))
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }

  test("string edges: empty, unicode, multibyte-aware length/substr") {
    val r = row("""length(''), length('héllo'), length('日本語'),
                   substr('日本語', 2, 1), reverse('ab日'),
                   upper('ß'), instr('', 'x'), repeat('ab', 0)""")
    assert(r.getInt(0) == 0)
    assert(r.getInt(1) == 5) // chars, not bytes
    assert(r.getInt(2) == 3)
    assert(r.getString(3) == "本")
    assert(r.getString(4) == "日ba")
    assert(r.getString(5) == "SS")
    assert(r.getInt(6) == 0)
    assert(r.getString(7) == "")
  }

  test("custom distances on unicode and empty strings") {
    assert(row("damerau_levenshtein('', '')").getInt(0) == 0)
    assert(row("damerau_levenshtein('日本', '本日')").getInt(0) == 1) // transposition
    assert(row("jaro_similarity('', '')").getDouble(0) == 1.0)
    assert(row("jaro_similarity('', 'abc')").getDouble(0) == 0.0)
  }

  test("float special values flow through aggregation") {
    val r = spark.sql(
      """SELECT sum(x), max(x), min(x), count(x)
         FROM VALUES (CAST('NaN' AS DOUBLE)), (1.0d),
                     (CAST('Infinity' AS DOUBLE)) AS t(x)""").head()
    assert(r.getDouble(0).isNaN)
    assert(r.getDouble(1).isNaN) // NaN sorts greatest in Spark and Impala
    assert(r.getDouble(2) == 1.0)
    assert(r.getLong(3) == 3)
  }

  test("timestamp boundaries: leap day arithmetic and epoch edges") {
    assert(row("date_add(DATE '2024-02-29', 365)").getDate(0).toString ==
      "2025-02-28")
    assert(row("years_add(TIMESTAMP '2024-02-29 00:00:00', 1)")
      .getTimestamp(0).toString == "2025-02-28 00:00:00.0")
    assert(row("unix_timestamp(TIMESTAMP '1970-01-01 00:00:00')")
      .getLong(0) == 0L)
    assert(row("from_unixtime(-1)").getString(0) == "1969-12-31 23:59:59")
  }

  test("bit ops at width boundaries") {
    assert(row("countset(CAST(-1 AS TINYINT))").getInt(0) == 8)
    assert(row("getbit(CAST(-128 AS TINYINT), 7)").getByte(0) == 1)
    assert(row("setbit(CAST(0 AS BIGINT), 63)").getLong(0) == Long.MinValue)
    assert(row("rotateleft(CAST(-9223372036854775808 AS BIGINT), 1)")
      .getLong(0) == 1L)
  }

  test("sketch functions on empty and single-value input") {
    val r = spark.sql(
      """SELECT ndv_hll(x), ds_kll_n(ds_kll_sketch(x)),
                histogram(x)
         FROM (SELECT CAST(NULL AS INT) AS x WHERE false)""").head()
    assert(r.getLong(0) == 0L)
    // reference DsKllFinalizeSketch: empty group → NULL sketch → NULL n
    assert(r.isNullAt(1))
    // Impala histogram() of zero rows is NULL (HistogramFinalize on a
    // null intermediate)
    assert(r.isNullAt(2))
    val one = spark.sql(
      "SELECT ndv_hll(x), ds_kll_quantile(ds_kll_sketch(x), CAST(0.5 AS DOUBLE)) FROM VALUES (42) t(x)")
      .head()
    assert(one.getLong(0) == 1L)
    assert(one.getFloat(1) == 42.0f)
  }
}
