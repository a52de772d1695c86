package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._

/** Impala builtin names that are aliases / thin compositions of Spark
  * built-ins (reference registry: `common/function-registry/
  * impala_functions.py` — 218 distinct names; registration
  * `fe/.../catalog/BuiltinsDb.java`; impls under `be/src/exprs/`).
  * Registered on the session's FunctionRegistry so Impala SQL text runs
  * where only the name differs; true semantic gaps get native
  * expressions instead (HashExpressions/BitExpressions/StringDistance/
  * Sketches/DedupExpressions).
  */
object Aliases {

  /** Unresolved call — the analyzer resolves it on the next pass, so we
    * can alias to any builtin without naming its Expression class.
    */
  private def call(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  private def lit(v: Any): Expression = Literal(v)
  private def str(s: String): Expression = Literal.create(s,
    org.apache.spark.sql.types.StringType)

  /** timestampadd with a fixed unit (timestamp-functions-ir.cc
    * years_add/months_add/... family).
    */
  private def tsAdd(unit: String, neg: Boolean)(a: Seq[Expression]): Expression = {
    val qty = if (neg) UnaryMinus(a(1)) else a(1)
    TimestampAdd(unit, qty, a(0))
  }

  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    // ---- conditional (be/src/exprs/conditional-functions.h)
    "nvl" -> (a => call("coalesce", a: _*)),
    // ---- aggregate name variants (BuiltinsDb.java variance family)
    "variance_pop" -> (a => call("var_pop", a: _*)),
    "variance_samp" -> (a => call("var_samp", a: _*)),
    "isnull" -> (a =>
      if (a.length == 1) IsNull(a.head) else call("coalesce", a: _*)),
    "nvl2" -> (a => If(IsNotNull(a(0)), a(1), a(2))),
    "zeroifnull" -> (a => call("coalesce", a.head, lit(0))),
    "nullifzero" -> (a => call("nullif", a.head, lit(0))),
    "istrue" -> (a => And(IsNotNull(a.head), a.head)),
    "isfalse" -> (a => And(IsNotNull(a.head), Not(a.head))),
    "isnottrue" -> (a => Or(IsNull(a.head), Not(a.head))),
    "isnotfalse" -> (a => Or(IsNull(a.head), a.head)),
    "nonnullvalue" -> (a => IsNotNull(a.head)),
    "nullvalue" -> (a => IsNull(a.head)),
    // ---- bit functions (bit-byte-functions-ir.cc BitAnd/Or/Xor/Not)
    "bitand" -> (a => BitwiseAnd(a(0), a(1))),
    "bitor" -> (a => BitwiseOr(a(0), a(1))),
    "bitxor" -> (a => BitwiseXor(a(0), a(1))),
    "bitnot" -> (a => BitwiseNot(a.head)),
    // from_timestamp(ts|str, fmt) — format a timestamp as a string
    // (timestamp-functions-ir.cc FromTimestamp; the pattern vocabulary
    // is SimpleDateFormat-compatible, same as Spark's date_format)
    "from_timestamp" -> (a => call("date_format",
      Cast(a(0), org.apache.spark.sql.types.TimestampType), a(1))),
    // ---- string (be/src/exprs/string-functions-ir.cc)
    "strleft" -> (a => call("left", a: _*)),
    "strright" -> (a => call("right", a: _*)),
    "base64encode" -> (a => call("base64", a.head)),
    "base64decode" -> (a => ImpalaBase64Decode(a.head)),
    "regexp_match_count" -> (a => regexpMatchCount(a)),
    "regexp_escape" -> (a => call("regexp_replace", a.head,
      str("([.\\\\+*?\\[^\\]$(){}=!<>|:\\-#])"), str("\\\\$1"))),
    "charlength" -> (a => call("char_length", a.head)),
    "jaro_winkler" -> (a => JaroWinklerDistance(a(0), a(1))),
    // ---- math (be/src/exprs/math-functions-ir.cc)
    "dround" -> (a => call("round", a: _*)),
    "dceil" -> (a => call("ceil", a.head)),
    "dfloor" -> (a => call("floor", a.head)),
    "dsqrt" -> (a => call("sqrt", a.head)),
    "dexp" -> (a => call("exp", a.head)),
    "dlog10" -> (a => call("log10", a.head)),
    "dpow" -> (a => call("power", a: _*)),
    "fpow" -> (a => call("power", a: _*)),
    "fmod" -> (a => call("mod", a: _*)),
    "quotient" -> (a => call("div", a: _*)),
    "truncate" -> (a => numericTrunc(a)),
    "dtrunc" -> (a => numericTrunc(a)),
    "is_inf" -> (a => EqualTo(call("abs", a.head), lit(Double.PositiveInfinity))),
    "is_nan" -> (a => call("isnan", a.head)),
    // type-limit constants (impala_functions.py max_int/min_int family)
    "max_tinyint" -> (_ => lit(Byte.MaxValue)),
    "min_tinyint" -> (_ => lit(Byte.MinValue)),
    "max_smallint" -> (_ => lit(Short.MaxValue)),
    "min_smallint" -> (_ => lit(Short.MinValue)),
    "max_int" -> (_ => lit(Int.MaxValue)),
    "min_int" -> (_ => lit(Int.MinValue)),
    "max_bigint" -> (_ => lit(Long.MaxValue)),
    "min_bigint" -> (_ => lit(Long.MinValue)),
    // ---- timestamp/date (be/src/exprs/timestamp-functions-ir.cc)
    "years_add" -> tsAdd("YEAR", neg = false),
    "years_sub" -> tsAdd("YEAR", neg = true),
    "months_add" -> tsAdd("MONTH", neg = false),
    "months_sub" -> tsAdd("MONTH", neg = true),
    "weeks_add" -> tsAdd("WEEK", neg = false),
    "weeks_sub" -> tsAdd("WEEK", neg = true),
    "days_add" -> tsAdd("DAY", neg = false),
    "days_sub" -> tsAdd("DAY", neg = true),
    "hours_add" -> tsAdd("HOUR", neg = false),
    "hours_sub" -> tsAdd("HOUR", neg = true),
    "minutes_add" -> tsAdd("MINUTE", neg = false),
    "minutes_sub" -> tsAdd("MINUTE", neg = true),
    "seconds_add" -> tsAdd("SECOND", neg = false),
    "seconds_sub" -> tsAdd("SECOND", neg = true),
    "milliseconds_add" -> tsAdd("MILLISECOND", neg = false),
    "milliseconds_sub" -> tsAdd("MILLISECOND", neg = true),
    "microseconds_add" -> tsAdd("MICROSECOND", neg = false),
    "microseconds_sub" -> tsAdd("MICROSECOND", neg = true),
    "dayname" -> (a => call("date_format", a.head, str("EEEE"))),
    "monthname" -> (a => call("date_format", a.head, str("MMMM"))),
    "int_months_between" -> (a =>
      Cast(call("floor", call("months_between", a(0), a(1))),
        org.apache.spark.sql.types.IntegerType)),
    "utc_timestamp" -> (_ => call("to_utc_timestamp",
      call("current_timestamp"), call("current_timezone"))),
    // range-clamped: Impala nullifies outside [1400-01-01,
    // 9999-12-31.999999] (timestamp-value.h, utc-timestamp-functions
    // .test) where Spark represents any year
    "unix_micros_to_utc_timestamp" -> (a =>
      ImpalaTsValid(call("timestamp_micros", a.head))),
    "utc_to_unix_micros" -> (a => call("unix_micros", a.head)),
    "timestamp_cmp" -> (a => If(Or(IsNull(a(0)), IsNull(a(1))),
      Literal.create(null, org.apache.spark.sql.types.IntegerType),
      If(GreaterThan(a(0), a(1)), lit(1),
        If(LessThan(a(0), a(1)), lit(-1), lit(0))))),
    // ---- utility (be/src/exprs/utility-functions-ir.cc)
    "effective_user" -> (_ => call("current_user")),
    "current_database_impala" -> (_ => call("current_database")),
    "sleep" -> (a => lit(true)), // no-op in a declarative engine
    // ---- masking (be/src/exprs/mask-functions-ir.cc; Spark `mask` does
    // the per-char classes, these add Impala's positional variants)
    "mask_hash" -> (a => call("sha2", a.head, lit(256))),
    "mask_first_n" -> (a => maskFirstN(a)),
    "mask_last_n" -> (a => maskLastN(a)),
    "mask_show_first_n" -> (a => maskShowFirstN(a)),
    "mask_show_last_n" -> (a => maskShowLastN(a)),
    // ---- aggregates (fe/.../catalog/BuiltinsDb.java:913-1288)
    // ndv() IS the reference HLL (NdvHll replicates HllUpdate/
    // HllFinalEstimate bit-for-bit at the default precision 10, pinned
    // by distinct-estimate.test/date.test goldens); the scaled 2-arg
    // form maps to Spark's HLL++ at estimate level
    "ndv" -> (a =>
      if (a.length == 1) NdvHll(a.head)
      else call("approx_count_distinct", a.head)),
    // distinctpc/distinctpcsa (BuiltinsDb.java:1106-1117): bit-exact
    // Flajolet-Martin replication, pinned by distinct-estimate.test
    // goldens; the short pc/pcsa names kept as aliases
    "distinctpc" -> (a => PcEstimate(a.head, pcsa = false)),
    "distinctpcsa" -> (a => PcEstimate(a.head, pcsa = true)),
    "pc" -> (a => PcEstimate(a.head, pcsa = false)),
    "pcsa" -> (a => PcEstimate(a.head, pcsa = true)),
    // sampled_ndv (BuiltinsDb.java:1086) — HLL-backed estimate
    "sampled_ndv" -> (a => call("approx_count_distinct", a.head)),
    // the reference's reservoir median, type-preserving (DATE in →
    // DATE out) — percentile_approx can't express that
    "appx_median" -> (a => AppxMedianAgg(a.head)),
    // the reservoir sample printer (ReservoirSampleFinalize)
    "sample" -> (a => SampleAgg(a.head)),
    // group_concat lives in GraftFunctions as a true AggregateFunction
    // (alias composition can't see the DISTINCT flag)
  )

  /** truncate(x[, d]): toward-zero rounding at d decimal places
    * (math-functions-ir.cc TruncDecimal — ROUND ... HALF gives away,
    * so compose from floor/ceil by sign).
    */
  private def numericTrunc(a: Seq[Expression]): Expression = {
    val d = if (a.length > 1) a(1) else lit(0)
    val scale = call("power", lit(10.0), d)
    val scaled = Multiply(Cast(a.head, org.apache.spark.sql.types.DoubleType), scale)
    Divide(If(GreaterThanOrEqual(a.head, lit(0)),
      call("floor", scaled), call("ceil", scaled)), scale)
  }

  /** regexp_match_count(str, pat[, start_pos[, params]])
    * (string-functions-ir.cc RegexpMatchCount): 1-based start offset;
    * params i/c = case-insensitive/sensitive (LAST one wins), m =
    * multiline anchors, n = '.' matches newline — mapped to the Java
    * embedded flags (?i)(?m)(?s) on the pattern.
    */
  private def regexpMatchCount(a: Seq[Expression]): Expression = {
    if (a.length <= 2) return call("regexp_count", a(0), a(1))
    // Impala validates the start offset (≥1) and the match-parameter
    // alphabet at runtime (string-functions-ir.cc) — exprs.test CATCH
    val subject = call("substr", a(0), ImpalaRegexpStartPos(a(2)))
    if (a.length == 3) return call("regexp_count", subject, a(1))
    val p = ImpalaRegexpParams(a(3))
    val rev = call("reverse", p)
    val ri = call("instr", rev, str("i"))
    val rc = call("instr", rev, str("c"))
    val ci = And(GreaterThan(ri, lit(0)),
      Or(LessThanOrEqual(rc, lit(0)), LessThan(ri, rc)))
    val prefix = call("concat",
      If(ci, str("(?i)"), str("")),
      If(GreaterThan(call("instr", p, str("m")), lit(0)),
        str("(?m)"), str("")),
      If(GreaterThan(call("instr", p, str("n")), lit(0)),
        str("(?s)"), str("")))
    call("regexp_count", subject, call("concat", prefix, a(1)))
  }

  private def n2(a: Seq[Expression]): Expression =
    if (a.length > 1) a(1) else lit(4)

  private def maskFirstN(a: Seq[Expression]): Expression =
    call("concat", call("mask", call("left", a(0), n2(a))),
      call("substr", a(0), Add(n2(a), lit(1))))

  private def maskLastN(a: Seq[Expression]): Expression =
    If(LessThanOrEqual(call("char_length", a(0)), n2(a)),
      call("mask", a(0)),
      call("concat",
        call("left", a(0), Subtract(call("char_length", a(0)), n2(a))),
        call("mask", call("right", a(0), n2(a)))))

  private def maskShowFirstN(a: Seq[Expression]): Expression =
    call("concat", call("left", a(0), n2(a)),
      call("mask", call("substr", a(0), Add(n2(a), lit(1)))))

  private def maskShowLastN(a: Seq[Expression]): Expression =
    If(LessThanOrEqual(call("char_length", a(0)), n2(a)),
      a(0),
      call("concat",
        call("mask", call("left", a(0),
          Subtract(call("char_length", a(0)), n2(a)))),
        call("right", a(0), n2(a))))

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  def names: Seq[String] = builders.keys.toSeq.sorted
}
