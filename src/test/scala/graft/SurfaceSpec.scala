package graft

/** Surface-completeness check: every function name claimed in SURVEY §2.8
  * / §2.4 (the reference registry's user-facing names, minus the
  * intentionally-out-of-scope ones) must resolve in a tuned session —
  * as a Spark builtin, an alias, or a native expression.
  */
class SurfaceSpec extends SparkSpecBase {

  private val names = Seq(
    // math (math-functions-ir.cc)
    "abs", "ceil", "ceiling", "floor", "round", "truncate", "exp", "ln",
    "log", "log2", "log10", "pow", "power", "sqrt", "sin", "cos", "tan",
    "asin", "acos", "atan", "atan2", "sinh", "cosh", "tanh", "cot",
    "degrees", "radians", "pi", "e", "sign", "mod", "fmod", "pmod",
    "factorial", "conv", "bin", "hex", "unhex", "greatest", "least",
    "rand", "quotient", "width_bucket", "positive", "negative",
    "dceil", "dfloor", "dround", "dsqrt", "dexp", "dlog10", "dpow",
    "is_inf", "is_nan", "isnan",
    "max_int", "min_int", "max_bigint", "min_bigint", "max_tinyint",
    "min_tinyint", "max_smallint", "min_smallint",
    // string (string-functions-ir.cc)
    "length", "char_length", "lower", "upper", "initcap", "concat",
    "concat_ws", "substr", "substring", "left", "right", "lpad", "rpad",
    "trim", "ltrim", "rtrim", "btrim", "space", "repeat", "reverse",
    "translate", "replace", "ascii", "chr", "instr", "locate",
    "find_in_set", "split_part", "parse_url", "regexp_extract",
    "regexp_like", "regexp_replace", "regexp_count", "regexp_match_count",
    "base64encode", "base64decode", "levenshtein", "damerau_levenshtein",
    "jaro_distance", "jaro_similarity", "jaro_winkler_distance",
    "jaro_winkler_similarity", "strleft", "strright",
    // json
    "get_json_object", "from_json", "to_json", "json_tuple",
    // timestamp/date (timestamp-functions-ir.cc, date-functions-ir.cc)
    "now", "current_date", "current_timestamp", "unix_timestamp",
    "from_unixtime", "to_timestamp", "date_add", "date_sub", "datediff",
    "date_trunc", "trunc", "extract", "date_part", "year", "quarter",
    "month", "day", "hour", "minute", "second", "dayname", "monthname",
    "dayofweek", "dayofyear", "weekofyear", "next_day", "last_day",
    "months_between", "int_months_between", "to_utc_timestamp",
    "from_utc_timestamp", "years_add", "years_sub", "months_add",
    "months_sub", "weeks_add", "weeks_sub", "days_add", "days_sub",
    "hours_add", "hours_sub", "minutes_add", "minutes_sub", "seconds_add",
    "seconds_sub", "milliseconds_add", "milliseconds_sub",
    "microseconds_add", "microseconds_sub", "timestamp_cmp",
    "unix_micros_to_utc_timestamp", "utc_to_unix_micros", "utc_timestamp",
    // conditional (conditional-functions.h)
    "if", "ifnull", "isnull", "nvl", "nvl2", "coalesce", "nullif",
    "zeroifnull", "nullifzero", "decode", "istrue", "isfalse",
    "isnottrue", "isnotfalse", "nonnullvalue", "nullvalue", // CASE = grammar
    // bit/byte (bit-byte-functions-ir.cc)
    "shiftleft", "shiftright", "rotateleft", "rotateright", "setbit",
    "getbit", "countset", "bit_count",
    // hash/utility (utility-functions-ir.cc)
    "fnv_hash", "murmur_hash", "uuid", "sleep", "user", "current_user",
    "effective_user", "current_database", "version", "typeof",
    // masking (mask-functions-ir.cc)
    "mask", "mask_first_n", "mask_last_n", "mask_show_first_n",
    "mask_show_last_n", "mask_hash",
    // aggregates (BuiltinsDb.java)
    "count", "min", "max", "sum", "avg", "ndv", "ndv_hll",
    "appx_median", "percentile_approx", "histogram", "sampled_ndv",
    "pc", "pcsa", "stddev", "stddev_samp", "stddev_pop", "variance",
    "var_samp", "var_pop", "group_concat", "corr", "covar_pop",
    "covar_samp",
    // datasketches (datasketches-functions-ir.cc)
    "ds_hll_sketch", "ds_hll_union", "ds_hll_estimate", "ds_hll_stringify",
    "ds_hll_sketch_and_estimate", "ds_hll_union_f",
    "ds_hll_estimate_bounds_as_string",
    "ds_kll_sketch", "ds_kll_union", "ds_kll_quantile", "ds_kll_rank",
    "ds_kll_n", "ds_kll_cdf", "ds_kll_pmf", "ds_kll_quantiles_as_string",
    "ds_kll_cdf_as_string", "ds_kll_pmf_as_string", "ds_kll_stringify",
    // analytic (AnalyticExpr.java)
    "rank", "dense_rank", "row_number", "percent_rank", "cume_dist",
    "ntile", "lead", "lag", "first_value", "last_value", "first", "last",
    // pipeline kernels (ours)
    "shingle_hashes", "minhash_signature", "simhash64", "simhash_text",
    "vec_dot", "vec_cosine", "vec_norm",
  )

  test("every claimed function name resolves in the session") {
    GraftSession.tune(spark)
    val reg = spark.sessionState.functionRegistry
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .functionSet.map(_.funcName).toSet
    val missing = names.filterNot { n =>
      reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(n)) ||
        builtin.contains(n)
    }
    assert(missing.isEmpty, s"unresolvable: ${missing.mkString(", ")}")
  }
}
