package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Impala's SET statement surface: `SET <option>=<value>` stores a
  * session override, `SET ALL` lists every option as
  * (option, value, level) rows — the shape
  * `be/src/service/query-options.cc` TQueryOptionLevel drives
  * (REGULAR / ADVANCED / DEVELOPMENT / DEPRECATED / REMOVED).
  *
  * Options with semantics in this engine map onto the Spark confs the
  * engine reads (`graft.explain.level`, `graft.explain.noStreamingAgg`,
  * `graft.explain.partitionKeyScans`) directly in [[set]], so a product
  * `SET EXPLAIN_LEVEL=2; EXPLAIN …` behaves like Impala's without any
  * harness bridge. Unknown names are rejected with Impala's
  * `Invalid query option` error (`be/src/service/query-options.cc`
  * SetQueryOption); REMOVED options are accepted as silent no-ops with
  * any value (set.test pins both behaviors). Defaults below are the
  * reference TEST harness's effective session (its exec-option
  * dimensions pin abort_on_error=1 — tests/common/test_dimensions.py).
  */
object ImpalaOptions {

  /** (name, default, level) — the inventory set.test's SET ALL probes
    * pin, plus the options its blocks assign.
    */
  private val table: Seq[(String, String, String)] = Seq(
    ("ABORT_ON_ERROR", "1", "REGULAR"),
    ("BATCH_SIZE", "0", "DEVELOPMENT"),
    ("BUFFER_POOL_LIMIT", "", "ADVANCED"),
    ("DEBUG_ACTION", "", "DEVELOPMENT"),
    ("DISABLE_CODEGEN", "0", "REGULAR"),
    ("DISABLE_OUTERMOST_TOPN", "0", "DEVELOPMENT"),
    ("EXPLAIN_LEVEL", "STANDARD", "REGULAR"),
    ("HBASE_CACHE_BLOCKS", "0", "ADVANCED"),
    ("HBASE_CACHING", "0", "ADVANCED"),
    ("MAX_ERRORS", "100", "ADVANCED"),
    ("MAX_SCAN_RANGE_LENGTH", "0", "DEVELOPMENT"),
    ("MEM_LIMIT", "0", "REGULAR"),
    ("NUM_NODES", "0", "DEVELOPMENT"),
    ("NUM_SCANNER_THREADS", "0", "REGULAR"),
    ("COMPRESSION_CODEC", "", "REGULAR"),
    ("PARQUET_FILE_SIZE", "0", "ADVANCED"),
    ("REQUEST_POOL", "", "REGULAR"),
    ("SYNC_DDL", "0", "REGULAR"),
    ("DEFAULT_FILE_FORMAT", "TEXT", "REGULAR"),
    ("DISABLE_HDFS_NUM_ROWS_ESTIMATE", "0", "REGULAR"),
    ("MT_DOP", "", "REGULAR"),
    ("TIMEZONE", "", "REGULAR"),
    ("OPTIMIZE_PARTITION_KEY_SCANS", "0", "REGULAR"),
    ("DISABLE_STREAMING_PREAGGREGATIONS", "0", "REGULAR"),
    ("RUNTIME_FILTER_MODE", "GLOBAL", "REGULAR"),
    ("EXEC_SINGLE_NODE_ROWS_THRESHOLD", "100", "ADVANCED"))

  /** Options the reference's own test workloads assign beyond the SET
    * ALL inventory — all real entries in `query-options.cc`'s live
    * table. Accepted and stored (their execution knobs have no Spark
    * analog; the reference's goldens are invariant to them by design).
    */
  private val accepted: Set[String] = Set(
    "ALLOW_ERASURE_CODED_FILES", "APPX_COUNT_DISTINCT",
    "COMPRESSION_CODEC", "CPU_LIMIT_S", "DECIMAL_V2",
    "DEFAULT_JOIN_DISTRIBUTION_MODE", "DEFAULT_SPILLABLE_BUFFER_SIZE",
    "DEFAULT_TRANSACTIONAL_TYPE", "DISABLE_CODEGEN_ROWS_THRESHOLD",
    "DISABLE_UNSAFE_SPILLS", "ENABLE_EXPR_REWRITES",
    "ENABLED_RUNTIME_FILTER_TYPES", "EXEC_TIME_LIMIT_S",
    "KUDU_READ_MODE", "MAX_MEM_ESTIMATE_FOR_ADMISSION", "MAX_ROW_SIZE",
    "MIN_SPILLABLE_BUFFER_SIZE", "NOW_STRING", "NUM_ROWS_PRODUCED_LIMIT",
    "OPTIMIZE_SIMPLE_LIMIT", "PARQUET_ARRAY_RESOLUTION",
    "PARQUET_COMPRESSION_CODEC", "PARQUET_DICTIONARY_FILTERING",
    "PARQUET_FALLBACK_SCHEMA_RESOLUTION", "PARQUET_PAGE_ROW_COUNT_LIMIT",
    "PARQUET_READ_STATISTICS", "PARQUET_TIMESTAMP_TYPE",
    "PREAGG_BYTES_LIMIT", "PREFETCH_MODE", "REPLICA_PREFERENCE",
    "RUNTIME_BLOOM_FILTER_SIZE", "RUNTIME_FILTER_ERROR_RATE",
    "RUNTIME_FILTER_MAX_SIZE", "RUNTIME_FILTER_MIN_SIZE",
    "RUNTIME_FILTER_WAIT_TIME_MS", "SCAN_BYTES_LIMIT", "SCRATCH_LIMIT",
    "SPOOL_QUERY_RESULTS", "THREAD_RESERVATION_AGGREGATE_LIMIT",
    "THREAD_RESERVATION_LIMIT",
    "USE_LOCAL_TZ_FOR_UNIX_TIMESTAMP_CONVERSIONS",
    // remainder of query-options.h's live table (116 QUERY_OPT_FN
    // entries total) — valid names must store, not throw
    "ASYNC_CODEGEN", "BROADCAST_BYTES_LIMIT", "CLIENT_IDENTIFIER",
    "COMPUTE_STATS_MIN_SAMPLE_SIZE",
    "CONVERT_LEGACY_HIVE_PARQUET_UTC_TIMESTAMPS",
    "DEFAULT_HINTS_INSERT_STATEMENT", "DISABLE_DATA_CACHE",
    "DISABLE_HBASE_NUM_ROWS_ESTIMATE", "DISABLE_ROW_RUNTIME_FILTERING",
    "ENABLE_CNF_REWRITES", "ENABLE_DISTINCT_SEMI_JOIN_OPTIMIZATION",
    "ENABLE_OUTER_JOIN_TO_INNER_TRANSFORMATION", "FETCH_ROWS_TIMEOUT_MS",
    "IDLE_SESSION_TIMEOUT", "KUDU_SNAPSHOT_READ_TIMESTAMP_MICROS",
    "MAX_CNF_EXPRS", "MAX_FS_WRITERS", "MAX_NUM_RUNTIME_FILTERS",
    "MAX_RESULT_SPOOLING_MEM", "MAX_SPILLED_RESULT_SPOOLING_MEM",
    "MAX_STATEMENT_LENGTH_BYTES", "MEM_LIMIT_EXECUTORS",
    "NUM_REMOTE_EXECUTOR_CANDIDATES", "PARQUET_ANNOTATE_STRINGS_UTF8",
    "PARQUET_OBJECT_STORE_SPLIT_SIZE", "PARQUET_READ_PAGE_INDEX",
    "PARQUET_WRITE_PAGE_INDEX", "QUERY_TIMEOUT_S",
    "REFRESH_UPDATED_HMS_PARTITIONS", "REPORT_SKEW_LIMIT",
    "RESOURCE_TRACE_RATIO", "RETRY_FAILED_QUERIES",
    "S3_SKIP_INSERT_STAGING", "SCHEDULE_RANDOM_REPLICA",
    "SHUFFLE_DISTINCT_EXPRS", "SORT_RUN_BYTES_LIMIT",
    "SPOOL_ALL_RESULTS_FOR_RETRIES", "STATEMENT_EXPRESSION_LIMIT",
    "STRICT_MODE", "TARGETED_KUDU_SCAN_RANGE_LENGTH",
    "TOPN_BYTES_LIMIT")

  /** REMOVED options: any assignment is a silent no-op (set.test's
    * "Setting some removed query options should be a no-op" block;
    * query-options.h REMOVED_QUERY_OPT_FN).
    */
  private val removed: Set[String] = Set(
    "ABORT_ON_DEFAULT_LIMIT_EXCEEDED", "ALLOW_UNSUPPORTED_FORMATS",
    "DEFAULT_ORDER_BY_LIMIT", "DISABLE_CACHED_READS", "MAX_IO_BUFFERS",
    "RM_INITIAL_MEM", "RESERVATION_REQUEST_TIMEOUT",
    "SCAN_NODE_CODEGEN_THRESHOLD", "SEQ_COMPRESSION_MODE", "V_CPU_CORES")

  private val known =
    table.map(_._1).toSet ++ accepted ++ removed

  private def key(name: String) = s"graft.opt.${name.toUpperCase}"

  private val explainLevels =
    Map("0" -> "MINIMAL", "1" -> "STANDARD", "2" -> "EXTENDED",
      "3" -> "VERBOSE")

  /** The codec inventory `parquet_compression_codec` validates against
    * (`common/thrift/CatalogObjects.thrift` THdfsCompression, rendered
    * by query-options.cc's error).
    */
  private val codecs = Seq("NONE(0)", "DEFAULT(1)", "GZIP(2)",
    "DEFLATE(3)", "BZIP2(4)", "SNAPPY(5)", "SNAPPY_BLOCKED(6)", "LZO(7)",
    "LZ4(8)", "ZLIB(9)", "ZSTD(10)", "BROTLI(11)", "LZ4_BLOCKED(12)")

  /** Enum-valued options: (error-message noun, NAME(ordinal) values) —
    * query-options.cc's GetThriftEnum error shape, which set.test's
    * CATCH blocks pin. A value must be one of the names (any case) or
    * a listed ordinal.
    */
  private val enumOptions: Map[String, (String, Seq[String])] = Map(
    "EXPLAIN_LEVEL" -> ("explain level",
      Seq("MINIMAL(0)", "STANDARD(1)", "EXTENDED(2)", "VERBOSE(3)")),
    "RUNTIME_FILTER_MODE" -> ("runtime filter mode",
      Seq("OFF(0)", "LOCAL(1)", "GLOBAL(2)")),
    "REPLICA_PREFERENCE" -> ("replica memory distance preference",
      Seq("CACHE_LOCAL(0)", "DISK_LOCAL(2)", "REMOTE(4)")),
    "PARQUET_FALLBACK_SCHEMA_RESOLUTION" ->
      ("parquet fallback schema resolution",
        Seq("POSITION(0)", "NAME(1)")),
    "PARQUET_ARRAY_RESOLUTION" -> ("parquet array resolution",
      Seq("THREE_LEVEL(0)", "TWO_LEVEL(1)",
        "TWO_LEVEL_THEN_THREE_LEVEL(2)")),
    "PREFETCH_MODE" -> ("prefetch mode", Seq("NONE(0)", "HT_BUCKET(1)")),
    "DEFAULT_JOIN_DISTRIBUTION_MODE" ->
      ("default join distribution mode",
        Seq("BROADCAST(0)", "SHUFFLE(1)")),
    "KUDU_READ_MODE" -> ("Kudu read mode",
      Seq("DEFAULT(0)", "READ_LATEST(1)", "READ_AT_SNAPSHOT(2)")),
    "DEFAULT_FILE_FORMAT" -> ("default file format",
      Seq("TEXT(0)", "RC_FILE(1)", "SEQUENCE_FILE(2)", "AVRO(3)",
        "PARQUET(4)", "KUDU(5)", "ORC(6)", "HUDI_PARQUET(7)",
        "ICEBERG(8)")),
    "DEFAULT_TRANSACTIONAL_TYPE" -> ("default transactional type",
      Seq("NONE(0)", "INSERT_ONLY(1)")))

  /** Strip one pair of MATCHING surrounding quotes (Impala's option
    * parser unquotes balanced quotes only).
    */
  private def unquote(v: String): String =
    if (v.length >= 2 &&
        (v.head == '\'' || v.head == '"') && v.last == v.head)
      v.substring(1, v.length - 1)
    else v

  private def truthy(v: String): Boolean =
    Set("true", "1")(v.toLowerCase)

  /** Store a session override, validating the name (Impala rejects
    * unknown options) and the values set.test pins, then project the
    * options with engine semantics onto the confs the engine reads.
    */
  def set(spark: SparkSession, name: String, value0: String): Unit = {
    val upper = name.toUpperCase
    if (!known(upper))
      throw new IllegalArgumentException(s"Invalid query option: ${name.toLowerCase}")
    if (removed(upper)) return // no-op, any value
    val value = unquote(value0.trim)
    enumOptions.get(upper).foreach { case (noun, vals) =>
      val ok = value.isEmpty || vals.exists { v =>
        val name = v.takeWhile(_ != '(')
        val ord = v.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")")
        name.equalsIgnoreCase(value) || ord == value
      }
      if (!ok) throw new IllegalArgumentException(
        s"Invalid $noun: '$value'. Valid values are ${vals.mkString(", ")}.")
    }
    val norm = upper match {
      case "EXPLAIN_LEVEL" =>
        explainLevels.getOrElse(value,
          explainLevels.values.find(_.equalsIgnoreCase(value))
            .getOrElse(value.toUpperCase))
      case "PARQUET_COMPRESSION_CODEC" | "COMPRESSION_CODEC" =>
        val base = value.split(':').head // codec:level form
        if (value.nonEmpty &&
            !codecs.exists(_.startsWith(base.toUpperCase + "(")))
          throw new IllegalArgumentException(
            s"Invalid compression codec: '$value'. Valid values are " +
              codecs.mkString(", ") + ".")
        value
      case "PARQUET_FILE_SIZE" =>
        // bytes or a size suffix; capped below 2GB (query-options.cc)
        val bytes = """(?i)^(\d+)\s*([kmg]b?)?$""".r.findFirstMatchIn(value)
          .map { m =>
            val n = m.group(1).toLong
            Option(m.group(2)).map(_.toLowerCase.head) match {
              case Some('k') => n << 10
              case Some('m') => n << 20
              case Some('g') => n << 30
              case _ => n
            }
          }
        if (bytes.exists(_ >= (2L << 30)))
          throw new IllegalArgumentException(
            "The PARQUET_FILE_SIZE query option must be less than 2GB.")
        value
      case "MAX_ROW_SIZE" =>
        // ParseMemValue semantics: bytes or a [kmgt] suffix (the
        // reference's own workloads SET max_row_size=8m)
        val n = """(?i)^(\d+)\s*([kmgt]b?)?$""".r.findFirstMatchIn(value)
          .map { m =>
            val base = m.group(1).toLong
            Option(m.group(2)).map(_.toLowerCase.head) match {
              case Some('k') => base << 10
              case Some('m') => base << 20
              case Some('g') => base << 30
              case Some('t') => base << 40
              case _ => base
            }
          }.getOrElse(-1L)
        if (n < 1L || n > 1099511627776L)
          throw new IllegalArgumentException(
            s"Invalid max row size of $value. " +
              "Valid sizes are in [1, 1099511627776]")
        value
      case _ => value
    }
    spark.conf.set(key(name), norm)
    bridge(spark, upper, norm)
  }

  /** Project semantic options onto the engine's confs (the ones
    * ImpalaExplain / PartitionKeyScans actually read), so SET works
    * identically inside and outside the test harness.
    */
  private def bridge(spark: SparkSession, upper: String,
      norm: String): Unit = upper match {
    case "EXPLAIN_LEVEL" =>
      explainLevels.collectFirst { case (d, e) if e == norm => d }
        .foreach(spark.conf.set("graft.explain.level", _))
    case "OPTIMIZE_PARTITION_KEY_SCANS" =>
      if (truthy(norm))
        spark.conf.set("graft.explain.partitionKeyScans", "true")
      else scala.util.Try(
        spark.conf.unset("graft.explain.partitionKeyScans"))
    case "DISABLE_STREAMING_PREAGGREGATIONS" =>
      if (truthy(norm))
        spark.conf.set("graft.explain.noStreamingAgg", "true")
      else scala.util.Try(spark.conf.unset("graft.explain.noStreamingAgg"))
    case _ =>
  }

  def get(spark: SparkSession, name: String): Option[String] =
    spark.conf.getOption(key(name))

  /** Reset every override (the reference runner clears session options
    * between test blocks), including the bridged engine confs.
    */
  def clear(spark: SparkSession): Unit = {
    (table.map(_._1) ++ accepted)
      .foreach(n => scala.util.Try(spark.conf.unset(key(n))))
    Seq("graft.explain.level", "graft.explain.partitionKeyScans",
      "graft.explain.noStreamingAgg")
      .foreach(k => scala.util.Try(spark.conf.unset(k)))
  }

  /** SET ALL result rows. */
  def showAll(spark: SparkSession): DataFrame = {
    val rows = table.map { case (n, dflt, lvl) =>
      Row(n, get(spark, n).getOrElse(dflt), lvl)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("option", StringType),
        StructField("value", StringType),
        StructField("level", StringType))))
  }

  private val setAllRe = """(?is)^\s*set\s+all\s*;?\s*$""".r
  private val setRe =
    """(?is)^\s*set\s+([A-Za-z_]\w*)\s*=\s*(.*?)\s*;?\s*$""".r

  /** Intercept SET statements; None → not a SET. A plain `SET x=y`
    * returns an empty result like Impala's DDL-style response.
    */
  def intercept(spark: SparkSession, text: String): Option[DataFrame] =
    text match {
      case setAllRe() => Some(showAll(spark))
      case setRe(name, value) =>
        set(spark, name, value)
        Some(spark.createDataFrame(
          new java.util.ArrayList[Row](),
          StructType(Seq(StructField("result", StringType)))))
      case _ => None
    }
}
