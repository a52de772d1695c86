package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Impala's SET statement surface: `SET <option>=<value>` stores a
  * session override, `SET ALL` lists every option as
  * (option, value, level) rows — the shape
  * `be/src/service/query-options.cc` TQueryOptionLevel drives
  * (REGULAR / ADVANCED / DEVELOPMENT / DEPRECATED / REMOVED).
  *
  * Options whose semantics exist in this engine map onto Spark confs
  * at the call sites (`graft.explain.level` etc.); the rest are
  * session bookkeeping, as in Impala where unset options simply hold
  * their defaults. Defaults below are the reference TEST harness's
  * effective session (its exec-option dimensions pin abort_on_error=1
  * — tests/common/test_dimensions.py).
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

  private val known = table.map(_._1).toSet

  private def key(name: String) = s"graft.opt.${name.toUpperCase}"

  private val explainLevels =
    Map("0" -> "MINIMAL", "1" -> "STANDARD", "2" -> "EXTENDED",
      "3" -> "VERBOSE")

  /** Store a session override (values normalize like Impala's parser:
    * surrounding quotes strip; EXPLAIN_LEVEL keeps its enum name).
    */
  def set(spark: SparkSession, name: String, value0: String): Unit = {
    val value = value0.trim
      .stripPrefix("'").stripSuffix("'")
      .stripPrefix("\"").stripSuffix("\"")
    val norm = name.toUpperCase match {
      case "EXPLAIN_LEVEL" =>
        explainLevels.getOrElse(value,
          explainLevels.values.find(_.equalsIgnoreCase(value))
            .getOrElse(value.toUpperCase))
      case _ => value
    }
    spark.conf.set(key(name), norm)
  }

  def get(spark: SparkSession, name: String): Option[String] =
    spark.conf.getOption(key(name))

  /** Reset every override (the reference runner clears session options
    * between test blocks).
    */
  def clear(spark: SparkSession): Unit =
    table.foreach(t => scala.util.Try(spark.conf.unset(key(t._1))))

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
