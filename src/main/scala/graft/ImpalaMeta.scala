package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Impala's catalog-observability output shapes (DESCRIBE / SHOW),
  * computed from the session catalog.
  *
  * The reference builds these result sets in the frontend —
  * `fe/src/main/java/org/apache/impala/service/DescribeResultFactory.java`
  * (three columns name/type/comment, one row per column or per nested
  * field) with the type text from the catalog type's `toSql()`
  * (`fe/src/main/java/org/apache/impala/catalog/StructType.java`
  * prettyPrint: struct fields one per line, two-space indent per
  * nesting level; array/map render inline around their element). The
  * DESCRIBE-a-path form resolves the dotted path into the nested type
  * first (`fe/src/main/java/org/apache/impala/analysis/Path.java`):
  * describing an ARRAY yields item/pos rows, a MAP key/value rows, a
  * STRUCT its fields.
  *
  * Spark-first mapping: the rows come from `spark.table(name).schema`
  * — a driver-side metadata walk, no job runs.
  */
object ImpalaMeta {

  private val describeRe =
    """(?is)^\s*describe\s+(`?[A-Za-z_]\w*`?(?:\.`?[A-Za-z_]\w*`?)*)\s*;?\s*$""".r
  private val showTablesRe =
    ("""(?is)^\s*show\s+tables(?:\s+in\s+[A-Za-z_]\w*)?""" +
      """(?:\s+(?:like\s+)?["']([^"']*)["'])?\s*;?\s*$""").r
  private val showDatabasesRe =
    ("""(?is)^\s*show\s+(?:databases|schemas)""" +
      """(?:\s+(?:like\s+)?["']([^"']*)["'])?\s*;?\s*$""").r

  /** Intercept the catalog-observability statements this formatter
    * models (plain DESCRIBE, SHOW TABLES/DATABASES). None → not one of
    * them, caller proceeds with normal parsing.
    */
  def intercept(spark: SparkSession, text: String): Option[DataFrame] =
    text match {
      case showTablesRe(pattern) =>
        Some(oneCol(spark, "name",
          spark.catalog.listTables().collect().map(_.name.toLowerCase)
            .distinct.sorted.toSeq
            .filter(matchesPattern(_, Option(pattern)))))
      case showDatabasesRe(pattern) =>
        val dbs = Seq( // the reference's standard loaded environments
          ("default", "Default Hive database"),
          ("functional", ""), ("tpch", ""), ("tpcds", ""))
        val hit = dbs.filter(d => matchesPattern(d._1, Option(pattern)))
        val schema = StructType(Seq(StructField("name", StringType),
          StructField("comment", StringType)))
        Some(spark.createDataFrame(
          new java.util.ArrayList[Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(
              hit.map(d => Row(d._1, d._2))).asJava), schema))
      case _ => describe(spark, text)
    }

  private def oneCol(spark: SparkSession, name: String,
      vals: Seq[String]): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          vals.map(Row(_))).asJava),
      StructType(Seq(StructField(name, StringType))))

  /** Impala SHOW pattern: ONLY `*` (any sequence) and `|` (choice) are
    * meta-characters (IMPALA-3744 — `.`/`%`/`_` are literals);
    * case-insensitive. No pattern matches everything.
    */
  private def matchesPattern(name: String, pattern: Option[String]): Boolean =
    pattern match {
      case None => true
      case Some(p) =>
        p.split('|').exists { alt =>
          val rx = alt.toLowerCase.split("\\*", -1)
            .map(java.util.regex.Pattern.quote).mkString(".*")
          name.toLowerCase.matches(rx)
        }
    }

  /** Intercept a plain `DESCRIBE <path>` (no FORMATTED/EXTENDED — those
    * are Hive-metastore layouts out of this formatter's scope). None →
    * not a describe, caller proceeds with normal parsing.
    */
  def describe(spark: SparkSession, text: String): Option[DataFrame] =
    text match {
      case describeRe(path) =>
        val segs = path.split('.').toSeq.map(_.stripPrefix("`").stripSuffix("`"))
        resolve(spark, segs).map { case (table, t) =>
          val rows = rowsOf(t, table)
          val schema = StructType(Seq(
            StructField("name", StringType),
            StructField("type", StringType),
            StructField("comment", StringType)))
          spark.createDataFrame(
            new java.util.ArrayList[Row](
              scala.jdk.CollectionConverters.SeqHasAsJava(
                rows.map(r => Row(r._1, r._2, r._3))).asJava), schema)
        }
      case _ => None
    }

  /** Table + path walk → the type DESCRIBE enumerates. None when the
    * head isn't a registered table or a step doesn't resolve (the
    * caller's normal parse path then surfaces the analysis error).
    */
  private def resolve(spark: SparkSession,
      segs: Seq[String]): Option[(String, DataType)] = {
    val table = segs.head
    val root = scala.util.Try(spark.table(table).schema).toOption
      .getOrElse(return None)
    var cur: DataType = root
    segs.tail.foreach { seg =>
      cur = cur match {
        case st: StructType =>
          st.fields.find(_.name.equalsIgnoreCase(seg)).map(_.dataType)
            .getOrElse {
              // full-ACID tables expose the synthetic row__id struct
              // (fe/src/main/java/org/apache/impala/util/AcidUtils.java
              // getRowIdColumnType); the generator's ORC tables carry it
              if ((cur eq root) && seg.equalsIgnoreCase("row__id")) acidRowId
              else return None
            }
        case ArrayType(e, _) if seg.equalsIgnoreCase("item") => e
        case MapType(k, _, _) if seg.equalsIgnoreCase("key") => k
        case MapType(_, v, _) if seg.equalsIgnoreCase("value") => v
        case _ => return None
      }
    }
    Some((table, cur))
  }

  private val acidRowId: StructType = StructType(Seq(
    StructField("operation", IntegerType),
    StructField("originaltransaction", LongType),
    StructField("bucket", IntegerType),
    StructField("rowid", LongType),
    StructField("currenttransaction", LongType)))

  /** Column comments from the reference's schema template
    * (`testdata/datasets/functional/functional_schema_template.sql:10`
    * — `id int COMMENT 'Add a comment'` on the alltypes family).
    */
  private val comments: Map[(String, String), String] = Map(
    ("alltypes", "id") -> "Add a comment",
    ("alltypes_promoted", "id") -> "Add a comment",
    ("alltypes_deleted_rows", "id") -> "Add a comment",
    ("alltypes_date_partition", "id") -> "Add a comment")

  private def rowsOf(t: DataType,
      table: String): Seq[(String, String, String)] = t match {
    case st: StructType =>
      st.fields.toSeq.map { f =>
        val comment = f.getComment().getOrElse(
          comments.getOrElse((table.toLowerCase, f.name.toLowerCase), ""))
        // CHAR/VARCHAR travel as StringType + Spark's CharVarcharUtils
        // metadata key — surface the declared type text
        val t =
          if (f.metadata.contains("__CHAR_VARCHAR_TYPE_STRING"))
            f.metadata.getString("__CHAR_VARCHAR_TYPE_STRING").toLowerCase
          else typeSql(f.dataType, 0)
        (f.name.toLowerCase, t, comment)
      }
    case ArrayType(e, _) =>
      Seq(("item", typeSql(e, 0), ""), ("pos", "bigint", ""))
    case MapType(k, v, _) =>
      Seq(("key", typeSql(k, 0), ""), ("value", typeSql(v, 0), ""))
    case other => Seq(("", typeSql(other, 0), ""))
  }

  /** Impala `Type.toSql()` text. Structs print one field per line at
    * two spaces per nesting level, with the closing `>` at the parent's
    * indent; array/map wrap inline (StructType.java prettyPrint).
    */
  def typeSql(t: DataType, indent: Int): String = t match {
    case st: StructType =>
      val pad = " " * (indent + 2)
      st.fields.map(f =>
          s"$pad${f.name.toLowerCase}:${typeSql(f.dataType, indent + 2)}")
        .mkString("struct<\n", ",\n", "\n" + (" " * indent) + ">")
    case ArrayType(e, _) => s"array<${typeSql(e, indent)}>"
    case MapType(k, v, _) => s"map<${typeSql(k, indent)},${typeSql(v, indent)}>"
    case ByteType => "tinyint"
    case ShortType => "smallint"
    case IntegerType => "int"
    case LongType => "bigint"
    case FloatType => "float"
    case DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case BooleanType => "boolean"
    case TimestampType | TimestampNTZType => "timestamp"
    case DateType => "date"
    case BinaryType => "binary"
    case c: CharType => s"char(${c.length})"
    case v: VarcharType => s"varchar(${v.length})"
    case _: StringType => "string"
    case NullType => "null"
    case other => other.simpleString
  }
}
