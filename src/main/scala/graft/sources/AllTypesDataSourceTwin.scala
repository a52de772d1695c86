package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DSv2 twin of the reference's external data-source test plugin
  * (`java/ext-data-source/test/.../AllTypesDataSource.java`, consumed
  * through `be/src/exec/data-source-scan-node.cc`): a deterministic
  * 5,000-row generator over every scalar type, plus the plugin API's
  * two pushdown behaviors:
  *
  *  - VALIDATE_PREDICATES mode: when the first pushed predicate is
  *    `string_col = 'VALIDATE_PREDICATES##<expected>'`, the source
  *    claims EVERY predicate handled and returns ONE row whose
  *    string_col reports whether the remaining pushed predicates
  *    (col, op, int value — LT/GT/LE/GE/EQ/NE/NOT_DISTINCT/
  *    DISTINCT_FROM) matched the expected spelling.
  *  - Normal mode: every OTHER predicate is accepted-but-not-applied
  *    (the reference validates that the engine re-applies exactly the
  *    unaccepted ones — data-source-tables.test's asymmetric counts).
  *
  * Row i: tinyint i%10, smallint i%100, int/double i, bigint i*10,
  * float 1.1f*i, string NULL every 5th else "i", bool i%2==0,
  * timestamp epoch-millis i, decimals (10^p - (i+1)) mod 10^p (negated
  * on even rows) at the column scale, date epoch-day i.
  */
class AllTypesDataSourceTwin extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AllTypesDataSourceTwin.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = new AllTypesDsTable
}

object AllTypesDataSourceTwin {
  val NumRows = 5000

  val schema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("bool_col", BooleanType),
    StructField("tinyint_col", ByteType),
    StructField("smallint_col", ShortType),
    StructField("int_col", IntegerType),
    StructField("bigint_col", LongType),
    StructField("float_col", FloatType),
    StructField("double_col", DoubleType),
    StructField("timestamp_col", TimestampType),
    StructField("string_col", StringType),
    StructField("dec_col1", DecimalType(9, 0)),
    StructField("dec_col2", DecimalType(10, 0)),
    StructField("dec_col3", DecimalType(20, 10)),
    StructField("dec_col4", DecimalType(38, 37)),
    StructField("dec_col5", DecimalType(10, 5)),
    StructField("date_col", DateType)))

  /** The plugin's TComparisonOp spelling for a pushed filter. */
  def opOf(f: sources.Filter): Option[(String, String, Any)] = f match {
    case sources.LessThan(c, v) => Some((c, "LT", v))
    case sources.GreaterThan(c, v) => Some((c, "GT", v))
    case sources.LessThanOrEqual(c, v) => Some((c, "LE", v))
    case sources.GreaterThanOrEqual(c, v) => Some((c, "GE", v))
    case sources.EqualTo(c, v) => Some((c, "EQ", v))
    case sources.Not(sources.EqualTo(c, v)) => Some((c, "NE", v))
    case sources.EqualNullSafe(c, v) => Some((c, "NOT_DISTINCT", v))
    case sources.Not(sources.EqualNullSafe(c, v)) =>
      Some((c, "DISTINCT_FROM", v))
    case _ => None
  }

  def decimalFor(i: Int, precision: Int, scale: Int): Decimal = {
    val max = java.math.BigInteger.TEN.pow(precision)
    var v = max.subtract(java.math.BigInteger.valueOf(i + 1L)).mod(max)
    if (i % 2 == 0) v = v.negate()
    Decimal(new java.math.BigDecimal(v, scale), precision, scale)
  }
}

private class AllTypesDsTable extends Table with SupportsRead {
  override def name(): String = "alltypes_datasource"
  override def schema(): StructType = AllTypesDataSourceTwin.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AllTypesDsScanBuilder
}

private class AllTypesDsScanBuilder extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import AllTypesDataSourceTwin._

  private var required: StructType = schema
  private var accepted: Array[sources.Filter] = Array.empty
  private var validateExpected: Option[String] = None
  private var validateActual: Seq[sources.Filter] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }

  override def pushFilters(
      filters: Array[sources.Filter]): Array[sources.Filter] = {
    val marker = filters.collectFirst {
      case sources.EqualTo(c, v: String)
          if c.equalsIgnoreCase("string_col") &&
            v.toUpperCase.startsWith("VALIDATE_PREDICATES##") => v
    }
    marker match {
      case Some(v) =>
        validateExpected = Some(v.split("##")(1))
        // duplicate conjuncts collapse, as in the reference's planner
        // (the `1 IS NOT DISTINCT FROM id` twice probe)
        validateActual = filters.toSeq.distinct.filterNot {
          case sources.EqualTo(c, s: String) =>
            c.equalsIgnoreCase("string_col") &&
              s.toUpperCase.startsWith("VALIDATE_PREDICATES##")
          case _ => false
        }
        accepted = filters
        Array.empty // all handled — the dummy row must survive
      case None =>
        // accept every other BINARY predicate WITHOUT applying it —
        // the engine must re-apply exactly the rest. Only binary
        // comparisons reach the plugin (TBinaryPredicate); Spark's
        // injected IsNotNull guards and any other shapes stay with
        // the engine
        val binaries = filters.filter(f => opOf(f).isDefined)
        val acc = binaries.zipWithIndex.collect {
          case (f, i) if i % 2 == 0 => f
        }
        accepted = acc
        filters.filterNot(acc.contains)
    }
  }

  override def pushedFilters(): Array[sources.Filter] = accepted

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] =
      Array(AllTypesDsPartition(validateResult()))
    override def createReaderFactory(): PartitionReaderFactory =
      new AllTypesDsReaderFactory(required)
  }

  /** Compare pushed predicates against the expected spelling
    * (AllTypesDataSource.validatePredicates).
    */
  private def validateResult(): Option[String] = validateExpected.map { exp =>
    val expected = exp.split("&&").map(_.trim)
    val actual = validateActual.flatMap(opOf)
    if (expected.length != actual.length)
      s"Failed predicate count, expected=${expected.length} actual=${actual.length}"
    else {
      expected.zip(actual).collectFirst {
        case (e, (col, op, v))
            if {
              val p = e.split(" ")
              !(p(0).equalsIgnoreCase(col) && p(1).equalsIgnoreCase(op) &&
                p(2) == String.valueOf(v))
            } =>
          s"Failed predicate, expected=$e actual=$col $op $v"
      }.getOrElse("SUCCESS")
    }
  }
}

private case class AllTypesDsPartition(validate: Option[String])
  extends InputPartition

private class AllTypesDsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new AllTypesDsReader(required,
      p.asInstanceOf[AllTypesDsPartition].validate)
}

private class AllTypesDsReader(required: StructType,
    validate: Option[String]) extends PartitionReader[InternalRow] {
  import AllTypesDataSourceTwin._

  private var i = -1
  private val limit = if (validate.isDefined) 1 else NumRows

  override def next(): Boolean = { i += 1; i < limit }

  override def get(): InternalRow = {
    val vals = required.fields.map { f =>
      validate match {
        case Some(result) =>
          if (f.name.equalsIgnoreCase("string_col"))
            UTF8String.fromString(result)
          else null
        case None => valueFor(f)
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  private def valueFor(f: StructField): Any = f.name.toLowerCase match {
    case "id" => i
    case "bool_col" => i % 2 == 0
    case "tinyint_col" => (i % 10).toByte
    case "smallint_col" => (i % 100).toShort
    case "int_col" => i
    case "bigint_col" => i.toLong * 10
    case "float_col" => (1.1 * i).toFloat
    case "double_col" => i.toDouble
    case "timestamp_col" => i.toLong * 1000 // epoch millis i → µs
    case "string_col" =>
      if (i % 5 == 0) null else UTF8String.fromString(i.toString)
    case "dec_col1" => decimalFor(i, 9, 0)
    case "dec_col2" => decimalFor(i, 10, 0)
    case "dec_col3" => decimalFor(i, 20, 10)
    case "dec_col4" => decimalFor(i, 38, 37)
    case "dec_col5" => decimalFor(i, 10, 5)
    case "date_col" => i // epoch days
    case _ => null
  }

  override def close(): Unit = {}
}
