package graft.sources

import java.util.{Map => JMap}

import scala.collection.JavaConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation standing in for the reference's external
  * data-source plugin API (`be/src/exec/data-source-scan-node.h:42`,
  * `common/thrift/ExternalDataSource.thrift`): a deterministic synthetic
  * documents generator.
  *
  * Demonstrates the full DSv2 contract the reference's plugin scanners
  * map onto: split planning (`partitions` option → one InputPartition
  * each), column pruning (SupportsPushDownRequiredColumns — unreferenced
  * columns are never generated), and limit pushdown
  * (SupportsPushDownLimit — each split stops early).
  *
  * Usage: `spark.read.format("graft.sources.SyntheticDocsSource")
  * .option("rows", 10000).option("partitions", 8).load()`.
  */
class SyntheticDocsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocsSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SyntheticDocsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt)
}

object SyntheticDocsSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  private val words = Array("the", "quick", "brown", "fox", "jumps", "over",
    "lazy", "dog", "data", "spark", "engine", "query", "scan", "join")

  /** Deterministic text for a doc id (splitmix64-driven). */
  def textFor(id: Long): String = {
    var x = id * 0x9e3779b97f4a7c15L + 0x632be59bd9b4e019L
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val n = 5 + math.floorMod(next(), 10).toInt
    (0 until n).map(_ => words(math.floorMod(next(), words.length).toInt))
      .mkString(" ")
  }

  def langFor(id: Long): String = if (id % 10 == 0) "de" else "en"
}

private class SyntheticDocsTable(rows: Long, partitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocsSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticDocsScanBuilder(rows, partitions)
}

private class SyntheticDocsScanBuilder(rows: Long, partitions: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var required: StructType = SyntheticDocsSource.schema
  private var limit: Long = Long.MaxValue

  override def pruneColumns(requiredSchema: StructType): Unit = {
    required = requiredSchema
  }
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed: Boolean = partitions > 1

  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def planInputPartitions(): Array[InputPartition] = {
      val per = (rows + partitions - 1) / partitions
      (0 until partitions).map { p =>
        val start = p * per
        val end = math.min(start + per, rows)
        DocsPartition(start, end, math.min(limit, end - start)): InputPartition
      }.filter { case DocsPartition(s, e, _) => s < e }.toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new DocsReaderFactory(required)
  }
}

private case class DocsPartition(start: Long, end: Long, limit: Long)
    extends InputPartition

private class DocsReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val dp = p.asInstanceOf[DocsPartition]
    new PartitionReader[InternalRow] {
      private var id = dp.start - 1
      private var emitted = 0L
      override def next(): Boolean = {
        id += 1; emitted += 1
        id < dp.end && emitted <= dp.limit
      }
      override def get(): InternalRow = {
        val values = required.fields.map(_.name).map {
          case "doc_id" => id: java.lang.Long
          case "text" => UTF8String.fromString(SyntheticDocsSource.textFor(id))
          case "lang" => UTF8String.fromString(SyntheticDocsSource.langFor(id))
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
