package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Replays hbase-inserts.test's INSERTs with HBase cell semantics
  * (`be/src/exec/hbase-table-sink.h`, HBaseTableWriter): a row is a
  * PUT keyed by the row key — same key merges, and a NULL value
  * writes NO cell, so the previous cell (or absence) survives. The
  * insert report counts the rows written, not the keys that remain.
  */
class HBaseInsertSim(spark: SparkSession, ddl: GoldenDdl) {

  private final class Tbl(val schema: StructType) {
    // key value (column 0) → cells in schema order
    val rows = scala.collection.mutable.LinkedHashMap[Any, Array[Any]]()
  }

  private val tables =
    scala.collection.mutable.LinkedHashMap.empty[String, Tbl]

  def reset(): Unit = {
    tables.keys.foreach(n =>
      scala.util.Try(spark.catalog.dropTempView(n)))
    tables.clear()
  }

  /** Register an empty HBase-mapped table (key column first, the rest
    * in the mapping's alphabetical order — the schema the data load
    * created).
    */
  def create(name: String, schema: StructType): Unit = {
    tables(name.toLowerCase) = new Tbl(schema)
    publish(name.toLowerCase)
  }

  private def publish(name: String): Unit = {
    val t = tables(name)
    val rows = t.rows.values.toSeq.map(Row.fromSeq(_))
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      t.schema).createOrReplaceTempView(name)
  }

  private val insertRe =
    ("""(?is)^\s*insert\s+into\s+(?:table\s+)?([A-Za-z_]\w*)\s*""" +
      """(?:\(([^)]*)\)\s*)?(values\b.*|select\b.*|with\b.*)$""").r

  def exec(stmt: String): Boolean = stmt match {
    case insertRe(name0, colsTxt, sourceTxt)
        if tables.contains(name0.toLowerCase) =>
      val t = tables(name0.toLowerCase)
      val src = ImpalaDialect.sql(spark,
        if (sourceTxt.trim.toLowerCase.startsWith("values"))
          s"SELECT * FROM ($sourceTxt)"
        else sourceTxt)
      // an explicit column list binds positionally; unlisted columns
      // write no cell (null)
      val listed = Option(colsTxt).map(_.split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq)
        .getOrElse(t.schema.fields.map(_.name).toSeq)
      val renamed = src.toDF(src.columns.indices.map(i => s"__c$i"): _*)
      import org.apache.spark.sql.functions.{col, lit}
      val out = renamed.select(t.schema.fields.map { f =>
        val i = listed.indexWhere(_.equalsIgnoreCase(f.name))
        if (i >= 0 && i < renamed.columns.length)
          col(s"__c$i").cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
      val incoming = out.collect()
      incoming.foreach { r =>
        val key = r.get(0)
        val cells = t.rows.getOrElseUpdate(key,
          Array.fill[Any](t.schema.length)(null))
        (0 until t.schema.length).foreach { i =>
          if (!r.isNullAt(i)) cells(i) = r.get(i)
        }
      }
      publish(name0.toLowerCase)
      ddl.lastInsertReport = Seq(s": ${incoming.length}")
      true
    case _ => false
  }
}
