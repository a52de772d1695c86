package graft

import graft.queries.TpcdsGoldenQueries

/** Executes the reference's golden TPC-DS `.test` queries (the real
  * workload texts, not shapes) verbatim through the dialect over the
  * derived star-schema catalog; schema checked against `---- TYPES`,
  * values gated by the driver's DuckDB oracle (`tpcds_qN` rows).
  */
class TpcdsGoldenSpec extends SparkSpecBase {

  override val sfDir = "/root/testdata/sf0.01"

  import org.apache.spark.sql.types._
  private def compatible(dt: DataType, golden: String): Boolean =
    golden match {
      case "string" => dt.isInstanceOf[StringType]
      case "bigint" | "int" => dt == IntegerType || dt == LongType
      case "decimal" => dt.isInstanceOf[DecimalType] || dt == DoubleType
      case _ => false
    }

  // sparse multiplicative predicates (triple-fact chains, q41's
  // color/unit/size conjunctions) can legitimately reach zero rows at
  // this scale — they must still EXECUTE and TYPES-match
  private val mayBeEmpty = Set("25", "29", "40", "41")

  for (n <- TpcdsGoldenQueries.nums) {
    test(s"golden tpcds-q$n.test runs verbatim; schema matches ---- TYPES") {
      assume(TpcdsGoldenQueries.available, "reference workload dir not present")
      val c = TpcdsGoldenQueries.tpcdsCase(n)
      assert(c.types.nonEmpty)
      TpcdsGoldenQueries.catalog.register(spark, sfDir)
      val df = ImpalaDialect.sql(spark, c.query.stripSuffix(";"))
      val rows = df.collect()
      assert(df.schema.length == c.types.length,
        s"arity ${df.schema.length} vs TYPES ${c.types.mkString(",")}")
      df.schema.fields.zip(c.types).foreach { case (f, t) =>
        assert(compatible(f.dataType, t),
          s"q$n column ${f.name}: ${f.dataType.simpleString} vs golden $t")
      }
      if (!mayBeEmpty(n))
        assert(rows.nonEmpty,
          s"q$n returned 0 rows — derived-catalog buckets must hit its predicates")
    }
  }
}
