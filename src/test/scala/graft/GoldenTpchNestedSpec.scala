package graft

import org.apache.spark.sql.DataFrame

/** Executes all 22 of the reference's nested TPC-H golden queries
  * (`testdata/workloads/tpch_nested/queries/tpch_nested-q*.test`)
  * VERBATIM through NestedRefs + ImpalaDialect over the derived nested
  * catalog (graft.sources.NestedTpchTables), and verifies each result
  * EQUALS the flat golden tpch-qN run over the same substituted data —
  * the defining property of the nested workload (load_nested.py builds
  * the nested schema from the flat one; the reference's RESULTS for
  * both workloads are the same SF1 answers).
  *
  * Golden `---- RESULTS` rows are bound to the reference's SF1 load
  * (unavailable here — no dbgen, zero egress), so value-verification is
  * nested-vs-flat equivalence in-spec plus the driver's DuckDB oracle
  * (`nested_qN` rows run the nested SQL in Spark and the FLAT golden
  * SQL in DuckDB over the same parquet).
  */
class GoldenTpchNestedSpec extends SparkSpecBase {

  override val sfDir = "/root/testdata/sf0.01"

  // queries whose substituted-fixture selectivity can reach zero rows
  // (same set as the flat GoldenTpchSpec)
  private val mayBeEmpty = Set(6, 14, 17, 19, 22)

  /** Stringify rows; midnight timestamps normalize to their date (the
    * nested schema carries dates as STRING per load_nested.py, the
    * flat one as TIMESTAMP).
    */
  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().toSeq.map(r =>
      (0 until r.length).map { i =>
        String.valueOf(r.get(i))
          .replaceFirst("[T ]00:00(:00(\\.0+)?)?$", "")
      }.toSeq)
      .sortBy(_.mkString("\u0001"))

  for (n <- 1 to 22) {
    test(s"nested tpch_nested-q$n equals flat tpch-q$n over the same data") {
      assume(GoldenTest.available && GoldenTest.nestedAvailable,
        "reference workload dirs not present")
      val flatCase = GoldenTest.tpchCase(n)
      val nestedCase = GoldenTest.tpchNestedCase(n)
      queries.GoldenQueries.register(spark, sfDir)
      val flat = ImpalaDialect.sql(spark, flatCase.query)
      val flatRows = canon(flat)
      sources.NestedTpchTables.register(spark, sfDir)
      val nested = ImpalaDialect.sql(spark, nestedCase.query)
      assert(nested.schema.length == nestedCase.types.length,
        s"arity ${nested.schema.length} vs TYPES ${nestedCase.types.mkString(",")}")
      val nestedRows = canon(nested)
      if (!mayBeEmpty(n))
        assert(nestedRows.nonEmpty, s"q$n returned 0 rows on the fixture")
      assert(nestedRows.size == flatRows.size,
        s"q$n rows nested=${nestedRows.size} flat=${flatRows.size}")
      nestedRows.zip(flatRows).zipWithIndex.foreach { case ((nr, fr), i) =>
        assert(nr == fr, s"q$n row $i differs: nested=$nr flat=$fr")
      }
    }
  }
}
