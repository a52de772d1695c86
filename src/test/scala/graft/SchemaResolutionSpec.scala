package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** SchemaResolution — Impala's parquet fallback schema resolution
  * (NAME vs POSITION) as a pure column projection. Golden-gated
  * end-to-end by parquet-resolution-by-name.test; these pin the unit
  * rules.
  */
class SchemaResolutionSpec extends SparkSpecBase {

  private def df(ddl: String, rows: Row*) =
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      StructType.fromDDL(ddl))

  test("NAME: reordered logical fields bind by name; renames read NULL") {
    val phys = df("a string, b string", Row("x", "y"))
    val logical = StructType.fromDDL("b string, a string")
    val r = sources.SchemaResolution.project(phys, logical, byName = true).head()
    assert(r.getString(0) == "y" && r.getString(1) == "x")
    val renamed = StructType.fromDDL("new_a string")
    val r2 = sources.SchemaResolution.project(phys, renamed, byName = true).head()
    assert(r2.isNullAt(0))
  }

  test("POSITION: logical fields bind by ordinal; trailing extras read NULL") {
    val phys = df("a string, b string", Row("x", "y"))
    val logical = StructType.fromDDL("p string, q string, r string")
    val r = sources.SchemaResolution.project(phys, logical, byName = false).head()
    assert(r.getString(0) == "x" && r.getString(1) == "y" && r.isNullAt(2))
  }

  test("nested struct: by-name keeps matching fields, preserves NULL structs") {
    val phys = df("s struct<e: int, f: string>", Row(Row(1, "v")), Row(null))
    val logical = StructType.fromDDL("s struct<f: string>")
    val rs = sources.SchemaResolution.project(phys, logical, byName = true)
      .collect()
    assert(rs(0).getStruct(0).getString(0) == "v")
    assert(rs(1).isNullAt(0)) // the physical NULL struct stays NULL
  }

  test("switched map key/value roles swap back under NAME resolution") {
    // a positional reader surfaces switched_map.parq as map<int,string>
    // over a table declared map<string,int> (parquet_schema_resolution
    // fixture); NAME resolution restores key='a' → 1
    val phys = df("m map<int, string>", Row(Map(1 -> "a", 2 -> "b")))
    val logical = StructType.fromDDL("m map<string, int>")
    val r = sources.SchemaResolution.project(phys, logical, byName = true).head()
    val m = r.getMap[String, Int](0)
    assert(m == Map("a" -> 1, "b" -> 2))
  }

  test("array elements resolve element-wise with scalar widening casts") {
    val phys = df("a array<double>", Row(Seq(1.5, 2.5)))
    val logical = StructType.fromDDL("a array<float>")
    val r = sources.SchemaResolution.project(phys, logical, byName = true).head()
    assert(r.getSeq[Float](0) == Seq(1.5f, 2.5f))
  }
}
