package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-evolution resolution of a LOGICAL (table) schema against
  * PHYSICAL data written under an older/different schema — the
  * reference's parquet fallback resolution
  * (`be/src/exec/parquet/parquet-metadata-utils.cc`
  * ParquetSchemaResolver, query option
  * `parquet_fallback_schema_resolution` in
  * `fe/src/main/java/org/apache/impala/service/Frontend.java`):
  *
  *  - NAME: each logical field binds to the physical field of the same
  *    name (case-insensitive) at the same nesting level; a missing
  *    name reads NULL. Field order is irrelevant, renames read NULL.
  *  - POSITION: each logical struct field binds to the physical field
  *    at the same ordinal; trailing logical fields beyond the physical
  *    arity read NULL.
  *
  * Arrays resolve element-wise, maps resolve key/value-wise — with the
  * reference's by-name special case for files whose key/value group
  * order is switched (`testdata/parquet_schema_resolution/
  * switched_map.parq`): a positional reader surfaces such a file as
  * `map<V,K>`; when the logical key/value types match crosswise and
  * not directly, NAME resolution swaps the roles back.
  *
  * Spark-first: the resolution is a pure column projection over the
  * physically-read DataFrame (`transform`/`transform_values` lambdas,
  * `struct` rebuilds) — whole-stage-codegen'd, no custom scan needed,
  * and identical on a 1000-executor cluster since it's per-row.
  */
object SchemaResolution {

  /** Project `df` (physical read) onto `logical`, resolving by name or
    * by position.
    */
  def project(df: DataFrame, logical: StructType, byName: Boolean,
      srcFile: String = ""): DataFrame = {
    val phys = df.schema
    val cols = logical.fields.zipWithIndex.map { case (lf, i) =>
      bindField(phys.fields, lf, i, byName)
        .map { pf => resolve(col(pf.name), pf.dataType, lf.dataType, byName,
          srcFile) }
        .getOrElse(lit(null).cast(lf.dataType))
        .as(lf.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private def bindField(phys: Array[StructField], lf: StructField,
      idx: Int, byName: Boolean): Option[StructField] =
    if (byName) phys.find(_.name.equalsIgnoreCase(lf.name))
    else if (idx < phys.length) Some(phys(idx))
    else None

  /** Same type family (NOT mere castability — an int is castable to
    * string, but a by-name map whose key/value types only match
    * crosswise must take the swap branch).
    */
  private def compat(p: DataType, l: DataType): Boolean = (p, l) match {
    case (_: NumericType, _: NumericType) => true
    case (_: StringType, _: StringType) => true
    case (_: StructType, _: StructType) => true
    case (_: ArrayType, _: ArrayType) => true
    case (_: MapType, _: MapType) => true
    case (a, b) => a == b
  }

  private def intWidth(dt: DataType): Int = dt match {
    case org.apache.spark.sql.types.ByteType => 8
    case org.apache.spark.sql.types.ShortType => 16
    case org.apache.spark.sql.types.IntegerType => 32
    case org.apache.spark.sql.types.LongType => 64
    case _ => 0
  }

  private def resolve(c: Column, phys: DataType, log: DataType,
      byName: Boolean, srcFile: String = ""): Column = (phys, log) match {
    case (p, l) if p == l => c
    case (p: StructType, l: StructType) =>
      val inner = l.fields.zipWithIndex.map { case (lf, i) =>
        bindField(p.fields, lf, i, byName)
          .map(pf => resolve(c.getField(pf.name), pf.dataType, lf.dataType,
            byName, srcFile))
          .getOrElse(lit(null).cast(lf.dataType))
          .as(lf.name)
      }
      // struct() is non-null even when every child is — preserve the
      // physical NULL struct itself
      when(c.isNotNull, struct(inner.toIndexedSeq: _*))
    case (ArrayType(pe, _), ArrayType(le, _)) =>
      transform(c, x => resolve(x, pe, le, byName, srcFile))
    case (MapType(pk, pv, _), MapType(lk, lv, _))
        if compat(pk, lk) && compat(pv, lv) =>
      map_from_arrays(
        transform(map_keys(c), x => resolve(x, pk, lk, byName, srcFile)),
        transform(map_values(c), x => resolve(x, pv, lv, byName, srcFile)))
    case (MapType(pk, pv, _), MapType(lk, lv, _))
        if byName && compat(pk, lv) && compat(pv, lk) =>
      // switched key/value group order: the positional read inverted
      // the roles; NAME resolution restores them
      map_from_arrays(
        transform(map_values(c), x => resolve(x, pv, lk, byName, srcFile)),
        transform(map_keys(c), x => resolve(x, pk, lv, byName, srcFile)))
    // a map whose key/value types match neither directly nor crosswise
    // cannot be resolved — the reference scan REJECTS the file
    // (parquet-metadata-utils.cc ValidateColumn's incompatible-schema
    // error; parquet-resolution-by-name.test's switched-map POSITION
    // probe)
    case (_: MapType, l: MapType) if srcFile.nonEmpty =>
      org.apache.spark.sql.graft.Bridge.column(
        graft.functions.ImpalaRaiseOnRead(
          s"File '$srcFile' has an incompatible Parquet schema for column",
          l))
    // a physically WIDER integer under a narrower logical type (ALTER
    // COLUMN int→tinyint over existing parquet files) reads by BIT
    // REINTERPRETATION — the reference scanner static_casts the stored
    // value (200 AS TINYINT = -56), it never range-checks
    // (parquet-stats.test's tnarrow probes)
    case (p, l) if intWidth(p) > 0 && intWidth(l) > 0 &&
        intWidth(p) > intWidth(l) =>
      val bits = intWidth(l)
      // sign-extend via arithmetic shifts: cannot overflow even when
      // the stored 64-bit value is near Long.MaxValue (Add/pmod would
      // raise ARITHMETIC_OVERFLOW under the ANSI session)
      shiftright(
        shiftleft(c.cast(org.apache.spark.sql.types.LongType), 64 - bits),
        64 - bits).cast(l)
    case (p, l) if compat(p, l) => c.cast(l)
    case (_, l) => lit(null).cast(l)
  }
}
