package graft.functions

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union => HllDsUnion}
import org.apache.datasketches.kll.KllFloatsSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Apache DataSketches-backed `ds_hll_*` / `ds_kll_*` family, wire-
  * compatible with the reference's implementation
  * (`be/src/exprs/datasketches-common.h:36-40` — HLL lgConfigK 12,
  * target HLL_4; `aggregate-functions-ir.cc:1662,1827` — KLL float
  * default k; `datasketches-functions-ir.cc` scalars). Both engines
  * bind the same published DataSketches serialized formats, so
  * sketches produced by Hive or the reference deserialize here and
  * vice versa — pinned end-to-end by the reference's own
  * `datasketches-hll.test` / `datasketches-kll.test` golden files.
  *
  * Semantics carried over from the C++ side:
  *   - sketches travel as STRING (raw bytes; IMPALA-9482 tracks binary)
  *   - aggregating zero rows / only NULLs finalizes to NULL
  *   - empty-string updates are skipped (IMPALA-9942)
  *   - quantile/rank/cdf/pmf use the pre-3.0 "exclusive" search
  *     criteria the reference's bundled C++ library implements
  *   - a non-sketch input raises "Unable to deserialize sketch."
  *   - doubles in string results print as C++ `ostream <<` 6-sig-digit
  *     (`ImpalaSemantics.cFormatG`)
  */
object Ds {
  /** `DS_SKETCH_CONFIG` (datasketches-common.h:40). */
  val LgK = 12

  def bytesOf(v: Any): Array[Byte] = v match {
    case u: UTF8String => u.getBytes
    case b: Array[Byte] => b
    case other => other.toString.getBytes("UTF-8")
  }

  /** Runtime errors surface with the reference's client-visible "UDF
    * ERROR: " prefix (status.cc renders UDF failures that way; the
    * datasketches golden CATCH rows pin the full prefixed line).
    */
  def udfError(msg: String): Nothing =
    throw new RuntimeException(s"UDF ERROR: $msg")

  def deserError(): Nothing = udfError("Unable to deserialize sketch.")

  def hllHeapify(b: Array[Byte]): HllSketch =
    try HllSketch.heapify(Memory.wrap(b))
    catch { case e: Exception => deserError() }

  def kllHeapify(b: Array[Byte]): KllFloatsSketch =
    try KllFloatsSketch.heapify(Memory.wrap(b))
    catch { case e: Exception => deserError() }

  def out(b: Array[Byte]): UTF8String = UTF8String.fromBytes(b)

  /** Numeric eval results arrive as java.lang.Number OR Spark Decimal
    * (exact literals like 0.5 parse as DECIMAL(1,1)). */
  def numD(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
  }

  def numF(v: Any): Float = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toFloat
    case n: java.lang.Number => n.floatValue()
  }

  /** C++ `ostream <<` double/float rendering (6 significant digits). */
  def fmt(d: Double): String = ImpalaSemantics.cFormatG(d, 6)

  val Excl: QuantileSearchCriteria = QuantileSearchCriteria.EXCLUSIVE

  def hllUnionOf(a: HllSketch, b: HllSketch): HllSketch = {
    val u = new HllDsUnion(LgK)
    u.update(a)
    u.update(b)
    u.getResult(TgtHllType.HLL_4)
  }
}

/** Shared base for the two HLL build aggregates (`ds_hll_sketch`,
  * `ds_hll_sketch_and_estimate`): buffer is a live HllSketch(12, HLL_4),
  * merged through hll_union exactly like DsHllMerge
  * (aggregate-functions-ir.cc:1703-1713).
  */
abstract class HllBuildAggBase
  extends TypedImperativeAggregate[HllSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  def child: Expression
  override def nullable: Boolean = true

  // The reference registers TINYINT/INT/BIGINT/FLOAT/DOUBLE/STRING
  // overloads and an explicit UNSUPPORTED builtin for every other
  // scalar type (BuiltinsDb DS_HLL_UPDATE_SYMBOL + the unsupported
  // branch), so SMALLINT/BOOLEAN/DATE/TIMESTAMP/DECIMAL resolve to the
  // rejection — no implicit widening path exists.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ByteType | IntegerType | LongType | FloatType |
          DoubleType | _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"No matching function with signature: $prettyName(${t.sql})")
    }

  override def createAggregationBuffer(): HllSketch =
    new HllSketch(Ds.LgK, TgtHllType.HLL_4)

  override def update(buf: HllSketch, row: InternalRow): HllSketch = {
    val v = child.eval(row)
    if (v != null) child.dataType match {
      case ByteType => buf.update(v.asInstanceOf[Byte].toLong)
      case ShortType => buf.update(v.asInstanceOf[Short].toLong)
      case IntegerType => buf.update(v.asInstanceOf[Int].toLong)
      case LongType => buf.update(v.asInstanceOf[Long])
      case FloatType => buf.update(v.asInstanceOf[Float].toDouble)
      case DoubleType => buf.update(v.asInstanceOf[Double])
      case _ =>
        val b = Ds.bytesOf(v)
        if (b.length > 0) buf.update(b) // IMPALA-9942: skip empty strings
    }
    buf
  }

  override def merge(buf: HllSketch, other: HllSketch): HllSketch =
    Ds.hllUnionOf(buf, other)

  override def serialize(s: HllSketch): Array[Byte] = s.toUpdatableByteArray
  override def deserialize(b: Array[Byte]): HllSketch =
    HllSketch.heapify(Memory.wrap(b))
}

/** `ds_hll_sketch(x)` → STRING serialized compact HLL sketch; NULL when
  * no non-NULL input arrived (DsHllFinalizeSketch).
  */
case class DsHllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllBuildAggBase {
  override def dataType: DataType = StringType
  override def eval(s: HllSketch): Any =
    if (s.isEmpty) null else Ds.out(s.toCompactByteArray)
  override def withNewMutableAggBufferOffset(o: Int): DsHllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsHllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsHllSketch =
    copy(child = c)
  override def prettyName: String = "ds_hll_sketch"
}

/** `ds_hll_sketch_and_estimate(x)` → BIGINT estimate of the sketch built
  * over the group (DsHllFinalizeEstimate).
  */
case class DsHllSketchAndEstimate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllBuildAggBase {
  override def dataType: DataType = LongType
  override def eval(s: HllSketch): Any =
    if (s.isEmpty) null else s.getEstimate.toLong
  override def withNewMutableAggBufferOffset(o: Int): DsHllSketchAndEstimate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsHllSketchAndEstimate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsHllSketchAndEstimate =
    copy(child = c)
  override def prettyName: String = "ds_hll_sketch_and_estimate"
}

/** `ds_hll_union(sketch)` → STRING merged sketch over serialized-sketch
  * inputs; NULL for an all-NULL/empty group (DsHllUnionFinalize).
  */
case class DsHllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): HllSketch =
    new HllSketch(Ds.LgK, TgtHllType.HLL_4)

  override def update(buf: HllSketch, row: InternalRow): HllSketch = {
    val v = child.eval(row)
    if (v == null) return buf
    val b = Ds.bytesOf(v)
    if (b.isEmpty) return buf
    Ds.hllUnionOf(buf, Ds.hllHeapify(b))
  }

  override def merge(buf: HllSketch, other: HllSketch): HllSketch =
    Ds.hllUnionOf(buf, other)

  override def eval(s: HllSketch): Any =
    if (s.isEmpty) null else Ds.out(s.toCompactByteArray)

  override def serialize(s: HllSketch): Array[Byte] = s.toUpdatableByteArray
  override def deserialize(b: Array[Byte]): HllSketch =
    HllSketch.heapify(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): DsHllUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsHllUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsHllUnion =
    copy(child = c)
  override def prettyName: String = "ds_hll_union"
}

/** `ds_hll_estimate(sketch)` → BIGINT (C++ BigIntVal conversion
  * truncates the double estimate). NULL/empty input → NULL.
  */
case class DsHllEstimate(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val b = Ds.bytesOf(v)
    if (b.isEmpty) null else Ds.hllHeapify(b).getEstimate.toLong
  }
  override protected def withNewChildInternal(c: Expression): DsHllEstimate =
    copy(c)
  override def prettyName: String = "ds_hll_estimate"
}

/** `ds_hll_estimate_bounds_as_string(sketch[, kappa])` →
  * "estimate,lower,upper" at kappa std-devs (default 2), each number in
  * C++ ostream form (DsHllEstimateBoundsAsString).
  */
case class DsHllEstimateBounds(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val k = right.eval(input)
    if (s == null || k == null) return null
    val kappa = Ds.numD(k).toInt
    if (kappa < 1 || kappa > 3)
      Ds.udfError("Kappa must be 1, 2 or 3")
    val b = Ds.bytesOf(s)
    if (b.isEmpty) return null
    val sk = Ds.hllHeapify(b)
    UTF8String.fromString(
      s"${Ds.fmt(sk.getEstimate)},${Ds.fmt(sk.getLowerBound(kappa))}," +
        s"${Ds.fmt(sk.getUpperBound(kappa))}")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_hll_estimate_bounds_as_string"
}

/** `ds_hll_union_f(sketch1, sketch2)` → STRING union of the two
  * sketches; NULL inputs are skipped and the result is always a
  * serialized sketch — possibly empty, whose estimate is 0
  * (DsHllUnionF).
  */
case class DsHllUnionF(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = {
    val u = new HllDsUnion(Ds.LgK)
    Seq(left.eval(input), right.eval(input)).foreach { v =>
      if (v != null) {
        val b = Ds.bytesOf(v)
        if (b.nonEmpty) u.update(Ds.hllHeapify(b))
      }
    }
    Ds.out(u.getResult(TgtHllType.HLL_4).toCompactByteArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_hll_union_f"
}

/** `ds_hll_stringify(sketch)` → the sketch summary block. Header/footer
  * follow the C++ `to_string` casing ("### HLL sketch summary:" …
  * "### End HLL sketch summary") that the reference goldens regex on;
  * body lines come from the Java library's identical summary fields.
  */
case class DsHllStringify(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val b = Ds.bytesOf(v)
    if (b.isEmpty) return null
    val sk = Ds.hllHeapify(b)
    val body = sk.toString(true, false, false, false)
      .linesIterator.drop(1).filterNot(_.trim.isEmpty).mkString("\n")
    UTF8String.fromString(
      s"### HLL sketch summary:\n$body\n### End HLL sketch summary\n")
  }
  override protected def withNewChildInternal(c: Expression): DsHllStringify =
    copy(c)
  override def prettyName: String = "ds_hll_stringify"
}

// ---------------------------------------------------------------------------
// KLL (float, default k = 200 — kll_sketch<float>() in the reference)
// ---------------------------------------------------------------------------

/** `ds_kll_sketch(x)` → STRING serialized KLL float sketch; NULL for an
  * empty group. The reference registers the FLOAT overload and lets the
  * analyzer's implicit widening feed it TINYINT..BIGINT; DOUBLE and
  * STRING have no implicit path and are rejected.
  */
case class DsKllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllFloatsSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
          _: DecimalType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"No matching function with signature: ds_kll_sketch(${t.sql})")
    }

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance()

  override def update(buf: KllFloatsSketch, row: InternalRow): KllFloatsSketch = {
    val v = child.eval(row)
    if (v != null) {
      val f = Ds.numF(v)
      if (!java.lang.Float.isNaN(f)) buf.update(f)
    }
    buf
  }

  override def merge(buf: KllFloatsSketch, other: KllFloatsSketch): KllFloatsSketch = {
    buf.merge(other)
    buf
  }

  override def eval(s: KllFloatsSketch): Any =
    if (s.isEmpty) null else Ds.out(s.toByteArray)

  override def serialize(s: KllFloatsSketch): Array[Byte] = s.toByteArray
  override def deserialize(b: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): DsKllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsKllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsKllSketch =
    copy(child = c)
  override def prettyName: String = "ds_kll_sketch"
}

/** `ds_kll_union(sketch)` → STRING merged KLL sketch; NULL for an
  * all-NULL/empty group.
  */
case class DsKllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllFloatsSketch]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): KllFloatsSketch =
    KllFloatsSketch.newHeapInstance()

  override def update(buf: KllFloatsSketch, row: InternalRow): KllFloatsSketch = {
    val v = child.eval(row)
    if (v != null) {
      val b = Ds.bytesOf(v)
      if (b.nonEmpty) buf.merge(Ds.kllHeapify(b))
    }
    buf
  }

  override def merge(buf: KllFloatsSketch, other: KllFloatsSketch): KllFloatsSketch = {
    buf.merge(other)
    buf
  }

  override def eval(s: KllFloatsSketch): Any =
    if (s.isEmpty) null else Ds.out(s.toByteArray)

  override def serialize(s: KllFloatsSketch): Array[Byte] = s.toByteArray
  override def deserialize(b: Array[Byte]): KllFloatsSketch =
    KllFloatsSketch.heapify(Memory.wrap(b))

  override def withNewMutableAggBufferOffset(o: Int): DsKllUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsKllUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsKllUnion =
    copy(child = c)
  override def prettyName: String = "ds_kll_union"
}

/** `ds_kll_n(sketch)` → BIGINT total update count. */
case class DsKllN(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val b = Ds.bytesOf(v)
    if (b.isEmpty) null else Ds.kllHeapify(b).getN
  }
  override protected def withNewChildInternal(c: Expression): DsKllN = copy(c)
  override def prettyName: String = "ds_kll_n"
}

/** `ds_kll_quantile(sketch, rank)` → FLOAT value at the given rank,
  * pre-3.0 exclusive criteria (DsKllQuantile). Empty sketch → NULL;
  * rank outside [0,1] errors.
  */
case class DsKllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = FloatType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any, q: Any): Any = {
    val rank = Ds.numD(q)
    if (rank < 0.0 || rank > 1.0)
      Ds.udfError("Rank parameter should be in the range of [0,1]")
    val b = Ds.bytesOf(s)
    if (b.isEmpty) return null
    val sk = Ds.kllHeapify(b)
    if (sk.isEmpty) null else sk.getQuantile(rank, Ds.Excl)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_kll_quantile"
}

/** `ds_kll_rank(sketch, value)` → DOUBLE fraction of mass strictly below
  * `value` (exclusive criteria). Empty sketch → NULL.
  */
case class DsKllRank(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any, v: Any): Any = {
    val b = Ds.bytesOf(s)
    if (b.isEmpty) return null
    val sk = Ds.kllHeapify(b)
    if (sk.isEmpty) null
    else sk.getRank(Ds.numF(v), Ds.Excl)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_kll_rank"
}

/** Shared varargs plumbing for the KLL string-result scalars: child 0 is
  * the sketch, children 1..n are numeric parameters that the reference
  * requires non-NULL and non-NaN (RaiseErrorForNullOrNaNInput).
  */
abstract class KllVarargsBase extends Expression with CodegenFallback {
  def children: Seq[Expression]
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      return TypeCheckResult.TypeCheckFailure(
        s"No matching function with signature: $prettyName(STRING)")
    val bad = children.tail.find(c => !c.dataType.isInstanceOf[NumericType] &&
      c.dataType != NullType)
    bad match {
      case Some(c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName parameters must be numeric, got ${c.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  protected def result(sk: KllFloatsSketch, params: Array[Float]): String

  override def eval(input: InternalRow): Any = {
    val s = children.head.eval(input)
    if (s == null) return null
    val params = children.tail.map { c =>
      val v = c.eval(input)
      if (v == null)
        Ds.udfError("NULL or NaN provided in the input list.")
      val f = Ds.numF(v)
      if (java.lang.Float.isNaN(f))
        Ds.udfError("NULL or NaN provided in the input list.")
      f
    }.toArray
    val b = Ds.bytesOf(s)
    if (b.isEmpty) return null
    val sk = Ds.kllHeapify(b)
    if (sk.isEmpty) return null
    UTF8String.fromString(result(sk, params))
  }
}

/** `ds_kll_quantiles_as_string(sketch, r1, r2, …)` → the quantile at
  * each rank, comma-joined in argument order.
  */
case class DsKllQuantilesAsString(children: Seq[Expression])
    extends KllVarargsBase {
  override protected def result(sk: KllFloatsSketch, ranks: Array[Float]): String = {
    ranks.map { r =>
      if (r < 0.0f || r > 1.0f)
        Ds.udfError(
          "Error while getting quantiles from DataSketches KLL. Message: " +
            "Fraction cannot be less than zero or greater than 1.0")
      Ds.fmt(sk.getQuantile(r.toDouble, Ds.Excl).toDouble)
    }.mkString(",")
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DsKllQuantilesAsString = copy(c)
  override def prettyName: String = "ds_kll_quantiles_as_string"
}

/** `ds_kll_cdf_as_string(sketch, s1, s2, …)` → cumulative mass at each
  * split plus the trailing 1.0 (m+1 values).
  */
case class DsKllCdfAsString(children: Seq[Expression]) extends KllVarargsBase {
  override protected def result(sk: KllFloatsSketch, splits: Array[Float]): String =
    try sk.getCDF(splits, Ds.Excl).map(Ds.fmt).mkString(",")
    catch {
      case e: Exception => Ds.udfError(
        "Error while running DataSketches KLL function. Message: " +
          "Values must be unique and monotonically increasing")
    }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DsKllCdfAsString = copy(c)
  override def prettyName: String = "ds_kll_cdf_as_string"
}

/** `ds_kll_pmf_as_string(sketch, s1, s2, …)` → probability mass in each
  * of the m+1 intervals the splits define.
  */
case class DsKllPmfAsString(children: Seq[Expression]) extends KllVarargsBase {
  override protected def result(sk: KllFloatsSketch, splits: Array[Float]): String =
    try sk.getPMF(splits, Ds.Excl).map(Ds.fmt).mkString(",")
    catch {
      case e: Exception => Ds.udfError(
        "Error while running DataSketches KLL function. Message: " +
          "Values must be unique and monotonically increasing")
    }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): DsKllPmfAsString = copy(c)
  override def prettyName: String = "ds_kll_pmf_as_string"
}

/** `ds_kll_cdf(sketch, array<double>)` → ARRAY<DOUBLE> (this library's
  * array-typed convenience variant of the reference's _as_string form).
  */
case class DsKllCdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(s: Any, splits: Any): Any = {
    val sk = Ds.kllHeapify(Ds.bytesOf(s))
    val pts = splits.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().map(_.toFloat)
    if (sk.isEmpty) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sk.getCDF(pts, Ds.Excl))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_kll_cdf"
}

/** `ds_kll_pmf(sketch, array<double>)` → ARRAY<DOUBLE>. */
case class DsKllPmf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(s: Any, splits: Any): Any = {
    val sk = Ds.kllHeapify(Ds.bytesOf(s))
    val pts = splits.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray().map(_.toFloat)
    if (sk.isEmpty) return null
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      sk.getPMF(pts, Ds.Excl))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_kll_pmf"
}

/** `ds_kll_stringify(sketch)` → summary block, C++ header casing. */
case class DsKllStringify(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val b = Ds.bytesOf(v)
    if (b.isEmpty) return null
    val sk = Ds.kllHeapify(b)
    // the C++ kll_sketch::to_string spells field names sentence-case
    // ("Estimation mode") where the Java summary capitalizes each word
    // — the reference goldens regex on the C++ spellings
    val body = sk.toString
      .linesIterator.drop(1).filterNot(_.trim.isEmpty)
      .map(_.replace("Estimation Mode", "Estimation mode")
        .replace("Dynamic min K", "Min K"))
      .mkString("\n")
    UTF8String.fromString(
      s"### KLL sketch summary:\n$body\n### End sketch summary\n")
  }
  override protected def withNewChildInternal(c: Expression): DsKllStringify =
    copy(c)
  override def prettyName: String = "ds_kll_stringify"
}

/** Impala's strict overload resolution for the `ds_*` family
  * (`FunctionCallExpr.java:404` — "No matching function with
  * signature: name(TYPES)."). The reference registers explicit
  * UNSUPPORTED builtins for every scalar type outside an overload list
  * (BuiltinsDb's ds_hll loop), so types Spark would happily implicitly
  * cast (SMALLINT→INT, DECIMAL→DOUBLE) are REJECTED at analysis — the
  * datasketches golden CATCH rows pin the exact behavior. Enforced in
  * the function-registry builders (children are resolved when a
  * builder runs, so argument types are known).
  */
object DsResolve {

  /** Impala's type spellings (`Type.toSql`). */
  def typeName(dt: DataType): String = dt match {
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case ByteType => "TINYINT"
    case ShortType => "SMALLINT"
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case FloatType => "FLOAT"
    case DoubleType => "DOUBLE"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP"
    case NullType => "NULL"
    case CharType(n) => s"CHAR($n)"
    case VarcharType(n) => s"VARCHAR($n)"
    case _: StringType => "STRING"
    case other => other.sql
  }

  private def fail(name: String, args: Seq[Expression]): Nothing =
    throw new IllegalStateException(
      "AnalysisException: No matching function with signature: " +
        s"$name(${args.map(a => typeName(a.dataType)).mkString(", ")}).")

  /** A serialized-sketch argument: STRING-typed (sketches travel as
    * STRING, IMPALA-9482), CHAR/VARCHAR via implicit cast, or NULL.
    */
  private def sketchTy(dt: DataType): Boolean = dt match {
    case _: StringType | NullType | BinaryType => true
    case CharType(_) | VarcharType(_) => true
    case _ => false
  }

  /** Types with an implicit path to FLOAT: integer widening and
    * DECIMAL (Impala's implicit-cast rules allow decimal→float —
    * `ds_kll_rank(s, 10.0)` resolves, its DECIMAL(3,1) literal cast).
    * DOUBLE and STRING have none (ds_kll_sketch(DOUBLE) is pinned
    * rejected).
    */
  private def floatTy(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        NullType | _: DecimalType => true
    case _ => false
  }

  /** Types with an implicit path to DOUBLE. */
  private def doubleTy(dt: DataType): Boolean = dt match {
    case NullType => true
    case _: NumericType => true
    case _ => false
  }

  /** Types with an implicit path to INT. */
  private def intTy(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | NullType => true
    case _ => false
  }

  /** ds_hll_sketch / ds_hll_sketch_and_estimate:
    * TINYINT/INT/BIGINT/FLOAT/DOUBLE/STRING exactly (every other
    * scalar type has an UNSUPPORTED builtin in the reference).
    */
  def hllBuild(name: String, a: Seq[Expression]): Unit = {
    val ok = a.length == 1 && (a.head.dataType match {
      case ByteType | IntegerType | LongType | FloatType | DoubleType |
          NullType => true
      case t => sketchTy(t)
    })
    if (!ok) fail(name, a)
  }

  /** Single serialized-sketch argument (ds_hll_union, ds_hll_estimate,
    * ds_hll_stringify, ds_kll_union, ds_kll_n, ds_kll_stringify).
    */
  def sketchArg(name: String, a: Seq[Expression]): Unit =
    if (a.length != 1 || !sketchTy(a.head.dataType)) fail(name, a)

  /** ds_hll_estimate_bounds_as_string(STRING[, INT]). */
  def estimateBounds(name: String, a: Seq[Expression]): Unit = {
    val ok = (a.length == 1 || a.length == 2) &&
      sketchTy(a.head.dataType) &&
      (a.length == 1 || intTy(a(1).dataType))
    if (!ok) fail(name, a)
  }

  /** ds_hll_union_f(STRING, STRING). */
  def unionF(name: String, a: Seq[Expression]): Unit =
    if (a.length != 2 || !a.forall(e => sketchTy(e.dataType))) fail(name, a)

  /** ds_kll_sketch(FLOAT) — ints reach it via implicit widening. */
  def kllBuild(name: String, a: Seq[Expression]): Unit =
    if (a.length != 1 || !floatTy(a.head.dataType)) fail(name, a)

  /** (STRING, numeric-second-arg) scalars: ds_kll_quantile's rank is
    * DOUBLE (any numeric widens); ds_kll_rank's value is FLOAT.
    */
  def sketchAndNum(name: String, a: Seq[Expression],
      numOk: DataType => Boolean): Unit = {
    val ok = a.length == 2 && sketchTy(a.head.dataType) &&
      numOk(a(1).dataType)
    if (!ok) fail(name, a)
  }

  def kllQuantile(name: String, a: Seq[Expression]): Unit =
    sketchAndNum(name, a, doubleTy)

  def kllRank(name: String, a: Seq[Expression]): Unit =
    sketchAndNum(name, a, floatTy)

  /** Varargs string-result scalars: (STRING, p1, p2, …) with AT LEAST
    * one parameter (the single-arg call pins "…(STRING)" rejection);
    * quantiles take DOUBLE ranks, pmf/cdf FLOAT split points.
    */
  def kllVarargs(name: String, a: Seq[Expression],
      numOk: DataType => Boolean): Unit = {
    val ok = a.length >= 2 && sketchTy(a.head.dataType) &&
      a.tail.forall(e => numOk(e.dataType))
    if (!ok) fail(name, a)
  }

  def kllQuantiles(name: String, a: Seq[Expression]): Unit =
    kllVarargs(name, a, doubleTy)

  def kllSplits(name: String, a: Seq[Expression]): Unit =
    kllVarargs(name, a, floatTy)
}
