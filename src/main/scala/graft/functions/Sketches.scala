package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct-count + quantile sketches re-implemented from the public
  * algorithm descriptions (no DataSketches dependency — offline build):
  *
  *  - HyperLogLog with p=10 (1024 registers), the precision the
  *    reference's `ndv()` uses (`be/src/exprs/aggregate-functions-ir.cc`
  *    HllInit/Update/Merge/Finalize; registration
  *    `fe/.../catalog/BuiltinsDb.java:913,1018`). Powers `ndv_hll`,
  *    `ds_hll_sketch`, `ds_hll_estimate`, `ds_hll_union`
  *    (`be/src/exprs/datasketches-functions-ir.cc` API surface —
  *    estimate-level compat, not byte-level; SURVEY §7.4).
  *  - A weighted-sample quantile sketch standing in for KLL:
  *    `ds_kll_sketch`, `ds_kll_quantile`, `ds_kll_rank`, `ds_kll_n`,
  *    `ds_kll_union`, and `histogram`
  *    (`BuiltinsDb.java:1001,1056-1077`; ReservoirSample* in
  *    `aggregate-functions.h`).
  *
  * Sketches serialize to BinaryType so they can be stored, shuffled, and
  * re-merged across partitions — the same split aggregate shape Spark
  * uses for its own TypedImperativeAggregates (partial sketch per
  * partition, merge at the final agg: map-side combine keeps the shuffle
  * at O(#groups × sketch size), independent of row count).
  */
object Hll {
  val P = 10
  val M = 1 << P // 1024 registers

  def create(): Array[Byte] = new Array[Byte](M)

  def update(reg: Array[Byte], v: Any): Unit = {
    val h = HashImpls.murmurAny(v)
    val idx = (h >>> (64 - P)).toInt
    val w = h << P
    val rank = (if (w == 0) 64 - P else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = math.min(rank, 64 - P + 1).toByte
    if (reg(idx) < r) reg(idx) = r
  }

  def merge(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  /** Standard HLL estimator with linear-counting small-range correction. */
  def estimate(reg: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      sum += math.pow(2.0, -reg(i).toDouble)
      if (reg(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * M * M / sum
    val est =
      if (raw <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros)
      else raw
    math.round(est)
  }
}

abstract class HllAggBase extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {
  override def createAggregationBuffer(): Array[Byte] = Hll.create()
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    Hll.merge(a, b); a
  }
  override def nullable: Boolean = false
}

/** `ndv_hll(x)` → BIGINT distinct estimate (reference `ndv()`). */
case class NdvHll(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def dataType: DataType = LongType
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Hll.update(b, v)
    b
  }
  override def eval(b: Array[Byte]): Any = Hll.estimate(b)
  override def withNewMutableAggBufferOffset(o: Int): NdvHll =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): NdvHll =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): NdvHll = copy(child = c)
  override def prettyName: String = "ndv_hll"
}

/** `ds_hll_sketch(x)` → BINARY serialized HLL registers. */
case class DsHllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def dataType: DataType = BinaryType
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Hll.update(b, v)
    b
  }
  override def eval(b: Array[Byte]): Any = b.clone()
  override def withNewMutableAggBufferOffset(o: Int): DsHllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsHllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsHllSketch =
    copy(child = c)
  override def prettyName: String = "ds_hll_sketch"
}

/** `ds_hll_union(sketch)` → BINARY merged sketch (aggregate over
  * pre-computed sketches, e.g. per-partition rollups).
  */
case class DsHllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def dataType: DataType = BinaryType
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Hll.merge(b, v.asInstanceOf[Array[Byte]])
    b
  }
  override def eval(b: Array[Byte]): Any = b.clone()
  override def withNewMutableAggBufferOffset(o: Int): DsHllUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsHllUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsHllUnion =
    copy(child = c)
  override def prettyName: String = "ds_hll_union"
}

/** `ds_hll_estimate(sketch)` → BIGINT, scalar over a serialized sketch. */
case class DsHllEstimate(child: Expression) extends UnaryExpression
    {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])
  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hll.estimate($c)")
  override protected def withNewChildInternal(c: Expression): DsHllEstimate =
    copy(c)
  override def prettyName: String = "ds_hll_estimate"
}

// ---------------------------------------------------------------------------

/** Bounded weighted-sample quantile buffer: (value, weight) pairs. On
  * overflow the buffer is re-summarized into [[Quantiles.Cap]] equi-mass
  * entries (the value at each cumulative-weight boundary carries 1/Cap of
  * the total mass) — rank error ≤ 1/(2·Cap) per compaction, compounding
  * to well under 1% over realistic merge depths. Estimate-level accuracy
  * only (SURVEY §7.4 risk 7).
  */
object Quantiles {
  val Cap = 2048

  type Buf = ArrayBuffer[(Double, Long)]

  def create(): Buf = new ArrayBuffer[(Double, Long)]

  def insert(b: Buf, v: Double, w: Long = 1L): Unit = {
    b += ((v, w))
    if (b.length > 2 * Cap) compact(b)
  }

  def mergeInto(a: Buf, b: Buf): Unit = {
    a ++= b
    if (a.length > 2 * Cap) compact(a)
  }

  private def compact(b: Buf): Unit = {
    val sorted = b.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    b.clear()
    if (total <= 0) return
    val k = math.min(Cap, sorted.length)
    var idx = 0
    var cum = 0L
    var assigned = 0L
    var i = 1
    while (i <= k) {
      val target = total * i / k
      while (cum < target && idx < sorted.length) {
        cum += sorted(idx)._2; idx += 1
      }
      val v = sorted(math.max(math.min(idx - 1, sorted.length - 1), 0))._1
      val w = target - assigned
      if (w > 0) b += ((v, w))
      assigned = target
      i += 1
    }
  }

  def totalWeight(b: Buf): Long = b.iterator.map(_._2).sum

  def quantile(b: Buf, q: Double): Double = {
    if (b.isEmpty) return Double.NaN
    val sorted = b.sortBy(_._1)
    val total = totalWeight(b)
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  /** Fraction of mass <= v. */
  def rank(b: Buf, v: Double): Double = {
    val total = totalWeight(b)
    if (total == 0) return Double.NaN
    b.iterator.filter(_._1 <= v).map(_._2).sum.toDouble / total
  }

  def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach { case (v, w) => out.writeDouble(v); out.writeLong(w) }
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = create()
    var i = 0
    while (i < n) { b += ((in.readDouble(), in.readLong())); i += 1 }
    b
  }

}

abstract class QuantileAggBase extends TypedImperativeAggregate[Quantiles.Buf]
    with UnaryLike[Expression] {
  override def createAggregationBuffer(): Quantiles.Buf = Quantiles.create()
  override def serialize(b: Quantiles.Buf): Array[Byte] = Quantiles.serialize(b)
  override def deserialize(bytes: Array[Byte]): Quantiles.Buf =
    Quantiles.deserialize(bytes)
  override def merge(a: Quantiles.Buf, b: Quantiles.Buf): Quantiles.Buf = {
    Quantiles.mergeInto(a, b); a
  }
  override def nullable: Boolean = false
  protected def numericValue(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    case d: Decimal => d.toDouble
    case other => other.toString.toDouble
  }
}

/** `ds_kll_sketch(x)` → BINARY serialized quantile sketch. */
case class DsKllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends QuantileAggBase {
  override def dataType: DataType = BinaryType
  override def update(b: Quantiles.Buf, row: InternalRow): Quantiles.Buf = {
    val v = child.eval(row)
    if (v != null) Quantiles.insert(b, numericValue(v))
    b
  }
  override def eval(b: Quantiles.Buf): Any = Quantiles.serialize(b)
  override def withNewMutableAggBufferOffset(o: Int): DsKllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsKllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsKllSketch =
    copy(child = c)
  override def prettyName: String = "ds_kll_sketch"
}

/** `ds_kll_union(sketch)` → BINARY merged quantile sketch. */
case class DsKllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends QuantileAggBase {
  override def dataType: DataType = BinaryType
  override def update(b: Quantiles.Buf, row: InternalRow): Quantiles.Buf = {
    val v = child.eval(row)
    if (v != null) {
      Quantiles.mergeInto(b, Quantiles.deserialize(v.asInstanceOf[Array[Byte]]))
    }
    b
  }
  override def eval(b: Quantiles.Buf): Any = Quantiles.serialize(b)
  override def withNewMutableAggBufferOffset(o: Int): DsKllUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DsKllUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DsKllUnion =
    copy(child = c)
  override def prettyName: String = "ds_kll_union"
}

/** `histogram(x)` → STRING, replicating the reference's
  * ReservoirSample histogram exactly (`aggregate-functions-ir.cc`
  * HistogramFinalize): sort the sampled values, then print
  * `min(n, 100)` bucket samples at index `(b+1)·max(n/100, 1) − 1`,
  * ", "-separated, each formatted per input type via PrintSample —
  * integers bare, float/double with C++ ostream default precision
  * (6 significant digits), DECIMAL as the raw unscaled value, strings
  * truncated to 10 bytes, timestamps as TimestampValue::ToString.
  * Exact (all values retained) up to the reference's 20 000-sample
  * reservoir; above that the reference keeps a random reservoir where
  * this keeps a deterministic prefix — both are samples, ours is
  * reproducible.
  */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  import HistogramAgg._

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  override def update(b: ArrayBuffer[Any], row: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(row)
    if (v != null && b.length < MaxSamples) b += normalize(v, child.dataType)
    b
  }

  override def merge(a: ArrayBuffer[Any], b: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    val take = math.min(b.length, MaxSamples - a.length)
    if (take > 0) a ++= b.take(take)
    a
  }

  override def eval(b: ArrayBuffer[Any]): Any = {
    if (b.isEmpty) return null
    val sorted = b.sortWith((x, y) => less(x, y, child.dataType))
    val n = sorted.length
    val numBuckets = math.min(n, NumBuckets)
    val perBucket = math.max(n / NumBuckets, 1)
    val out = new StringBuilder
    var i = 0
    while (i < numBuckets) {
      if (i > 0) out.append(", ")
      out.append(printSample(sorted((i + 1) * perBucket - 1), child.dataType))
      i += 1
    }
    UTF8String.fromString(out.toString)
  }

  override def serialize(b: ArrayBuffer[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(b.toArray)
    oos.flush()
    bos.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val ois = new java.io.ObjectInputStream(new ByteArrayInputStream(bytes))
    ArrayBuffer.from(ois.readObject().asInstanceOf[Array[Any]])
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HistogramAgg =
    copy(child = c)
  override def prettyName: String = "histogram"
}

object HistogramAgg {
  /** NUM_BUCKETS / NUM_BUCKETS·NUM_SAMPLES_PER_BUCKET
    * (aggregate-functions-ir.cc:1008-1009).
    */
  val NumBuckets = 100
  val MaxSamples = 20000
  private val MaxStringLen = 10 // MAX_STRING_SAMPLE_LEN

  /** Catalyst value → serializable buffer entry. */
  private def normalize(v: Any, t: DataType): Any = (v, t) match {
    case (s: UTF8String, _) =>
      val b = s.getBytes
      if (b.length <= MaxStringLen) b else b.take(MaxStringLen)
    case (d: Decimal, _) => d.toJavaBigDecimal
    case (n: Byte, _) => n.toLong
    case (n: Short, _) => n.toLong
    case (n: Int, _) => n.toLong
    case (other, _) => other
  }

  private def cmpBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    a.length - b.length
  }

  private def less(x: Any, y: Any, t: DataType): Boolean = (x, y) match {
    case (a: Long, b: Long) => a < b
    case (a: Float, b: Float) => a < b
    case (a: Double, b: Double) => a < b
    case (a: Boolean, b: Boolean) => !a && b
    case (a: Array[Byte], b: Array[Byte]) => cmpBytes(a, b) < 0
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) => a.compareTo(b) < 0
    case _ => false
  }

  private def printSample(v: Any, t: DataType): String = (v, t) match {
    case (micros: Long, TimestampType) =>
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
        f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
        f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
      if (ldt.getNano == 0) base else base + f".${ldt.getNano}%09d"
    case (days: Long, DateType) => // normalized Int → Long
      java.time.LocalDate.ofEpochDay(days).toString
    case (b: Boolean, _) => if (b) "1" else "0"
    case (f: Float, _) => ImpalaSemantics.cFormatG(f.toDouble, 6)
    case (d: Double, _) => ImpalaSemantics.cFormatG(d, 6)
    case (b: Array[Byte], _) => new String(b, java.nio.charset.StandardCharsets.UTF_8)
    case (d: java.math.BigDecimal, _) => d.unscaledValue.toString
    case (other, _) => other.toString
  }
}

/** `ds_kll_quantile(sketch, q)` → DOUBLE. */
case class DsKllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(s: Any, q: Any): Any =
    Quantiles.quantile(Quantiles.deserialize(s.asInstanceOf[Array[Byte]]),
      q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_kll_quantile"
}

/** `ds_kll_rank(sketch, v)` → DOUBLE fraction of mass <= v. */
case class DsKllRank(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(s: Any, v: Any): Any =
    Quantiles.rank(Quantiles.deserialize(s.asInstanceOf[Array[Byte]]),
      v.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_kll_rank"
}

/** `ds_kll_cdf(sketch, splits)` → ARRAY<DOUBLE>: cumulative mass at each
  * split point, plus a trailing 1.0 (m+1 values for m splits, matching
  * the DataSketches KLL API shape — `datasketches-functions-ir.cc`).
  */
case class DsKllCdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(s: Any, splits: Any): Any = {
    val buf = Quantiles.deserialize(s.asInstanceOf[Array[Byte]])
    val pts = splits.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    new GenericArrayData(pts.map(p => Quantiles.rank(buf, p)) :+ 1.0)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_kll_cdf"
}

/** `ds_kll_pmf(sketch, splits)` → ARRAY<DOUBLE>: probability mass in each
  * of the m+1 intervals defined by m split points.
  */
case class DsKllPmf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def nullSafeEval(s: Any, splits: Any): Any = {
    val buf = Quantiles.deserialize(s.asInstanceOf[Array[Byte]])
    val pts = splits.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toDoubleArray()
    val cdf = pts.map(p => Quantiles.rank(buf, p)) :+ 1.0
    val pmf = new Array[Double](cdf.length)
    var prev = 0.0
    var i = 0
    while (i < cdf.length) { pmf(i) = cdf(i) - prev; prev = cdf(i); i += 1 }
    new GenericArrayData(pmf)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "ds_kll_pmf"
}

/** `ds_hll_stringify(sketch)` → STRING human-readable summary
  * (`datasketches-functions-ir.cc` DsHllStringify — summary-level, not
  * byte-format, compat).
  */
case class DsHllStringify(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any = {
    val reg = v.asInstanceOf[Array[Byte]]
    val nonzero = reg.count(_ != 0)
    UTF8String.fromString(
      s"HLL(p=${Hll.P}, estimate=${Hll.estimate(reg)}, nonzero=$nonzero)")
  }
  override protected def withNewChildInternal(c: Expression): DsHllStringify =
    copy(c)
  override def prettyName: String = "ds_hll_stringify"
}

/** `ds_kll_n(sketch)` → BIGINT number of values fed to the sketch. */
case class DsKllN(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(s: Any): Any =
    Quantiles.totalWeight(Quantiles.deserialize(s.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): DsKllN = copy(c)
  override def prettyName: String = "ds_kll_n"
}
