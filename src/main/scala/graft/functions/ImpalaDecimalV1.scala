package graft.functions

import java.math.{BigInteger, RoundingMode, BigDecimal => JBigDecimal}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Legacy DECIMAL_V2=false ("V1") decimal semantics
  * (`fe/src/main/java/org/apache/impala/analysis/TypesUtil.java:169-207`
  * getDecimalArithmeticResultTypeV1; `be/src/exprs/decimal-operators.cc`
  * V1 execution; decimal-exprs.test `set decimal_v2=false` sections):
  * V1 result types sacrifice digits LEFT of the point (clip at
  * precision 38 keeping the formula scale), division/casts TRUNCATE
  * instead of rounding, and every overflow/parse failure NULLs with a
  * warning instead of raising. Only active under `SET DECIMAL_V2=0` —
  * a legacy replay path, never the hot path, so CodegenFallback is
  * acceptable here.
  */
object ImpalaDecimalV1 {
  val TEN19: BigInteger = BigInteger.TEN.pow(19)
  val TEN38: BigInteger = BigInteger.TEN.pow(38)
  private val INT128_MOD: BigInteger = BigInteger.TWO.pow(128)
  private val INT128_HALF: BigInteger = BigInteger.TWO.pow(127)

  /** V1 ADD/SUBTRACT/MULTIPLY/MOD/DIVIDE result type
    * (TypesUtil.getDecimalArithmeticResultTypeV1). `op` ∈
    * {"add","mul","div","mod"}.
    */
  def v1ResultType(p1: Int, s1: Int, p2: Int, s2: Int,
      op: String): (Int, Int) = {
    val sMax = math.max(s1, s2)
    val (p, s) = op match {
      case "add" => (sMax + math.max(p1 - s1, p2 - s2) + 1, sMax)
      case "mul" => (p1 + p2, s1 + s2)
      case "mod" => (math.min(p1 - s1, p2 - s2) + sMax, sMax)
      case "div" =>
        val rs = math.max(4, s1 + p2 + 1) // DECIMAL_DIVISION_SCALE_INCREMENT
        val rp = p1 - s1 + s2 + rs
        if (rp > 38) (38, math.max(s1, s2)) else (rp, rs)
    }
    // createClippedDecimalType: cap precision at 38 keeping scale
    (math.min(38, p), math.min(s, math.min(38, p)))
  }

  /** Wrap an arbitrary integer into signed int128 (the BE's `val16 +=`
    * two's-complement wraparound).
    */
  def wrap128(x: BigInteger): BigInteger =
    x.add(INT128_HALF).mod(INT128_MOD).subtract(INT128_HALF)

  /** Reduce an int128 value into 38 decimal digits the way an
    * out-of-range value renders (truncated toward zero, sign kept). */
  def mod38(x: BigInteger): BigInteger = x.remainder(TEN38)

  def fits(unscaled: BigInteger, precision: Int): Boolean =
    unscaled.abs.compareTo(BigInteger.TEN.pow(precision)) < 0
}

/** V1 decimal division: result type per the V1 rule over the operands'
  * ORIGINAL types (the dialect strips analyzer widening casts before
  * wrapping), value truncated toward zero at the result scale;
  * division by zero and >38-digit results NULL (the reference logs a
  * UDF WARNING and continues).
  */
case class ImpalaV1Divide(left: Expression, right: Expression,
    declP: Int, declS: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DecimalType(declP, declS)
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Decimal].toJavaBigDecimal
    val b = r.asInstanceOf[Decimal].toJavaBigDecimal
    if (b.signum == 0) return null
    val q = a.divide(b, declS, RoundingMode.DOWN)
    if (!ImpalaDecimalV1.fits(q.unscaledValue, 38)) null
    else Decimal(q, declP, declS)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ImpalaV1Divide = copy(left = l, right = r)
  override def prettyName: String = "impala_v1_divide"
}

/** V1 decimal modulo: `(min(p1-s1, p2-s2) + sMax, sMax)` result type,
  * truncated remainder, NULL on zero divisor.
  */
case class ImpalaV1Mod(left: Expression, right: Expression,
    declP: Int, declS: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DecimalType(declP, declS)
  override def nullable: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[Decimal].toJavaBigDecimal
    val b = r.asInstanceOf[Decimal].toJavaBigDecimal
    if (b.signum == 0) return null
    val m = a.remainder(b).setScale(declS, RoundingMode.DOWN)
    if (!ImpalaDecimalV1.fits(m.unscaledValue, 38)) null
    else Decimal(m, declP, declS)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ImpalaV1Mod = copy(left = l, right = r)
  override def prettyName: String = "impala_v1_mod"
}

/** V1 decimal→decimal cast: truncates toward zero at the target scale
  * (V2/Spark round half-up) and NULLs when the value does not fit the
  * target precision (V2 raises).
  */
case class ImpalaV1DecimalCast(child: Expression, declP: Int, declS: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DecimalType(declP, declS)
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val bd = v.asInstanceOf[Decimal].toJavaBigDecimal
      .setScale(declS, RoundingMode.DOWN)
    if (!ImpalaDecimalV1.fits(bd.unscaledValue, declP)) null
    else Decimal(bd, declP, declS)
  }
  override protected def withNewChildInternal(c: Expression): ImpalaV1DecimalCast =
    copy(child = c)
  override def prettyName: String = "impala_v1_decimal_cast"
}

/** High 19+ digits of a decimal's unscaled value (truncated toward
  * zero): together with [[ImpalaDecimalLo]] splits a 38-digit unscaled
  * value into two halves each of which sums without overflow, so a V1
  * wraparound sum stays a pair of ordinary partial-able aggregates.
  */
case class ImpalaDecimalHi(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DecimalType(38, 0)
  override protected def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue
    Decimal(new JBigDecimal(u.divide(ImpalaDecimalV1.TEN19)), 38, 0)
  }
  override protected def withNewChildInternal(c: Expression): ImpalaDecimalHi =
    copy(child = c)
  override def prettyName: String = "impala_decimal_hi"
}

/** Low 19 digits of a decimal's unscaled value (remainder toward zero,
  * sign of the dividend — hi*10^19 + lo reconstructs exactly). */
case class ImpalaDecimalLo(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DecimalType(38, 0)
  override protected def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue
    Decimal(new JBigDecimal(u.remainder(ImpalaDecimalV1.TEN19)), 38, 0)
  }
  override protected def withNewChildInternal(c: Expression): ImpalaDecimalLo =
    copy(child = c)
  override def prettyName: String = "impala_decimal_lo"
}

/** V1 sum finisher: recombines the hi/lo partial sums, wraps into
  * signed int128 (`aggregate-functions-ir.cc` SumDecimalAddOrSubtract
  * does an unchecked `val16 +=` under V1) and renders at most 38
  * digits (truncated toward zero) — reproducing the reference's
  * "negative number incorrectly returned due to overflow".
  */
case class ImpalaV1SumFinish(hi: Expression, lo: Expression, declS: Int)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = hi
  override def right: Expression = lo
  override def dataType: DataType = DecimalType(38, declS)
  override def nullable: Boolean = true
  override protected def nullSafeEval(h: Any, l: Any): Any = {
    val total = h.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue
      .multiply(ImpalaDecimalV1.TEN19)
      .add(l.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue)
    val r = ImpalaDecimalV1.mod38(ImpalaDecimalV1.wrap128(total))
    Decimal(new JBigDecimal(r, declS), 38, declS)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ImpalaV1SumFinish = copy(hi = l, lo = r)
  override def prettyName: String = "impala_v1_sum_finish"
}

/** V1 avg finisher: wraparound sum divided by the row count with
  * truncation toward zero (the BE's int128 division), presented at the
  * INPUT type's scale (V1 avg returns the input type —
  * FunctionCallExpr.resolveDecimalReturnType).
  */
case class ImpalaV1AvgFinish(hi: Expression, lo: Expression,
    count: Expression, declS: Int)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = hi
  override def second: Expression = lo
  override def third: Expression = count
  override def dataType: DataType = DecimalType(38, declS)
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val h = hi.eval(input)
    val l = lo.eval(input)
    val c = count.eval(input)
    if (h == null || l == null || c == null) return null
    val n = c.asInstanceOf[Long]
    if (n == 0L) return null
    val total = h.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue
      .multiply(ImpalaDecimalV1.TEN19)
      .add(l.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue)
    val q = ImpalaDecimalV1.wrap128(total).divide(BigInteger.valueOf(n))
    Decimal(new JBigDecimal(ImpalaDecimalV1.mod38(q), declS), 38, declS)
  }
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): ImpalaV1AvgFinish =
    copy(hi = f, lo = s, count = t)
  override def prettyName: String = "impala_v1_avg_finish"
}
