package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `UnscaledDec(d, p, s)` → BIGINT: the unscaled long of
  * `CAST(d AS DECIMAL(p,s))` for a DOUBLE input — semantically identical
  * to `UnscaledValue(Cast(d, DecimalType(p, s)))`, with an integer fast
  * path for the overwhelmingly common case of a double that is exactly a
  * scale-s decimal (r17, optimization guide §1.2 per-task work: Spark's
  * double→decimal cast goes through `BigDecimal.valueOf(d)`, i.e. a
  * `Double.toString` + parse per value — ~40% of tpch_q1's remaining
  * aggregate time after the unscaled-sum rewrite).
  *
  * Fast-path proof: accept r = rint(d·10^s) only when `r/10^s == d`
  * bit-exactly and |r| < 10^p. Then r/10^s is a scale-s decimal that
  * round-trips to d, so the shortest-representation decimal v that
  * `BigDecimal.valueOf(d)` produces satisfies |v − r/10^s| ≤ ulp(d)
  * (both round to d). The guard bounds |d| < 10^(p−s) ≤ 10^16, hence
  * ulp(d) ≤ |d|·2⁻⁵² < 5·10^−(s+1) — strictly less than the distance
  * from r/10^s to the nearest HALF_UP rounding boundary — so
  * `v.setScale(s, HALF_UP)` is exactly r, matching the cast. (v can
  * never BE a boundary: a boundary differs from r/10^s by 5·10^−(s+1)
  * > ulp.) NaN/±Inf fail the `r/10^s == d` / |r| guards (NaN ≠ NaN;
  * |±Inf| ≥ 10^p) and take the slow path, which is Spark's own
  * `Decimal(d).changePrecision(p, s)`.
  */
case class UnscaledDec(child: Expression, p: Int, s: Int)
    extends UnaryExpression {
  require(p <= 18, s"UnscaledDec requires a long-backed precision, got $p")

  // r18 (advisor): the fast-path proof needs 10^(p+1) < 5·2⁵² — i.e.
  // p ≤ 15 — for BOTH legs (rint(d·10^s) exact below 2^53, and
  // ulp(d) < the 5·10^-(s+1) half-up boundary margin). p ∈ 16..18 is
  // still a valid long-backed decimal, it just takes the slow path
  // unconditionally instead of a silently-inexact fast one.
  private val fastOk = p <= 15

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unscaled_dec requires DOUBLE, got ${t.simpleString}")
    }

  private val pow = math.pow(10, s)
  private val maxUnscaled = math.pow(10, p)

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[Double])

  /** Codegen entry. */
  def compute(d: Double): Long = {
    if (fastOk) {
      val r = Math.rint(d * pow)
      if (r / pow == d && Math.abs(r) < maxUnscaled) return r.toLong
    }
    slow(d)
  }

  private def slow(d: Double): Long = {
    val dec =
      try org.apache.spark.sql.types.Decimal(d)
      catch {
        case _: NumberFormatException =>
          throw new ArithmeticException(
            s"[CAST_OVERFLOW] invalid DOUBLE $d for DECIMAL($p,$s)")
      }
    if (!dec.changePrecision(p, s))
      throw new ArithmeticException(
        s"[CAST_OVERFLOW] $d out of DECIMAL($p,$s) range")
    dec.toUnscaledLong
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unscaledDec", this, classOf[UnscaledDec].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }
  override protected def withNewChildInternal(c: Expression): UnscaledDec =
    copy(child = c)
  override def prettyName: String = "unscaled_dec"
}
