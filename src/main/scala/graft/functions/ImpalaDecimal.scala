package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType}

/** DECIMAL_V2 runtime overflow contracts
  * (`be/src/exprs/aggregate-functions-ir.cc` SumDecimalUpdate /
  * AvgGetValue overflow checks, `be/src/runtime/decimal-value.inline.h`
  * arithmetic overflow flags; decimal-exprs.test CATCH rows): where
  * Spark's non-ANSI decimal paths silently null on overflow, Impala V2
  * raises a `UDF ERROR`. These wrappers detect the null-from-overflow
  * case and raise with the reference's message.
  */

/** Decimal fit check: Impala's avg() output type is DECIMAL(38,
  * max(s,6)) (FunctionCallExpr.java), so a mean that needs more than
  * 38 digits AT THAT SCALE raises even when it fits Spark's own result
  * scale. Check-only — the value and Spark type pass through unchanged
  * (no downstream attribute-type churn); only the would-not-fit case
  * raises `msg`. NULL stays NULL (the overflow-vs-empty ambiguity is
  * guarded separately by the caller).
  */
case class ImpalaDecimalRescale(child: Expression, targetScale: Int,
    msg: String) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = {
    val bd = v.asInstanceOf[Decimal].toJavaBigDecimal
      .setScale(targetScale, java.math.RoundingMode.HALF_UP)
    if (bd.precision > 38) Ds.udfError(msg)
    v
  }
  override protected def withNewChildInternal(c: Expression): ImpalaDecimalRescale =
    copy(child = c)
  override def prettyName: String = "impala_decimal_rescale"
}

/** Decimal arithmetic overflow guard: evaluates the wrapped binary
  * arithmetic and, when it nulls while BOTH operands are non-null
  * (Spark's non-ANSI overflow signal), raises Impala's
  * `Decimal expression overflowed`. Applied only to arithmetic whose
  * natural result precision exceeds 38 — everything else is
  * overflow-free by construction and stays on the codegen path.
  *
  * Each operand subtree is evaluated exactly once per row: the operand
  * values are captured into leaf holders and the arithmetic is re-run
  * over the holders, so side-effecting or non-deterministic operands
  * cannot yield inconsistent null-vs-overflow classification.
  */
case class ImpalaDecimalArithGuard(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  @transient private lazy val bound: Option[(Expression, ValueHolder,
      ValueHolder, Expression, Expression)] = child match {
    case b: BinaryExpression =>
      val lh = ValueHolder(b.left.dataType)
      val rh = ValueHolder(b.right.dataType)
      Some((b.withNewChildren(Seq(lh, rh)), lh, rh, b.left, b.right))
    case _ => None
  }

  override def eval(input: InternalRow): Any = bound match {
    case Some((arith, lh, rh, left, right)) =>
      val l = left.eval(input)
      val r = right.eval(input)
      if (l == null || r == null) null
      else {
        lh.value = l; rh.value = r
        val v = arith.eval(input)
        if (v == null) Ds.udfError("Decimal expression overflowed")
        v
      }
    case None => child.eval(input)
  }
  override protected def withNewChildInternal(c: Expression): ImpalaDecimalArithGuard =
    copy(child = c)
  override def prettyName: String = "impala_decimal_arith_guard"
}

/** Leaf that replays a captured operand value; lets a wrapped
  * arithmetic re-run over already-evaluated operands without
  * re-evaluating the operand subtrees (see ImpalaDecimalArithGuard).
  *
  * Equality is REFERENCE equality (not structural): two holders of the
  * same type must never compare equal, or equality/canonicalization
  * based dedup of the rebuilt arithmetic could merge distinct operand
  * slots. The mutable `value` is written and read within a single
  * `eval` call on one thread (interpreted eval of the enclosing guard);
  * the holder is never shared across guard instances.
  */
class ValueHolder(val dt: DataType)
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression
    with CodegenFallback {
  @transient var value: Any = null
  override def dataType: DataType = dt
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = value
  override def equals(other: Any): Boolean = other match {
    case o: AnyRef => this.eq(o)
    case _ => false
  }
  override def hashCode: Int = System.identityHashCode(this)
  // Product members (TreeNode requires Product; not a case class so
  // structural equality is never synthesized)
  override def productArity: Int = 1
  override def productElement(n: Int): Any = dt
  override def canEqual(that: Any): Boolean =
    that.isInstanceOf[ValueHolder]
  override def prettyName: String = "value_holder"
}

object ValueHolder {
  def apply(dt: DataType): ValueHolder = new ValueHolder(dt)
}
