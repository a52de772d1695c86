package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Impala bit-manipulation builtins missing from Spark
  * (reference: `be/src/exprs/bit-byte-functions-ir.cc`):
  * `rotateleft`, `rotateright`, `getbit`, `setbit`, `countset`.
  *
  * All operate within the *declared integer width* (rotating an INT
  * rotates 32 bits, a TINYINT 8), preserving the input type — matching
  * the reference's templated-by-type implementations. Codegen emits
  * static calls into [[BitImpls]] so whole-stage codegen stays intact.
  */
object BitImpls {

  private def width(v: Any): Int = v match {
    case _: Byte => 8
    case _: Short => 16
    case _: Int => 32
    case _ => 64
  }

  private def toL(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  private def back(v: Any, r: Long): Any = v match {
    case _: Byte => r.toByte
    case _: Short => r.toShort
    case _: Int => r.toInt
    case _ => r
  }

  def rotl(v: Any, shift: Int): Any = {
    val w = width(v)
    val s = ((shift % w) + w) % w
    val x = toL(v)
    if (s == 0) v
    else if (w == 64) back(v, (x << s) | (x >>> (64 - s)))
    else {
      val mask = (1L << w) - 1
      val ux = x & mask
      back(v, ((ux << s) | (ux >>> (w - s))) & mask)
    }
  }

  def rotr(v: Any, shift: Int): Any = rotl(v, -shift)

  /** 0/1 value of the bit at `pos` (LSB = 0); null-free range check is
    * the caller's concern — out-of-range returns 0, like shifting out.
    */
  def getbit(v: Any, pos: Int): Byte = {
    val w = width(v)
    if (pos < 0 || pos >= w) 0 else ((toL(v) >>> pos) & 1L).toByte
  }

  def setbit(v: Any, pos: Int, bit: Int): Any = {
    val w = width(v)
    if (pos < 0 || pos >= w) v
    else if (bit == 0) back(v, toL(v) & ~(1L << pos))
    else back(v, toL(v) | (1L << pos))
  }

  /** Count of set (or zero, if `target`=0) bits within the type width. */
  def countset(v: Any, target: Int): Int = {
    val w = width(v)
    val mask = if (w == 64) -1L else (1L << w) - 1
    val ones = java.lang.Long.bitCount(toL(v) & mask)
    if (target == 0) w - ones else ones
  }
}

sealed trait BitBinary extends BinaryExpression {
  protected def fnName: String
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cast = dataType match {
      case ByteType => "(byte)(Byte)"
      case ShortType => "(short)(Short)"
      case IntegerType => "(int)(Integer)"
      case LongType => "(long)(Long)"
      case _ => ""
    }
    defineCodeGen(ctx, ev,
      (a, b) => s"${cast}graft.functions.BitImpls.$fnName($a, $b)")
  }
}

/** `rotateleft(x, n)` — bit-byte-functions-ir.cc RotateLeft. */
case class RotateLeft(left: Expression, right: Expression) extends BitBinary
    {
  override def dataType: DataType = left.dataType
  override protected def fnName: String = "rotl"
  override protected def nullSafeEval(v: Any, s: Any): Any =
    BitImpls.rotl(v, s.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "rotateleft"
}

/** `rotateright(x, n)` — bit-byte-functions-ir.cc RotateRight. */
case class RotateRight(left: Expression, right: Expression) extends BitBinary
    {
  override def dataType: DataType = left.dataType
  override protected def fnName: String = "rotr"
  override protected def nullSafeEval(v: Any, s: Any): Any =
    BitImpls.rotr(v, s.asInstanceOf[Int])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "rotateright"
}

/** `getbit(x, pos)` → TINYINT — bit-byte-functions-ir.cc GetBit. */
case class GetBit(left: Expression, right: Expression) extends BitBinary
    {
  override def dataType: DataType = ByteType
  override protected def fnName: String = "getbit"
  override protected def nullSafeEval(v: Any, p: Any): Any =
    BitImpls.getbit(v, p.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitImpls.getbit($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "getbit"
}

/** `countset(x[, b])` → INT count of bits equal to b (default 1) —
  * bit-byte-functions-ir.cc CountSet.
  */
case class CountSet(left: Expression, right: Expression) extends BitBinary
    {
  def this(child: Expression) = this(child, Literal(1))
  override def dataType: DataType = IntegerType
  override protected def fnName: String = "countset"
  override protected def nullSafeEval(v: Any, b: Any): Any =
    BitImpls.countset(v, b.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.BitImpls.countset($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "countset"
}

/** `setbit(x, pos[, val])` — bit-byte-functions-ir.cc SetBit. */
case class SetBit(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  def this(x: Expression, pos: Expression) = this(x, pos, Literal(1))
  override def dataType: DataType = first.dataType
  override protected def nullSafeEval(v: Any, p: Any, b: Any): Any =
    BitImpls.setbit(v, p.asInstanceOf[Int], b.asInstanceOf[Int])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cast = dataType match {
      case ByteType => "(byte)(Byte)"
      case ShortType => "(short)(Short)"
      case IntegerType => "(int)(Integer)"
      case _ => "(long)(Long)"
    }
    defineCodeGen(ctx, ev,
      (a, b, c) => s"${cast}graft.functions.BitImpls.setbit($a, $b, $c)")
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression) = copy(f, s, t)
  override def prettyName: String = "setbit"
}
