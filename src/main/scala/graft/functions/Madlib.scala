package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The MADlib vector builtins
  * (`be/src/exprs/udf-builtins-ir.cc:99-200`,
  * `common/function-registry/impala_functions.py:112-121`): a vector is
  * a STRING of little-endian packed doubles. `madlib_vector` RAISES on
  * a NULL entry (`madlib vector entry $i is NULL`); when the failing
  * call is constant (all-foldable args), the raise carries the
  * analyzer's constant-fold wrapping
  * (`Analyzer.java` — `Error evaluating "…" CAUSED BY:
  * InternalException: …`), matching where Impala detects it.
  */
object Madlib {
  def foldWrap(foldable: Boolean, msg: String): Nothing =
    if (foldable)
      throw new IllegalStateException(
        "AnalysisException: Error evaluating expression CAUSED BY: " +
          s"InternalException: $msg")
    else Ds.udfError(msg)
}

case class MadlibVector(children: Seq[Expression]) extends Expression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def eval(input: InternalRow): Any = {
    val buf = java.nio.ByteBuffer.allocate(children.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null)
        Madlib.foldWrap(children.forall(_.foldable),
          s"madlib vector entry $i is NULL")
      buf.putDouble(v.asInstanceOf[Double])
      i += 1
    }
    UTF8String.fromBytes(buf.array())
  }
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): MadlibVector = copy(children = cs)
  override def prettyName: String = "madlib_vector"
}

case class MadlibVectorGet(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override protected def nullSafeEval(idx: Any, arr: Any): Any = {
    val bytes = arr.asInstanceOf[UTF8String].getBytes
    val i = idx.asInstanceOf[Long]
    val len = bytes.length / 8
    if (i < 0 || i >= len) null
    else java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getDouble(i.toInt * 8)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): MadlibVectorGet = copy(l, r)
  override def prettyName: String = "madlib_vector_get"
}

case class MadlibPrintVector(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(arr: Any): Any = {
    val bytes = arr.asInstanceOf[UTF8String].getBytes
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val sb = new StringBuilder("<")
    var i = 0
    while (i * 8 + 8 <= bytes.length) {
      if (i != 0) sb.append(", ")
      sb.append(MadlibPrintVector.ccDouble(bb.getDouble(i * 8)))
      i += 1
    }
    UTF8String.fromString(sb.append(">").toString)
  }
  override protected def withNewChildInternal(c: Expression): MadlibPrintVector =
    copy(c)
  override def prettyName: String = "madlib_print_vector"
}

object MadlibPrintVector {
  /** C++ `ostream << double` default formatting: %g at precision 6
    * with trailing zeros stripped — including from the mantissa of
    * scientific form (`1e+07`, not `1.00000e+07`). */
  def ccDouble(d: Double): String = {
    val s = "%.6g".format(d)
    def strip(m: String): String =
      if (m.contains('.'))
        m.reverse.dropWhile(_ == '0').stripPrefix(".").reverse
      else m
    val ei = s.indexWhere(c => c == 'e' || c == 'E')
    if (ei >= 0) strip(s.substring(0, ei)) + s.substring(ei)
    else strip(s)
  }
}

/** The debug hex scheme from `InplaceDoubleEncode`: each double is
  * narrowed to a float and its 4 bytes spread as 8 `'a'+nibble` chars
  * in place of the original 8 bytes. */
case class MadlibEncodeVector(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(arr: Any): Any = {
    val bytes = arr.asInstanceOf[UTF8String].getBytes
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Byte](bytes.length)
    var i = 0
    while (i * 8 + 8 <= bytes.length) {
      val fBits = java.lang.Float.floatToIntBits(bb.getDouble(i * 8).toFloat)
      var k = 0
      while (k < 8) {
        out(i * 8 + k) = ('a' + ((fBits >> (4 * k)) & 0xF)).toByte
        k += 1
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }
  override protected def withNewChildInternal(c: Expression): MadlibEncodeVector =
    copy(c)
  override def prettyName: String = "madlib_encode_vector"
}

case class MadlibDecodeVector(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(arr: Any): Any = {
    val bytes = arr.asInstanceOf[UTF8String].getBytes
    val out = java.nio.ByteBuffer.allocate(bytes.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i + 8 <= bytes.length) {
      var fBits = 0
      var k = 7
      while (k >= 0) {
        fBits = (fBits << 4) | ((bytes(i + k) - 'a') & 0xF)
        k -= 1
      }
      out.putDouble(i, java.lang.Float.intBitsToFloat(fBits).toDouble)
      i += 8
    }
    UTF8String.fromBytes(out.array())
  }
  override protected def withNewChildInternal(c: Expression): MadlibDecodeVector =
    copy(c)
  override def prettyName: String = "madlib_decode_vector"
}
