package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `group_concat(x[, sep])` → STRING: concatenation of the group's
  * non-null values in arrival order, NULL for an empty group —
  * reference semantics per `be/src/exprs/aggregate-functions-ir.cc`
  * (StringConcat*), registration `fe/.../catalog/BuiltinsDb.java:
  * 1277-1288`. The separator is evaluated PER ROW (the reference's
  * aggregation.test goldens use column-valued separators like
  * `group_concat(v, cast(10 - id as string))`): each appended value is
  * preceded by its own row's separator, with the first row's separator
  * stripped — exactly the C++ intermediate whose header records the
  * first separator's length. A NULL separator falls back to ", ".
  * Output order is unspecified in the reference (input order);
  * deterministic tests/oracles must sort upstream or sort-normalize.
  *
  * A true AggregateFunction (not the round-1 `concat_ws(collect_list)`
  * alias) so `group_concat(DISTINCT x)` resolves: the analyzer attaches
  * the distinct flag to an AggregateExpression and Catalyst's
  * RewriteDistinctAggregates handles the two-phase expansion — the
  * FunctionRegistry builder API never sees the DISTINCT keyword, so an
  * alias composition can't.
  */
case class GroupConcat(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(UTF8String, UTF8String)]]
  with BinaryLike[Expression] {

  type Buf = ArrayBuffer[(UTF8String, UTF8String)]

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (right.dataType != StringType &&
        right.dataType != org.apache.spark.sql.types.NullType)
      TypeCheckFailure(
        s"group_concat separator must be STRING, got ${right.dataType.sql}")
    else TypeCheckSuccess
  }

  private val defaultSep = UTF8String.fromString(", ")

  override def createAggregationBuffer(): Buf =
    ArrayBuffer.empty[(UTF8String, UTF8String)]

  override def update(buf: Buf, row: InternalRow): Buf = {
    val v = left.eval(row)
    if (v != null) {
      val s = right.eval(row) match {
        case null => defaultSep
        case u: UTF8String => u.clone()
        case other => UTF8String.fromString(other.toString)
      }
      buf += ((v.asInstanceOf[UTF8String].clone(), s))
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = a ++= b

  override def eval(buf: Buf): Any = {
    if (buf.isEmpty) return null
    val parts = new ArrayBuffer[UTF8String](buf.length * 2 - 1)
    var i = 0
    while (i < buf.length) {
      if (i > 0) parts += buf(i)._2
      parts += buf(i)._1
      i += 1
    }
    UTF8String.concat(parts.toSeq: _*)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { case (v, s) =>
      val vb = v.getBytes
      out.writeInt(vb.length)
      out.write(vb)
      val sb = s.getBytes
      out.writeInt(sb.length)
      out.write(sb)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[(UTF8String, UTF8String)](n)
    var i = 0
    while (i < n) {
      val vb = new Array[Byte](in.readInt())
      in.readFully(vb)
      val sb = new Array[Byte](in.readInt())
      in.readFully(sb)
      buf += ((UTF8String.fromBytes(vb), UTF8String.fromBytes(sb)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupConcat =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupConcat =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): GroupConcat =
    copy(left = l, right = r)
  override def prettyName: String = "group_concat"
}
