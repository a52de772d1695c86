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
  * 1277-1288`. Output order is unspecified in the reference (input
  * order); deterministic tests/oracles must sort upstream or
  * sort-normalize.
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
  extends TypedImperativeAggregate[ArrayBuffer[UTF8String]]
  with BinaryLike[Expression] {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  // the reference requires a constant separator (BuiltinsDb.java
  // group_concat signatures); a non-foldable one would silently
  // evaluate against no input row below
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!right.foldable)
      TypeCheckFailure("group_concat separator must be a constant")
    else if (right.dataType != StringType &&
        right.dataType != org.apache.spark.sql.types.NullType)
      TypeCheckFailure(
        s"group_concat separator must be STRING, got ${right.dataType.sql}")
    else TypeCheckSuccess
  }

  private lazy val sep: UTF8String = right.eval() match {
    case null => UTF8String.fromString(", ")
    case s: UTF8String => s
    case other => UTF8String.fromString(other.toString)
  }

  override def createAggregationBuffer(): ArrayBuffer[UTF8String] =
    ArrayBuffer.empty[UTF8String]

  override def update(buf: ArrayBuffer[UTF8String], row: InternalRow): ArrayBuffer[UTF8String] = {
    val v = left.eval(row)
    if (v != null) buf += v.asInstanceOf[UTF8String].clone()
    buf
  }

  override def merge(a: ArrayBuffer[UTF8String], b: ArrayBuffer[UTF8String]): ArrayBuffer[UTF8String] =
    a ++= b

  override def eval(buf: ArrayBuffer[UTF8String]): Any =
    if (buf.isEmpty) null
    else UTF8String.concatWs(sep, buf.toSeq: _*)

  override def serialize(buf: ArrayBuffer[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { s =>
      val bytes = s.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UTF8String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      buf += UTF8String.fromBytes(b)
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
