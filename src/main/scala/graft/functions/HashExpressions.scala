package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Impala-compatible hash functions as native Catalyst expressions
  * (reference: `be/src/exprs/utility-functions-ir.cc` FnvHash/MurmurHash,
  * `be/src/util/hash-util.h` FnvHash64 / MurmurHash2_64).
  *
  * Spark's builtin `hash`/`xxhash64` use different algorithms, so a user
  * porting `fnv_hash`/`murmur_hash` queries needs these for stable-id
  * compat. Both hash the value's *fixed-width little-endian byte image*
  * (the reference hashes raw slot bytes), so `fnv_hash(1)` differs from
  * `fnv_hash(1L)` exactly as in the reference.
  *
  * Codegen emits a static call into [[HashImpls]], keeping the expression
  * inside whole-stage codegen.
  */
object HashImpls {
  final val FnvPrime = 1099511628211L
  final val FnvSeed = -3750763034362895579L // 0xcbf29ce484222325

  /** FNV-1 64-bit (multiply then xor), per the reference's FnvHash64. */
  def fnv(bytes: Array[Byte]): Long = {
    var h = FnvSeed
    var i = 0
    while (i < bytes.length) {
      h = (h * FnvPrime) ^ (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** MurmurHash64A (public domain algorithm), seed 0 per the reference's
    * murmur_hash; [[murmurSeeded]] for other seeds (ndv's HLL uses
    * FNV64_SEED — `anyval-util.h` Hash64).
    */
  def murmur(bytes: Array[Byte]): Long = murmurSeeded(bytes, 0L)

  def murmurSeeded(bytes: Array[Byte], seed: Long): Long = {
    val m = -4132994306676758123L // 0xc6a4a7935bd1e995
    val r = 47
    val len = bytes.length
    var h = seed ^ (len * m)
    val nblocks = len / 8
    var i = 0
    while (i < nblocks) {
      val o = i * 8
      var k = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24) |
        ((bytes(o + 4) & 0xffL) << 32) | ((bytes(o + 5) & 0xffL) << 40) |
        ((bytes(o + 6) & 0xffL) << 48) | ((bytes(o + 7) & 0xffL) << 56)
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 1
    }
    val tail = nblocks * 8
    var left = len & 7
    while (left > 0) {
      left -= 1
      h ^= (bytes(tail + left) & 0xffL) << (8 * left)
      if (left == 0) h *= m
    }
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  private def longBytes(v: Long, w: Int): Array[Byte] = {
    val b = new Array[Byte](w)
    var i = 0
    while (i < w) { b(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    b
  }

  /** Little-endian byte image of an atomic value, by runtime class. */
  def toBytes(v: Any): Array[Byte] = v match {
    case b: Boolean => Array[Byte](if (b) 1 else 0)
    case b: Byte => Array(b)
    case s: Short => longBytes(s.toLong, 2)
    case i: Int => longBytes(i.toLong, 4)
    case l: Long => longBytes(l, 8)
    case f: Float => longBytes(java.lang.Float.floatToIntBits(f).toLong, 4)
    case d: Double => longBytes(java.lang.Double.doubleToLongBits(d), 8)
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
    case d: java.math.BigDecimal => d.unscaledValue().toByteArray
    case d: org.apache.spark.sql.types.Decimal =>
      d.toJavaBigDecimal.unscaledValue().toByteArray
    case other => other.toString.getBytes("UTF-8")
  }

  def fnvAny(v: Any): Long = fnv(toBytes(v))
  def murmurAny(v: Any): Long = murmur(toBytes(v))

  /** The reference hashes TIMESTAMPs as the 12-byte TimestampValue
    * image (`utility-functions-ir.cc:39-44,88-92`): 8-byte
    * nanoseconds-of-day (boost time_duration ticks) followed by the
    * 4-byte boost gregorian day_number (Julian day), little-endian.
    * Catalyst hands us epoch micros (session tz UTC = Impala's
    * timezone-naive wall time).
    */
  def timestampBytes(micros: Long): Array[Byte] = {
    val days = Math.floorDiv(micros, 86400000000L)
    val nanos = Math.floorMod(micros, 86400000000L) * 1000L
    val julian = days + 2440588L
    val b = new Array[Byte](12)
    var i = 0
    while (i < 8) { b(i) = ((nanos >>> (8 * i)) & 0xff).toByte; i += 1 }
    while (i < 12) { b(i) = ((julian >>> (8 * (i - 8))) & 0xff).toByte; i += 1 }
    b
  }

  def fnvTs(micros: Long): Long = fnv(timestampBytes(micros))
  def murmurTs(micros: Long): Long = murmur(timestampBytes(micros))

  /** DECIMAL values hash as their fixed-width little-endian unscaled
    * image — `ColumnType::GetDecimalByteSize(precision)` picks val4 /
    * val8 / val16 (`anyval-util.h:94-102,156-159`), two's-complement
    * sign-extended.
    */
  def decimalBytes(unscaled: java.math.BigInteger, precision: Int): Array[Byte] = {
    val width = if (precision <= 9) 4 else if (precision <= 18) 8 else 16
    val be = unscaled.toByteArray
    val sign: Byte = if (unscaled.signum() < 0) -1 else 0
    val out = new Array[Byte](width)
    var i = 0
    while (i < width) {
      val beIdx = be.length - 1 - i
      out(i) = if (beIdx >= 0) be(beIdx) else sign
      i += 1
    }
    out
  }

  /** Type-directed byte image per `AnyValUtil` (timestamps as the
    * 12-byte TimestampValue, decimals fixed-width by precision, other
    * atomics via [[toBytes]]).
    */
  def valueBytes(v: Any, dt: DataType): Array[Byte] = dt match {
    case TimestampType => timestampBytes(v.asInstanceOf[Long])
    case d: org.apache.spark.sql.types.DecimalType =>
      val unscaled = v match {
        case dec: org.apache.spark.sql.types.Decimal =>
          dec.toJavaBigDecimal.unscaledValue()
        case bd: java.math.BigDecimal => bd.unscaledValue()
        case other => new java.math.BigDecimal(other.toString).unscaledValue()
      }
      decimalBytes(unscaled, d.precision)
    case _ => toBytes(v)
  }

  /** The hash feeding the reference's ndv() HLL registers
    * (`anyval-util.h` Hash64 = MurmurHash2_64 with FNV64_SEED over the
    * value's fixed-width byte image; TimestampVal as the 12-byte
    * TimestampValue).
    */
  def hllHash(v: Any, dt: DataType): Long =
    murmurSeeded(valueBytes(v, dt), FnvSeed)
}

abstract class HashExpr extends UnaryExpression {
  override def dataType: DataType = LongType
  protected def fnName: String
  private def isTs = child.dataType == TimestampType
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => if (isTs) s"graft.functions.HashImpls.${fnName}Ts($c)"
           else s"graft.functions.HashImpls.${fnName}Any($c)")
  protected def hashValue(v: Any, any: Any => Long, ts: Long => Long): Long =
    if (isTs) ts(v.asInstanceOf[Long]) else any(v)
}

/** `fnv_hash(x)` — reference `utility-functions-ir.cc` FnvHash. */
case class FnvHash(child: Expression) extends HashExpr {
  override protected def fnName: String = "fnv"
  override protected def nullSafeEval(v: Any): Any =
    hashValue(v, HashImpls.fnvAny, HashImpls.fnvTs)
  override protected def withNewChildInternal(c: Expression): FnvHash = copy(c)
  override def prettyName: String = "fnv_hash"
}

/** `murmur_hash(x)` — reference `utility-functions-ir.cc` MurmurHash. */
case class MurmurHash64(child: Expression) extends HashExpr {
  override protected def fnName: String = "murmur"
  override protected def nullSafeEval(v: Any): Any =
    hashValue(v, HashImpls.murmurAny, HashImpls.murmurTs)
  override protected def withNewChildInternal(c: Expression): MurmurHash64 = copy(c)
  override def prettyName: String = "murmur_hash"
}
