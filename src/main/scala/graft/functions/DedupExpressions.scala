package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native signature kernels for the dedup operators
  * (graft.operators.Dedup). Expressed as higher-order column functions
  * these are O(k·|shingles|) *interpreted* expression evaluations per
  * row (~77 ms/doc measured at sf0.1); as native expressions they are a
  * single JVM loop (~µs/doc) — the difference between a dedup pass that
  * scales to 100 TB and one that doesn't.
  *
  * No reference-engine counterpart (the reference has no dedup
  * operators); hash family is the standard (a·x+b) mod p universal
  * family over the Mersenne prime 2^31-1.
  */
object MinHashImpl {
  val P = 2147483647L // 2^31-1

  /** Deterministic coefficients via public splitmix64 mixing. */
  def coeffs(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val as = Array.fill(k)(math.floorMod(next(), P - 1) + 1)
    val bs = Array.fill(k)(math.floorMod(next(), P))
    (as, bs)
  }

  /** sig[i] = min over x of (a_i·x + b_i) mod P; empty input → all P
    * (never collides with a real hash, which is < P).
    */
  def signature(hashes: Array[Long], as: Array[Long], bs: Array[Long]): Array[Long] = {
    val k = as.length
    val sig = Array.fill(k)(P)
    var j = 0
    while (j < hashes.length) {
      val x = hashes(j)
      var i = 0
      while (i < k) {
        val v = (as(i) * x + bs(i)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    sig
  }

  /** 64-bit SimHash of pre-hashed tokens: bit i set iff the count of
    * tokens with bit i set is >= half (majority vote, >= for ties —
    * matching the `v >= 0` convention of the HOF formulation).
    */
  def simhash64(hashes: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      j += 1
    }
    var r = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) >= 0) r |= (1L << i)
      i += 1
    }
    r
  }
}

/** `shingle_hashes(text, n)` → ARRAY<BIGINT>: distinct word-n-gram
  * hashes in [0, P), first-occurrence order. One JVM pass per row
  * (lowercase → whitespace split → sliding window → murmur mod P)
  * replacing a split/transform/slice/concat/hash/distinct HOF pipeline
  * that costs ~1.3 ms/doc interpreted.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.toString, n)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleHashes.compute($c.toString(), $n)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  def compute(text: String, n: Int): ArrayData = {
    val words = text.trim.toLowerCase.split("\\s+")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    def hashOf(s: String): Long =
      math.floorMod(HashImpls.murmur(s.getBytes("UTF-8")), MinHashImpl.P)
    if (words.length < n) {
      seen.add(hashOf(words.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i + n <= words.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        seen.add(hashOf(sb.toString))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** `minhash_signature(hashes, k, seed)` → ARRAY<BIGINT> of length k. */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  private lazy val (as, bs) = MinHashImpl.coeffs(k, seed)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      MinHashImpl.signature(v.asInstanceOf[ArrayData].toLongArray(), as, bs))
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashExpr", this,
      classOf[MinHashSignature].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sigFor($c)")
  }
  /** Codegen entry: keeps the coefficient arrays in one shared object. */
  def sigFor(a: ArrayData): ArrayData =
    new GenericArrayData(MinHashImpl.signature(a.toLongArray(), as, bs))
  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** `lsh_band_buckets(sig, bands, rows)` → ARRAY<BIGINT>: bucket hash of
  * each of `bands` contiguous signature slices, one JVM loop per row —
  * replaces a transform(sequence(...)) HOF evaluating `bands`
  * interpreted xxhash64-over-slice lambdas per row over the whole
  * corpus. Bit-identical to the HOF formulation `xxhash64(slice, b)`:
  * Spark's xxhash64 starts at seed 42 and folds each child in order —
  * the slice's longs element-wise, then the band index `b` as an int.
  */
case class LshBandBuckets(child: Expression, bands: Int, rows: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    bucketsFor(v.asInstanceOf[ArrayData])
  /** Codegen entry. */
  def bucketsFor(a: ArrayData): ArrayData = {
    val sig = a.toLongArray()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 42L
      var i = 0
      while (i < rows) {
        h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(sig(b * rows + i), h)
        i += 1
      }
      out(b) = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(b, h)
      b += 1
    }
    new GenericArrayData(out)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bandExpr", this, classOf[LshBandBuckets].getName)
    defineCodeGen(ctx, ev, c => s"$ref.bucketsFor($c)")
  }
  override protected def withNewChildInternal(c: Expression): LshBandBuckets =
    copy(child = c)
  override def prettyName: String = "lsh_band_buckets"
}

/** `sorted_pairs(ids)` → ARRAY<STRUCT<id1: BIGINT, id2: BIGINT>>: every
  * unordered pair of a posting list, emitted as (min, max), equal values
  * skipped — one JVM nested loop per list. Replaces the inverted-index
  * self-join in [[graft.operators.Dedup.ngramJaccardPairs]]: a groupBy
  * that collects the (df-capped, so bounded) posting list plus this
  * kernel produces identical pairs with one shuffle instead of the
  * self-join's two, and without recomputing the shingle scan per side.
  */
case class SortedPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id1", LongType, nullable = false),
      StructField("id2", LongType, nullable = false))),
    containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    pairsFor(v.asInstanceOf[ArrayData])
  /** Codegen entry. */
  def pairsFor(a: ArrayData): ArrayData = {
    val ids = a.toLongArray()
    val n = ids.length
    // pair count in Long: n*(n-1)/2 silently overflows Int past n=65536
    // (NegativeArraySizeException); posting lists are collect_capped so
    // this cannot fire from the shipped pipelines, but an uncapped
    // caller must fail loudly, not corrupt
    val np = n.toLong * (n - 1) / 2
    require(np <= Int.MaxValue - 8,
      s"sorted_pairs: $n ids expand to $np pairs — cap the posting list")
    val out = new Array[Any](np.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (ids(i) != ids(j)) {
          val lo = math.min(ids(i), ids(j))
          val hi = math.max(ids(i), ids(j))
          out(k) = InternalRow(lo, hi)
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(if (k == out.length) out else out.take(k))
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairsExpr", this, classOf[SortedPairs].getName)
    defineCodeGen(ctx, ev, c => s"$ref.pairsFor($c)")
  }
  override protected def withNewChildInternal(c: Expression): SortedPairs =
    copy(child = c)
  override def prettyName: String = "sorted_pairs"
}

/** `collect_capped(id, cap)` → ARRAY<BIGINT> or NULL: the group's ids in
  * arrival order while the group stays within `cap` elements; NULL as
  * soon as it exceeds `cap`. The aggregation buffer itself is bounded at
  * cap+1 longs — the overflow marker — so a shingle appearing in 10⁷
  * docs costs cap+1 longs of state, not a 10⁷-entry transient list the
  * way `collect_list` + post-filter does. Built for
  * [[graft.operators.Dedup.ngramJaccardPairs]]'s df cap, where an
  * over-cap posting list carries no dedup signal and is dropped anyway.
  */
case class CollectCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // update() widens to Long: misuse over a non-integral column must be
  // a clean analysis error, not an executor ClassCastException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collect_capped requires an integral id column, got ${t.simpleString}")
    }

  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  // length cap+1 is the saturated "exceeded" state; update/merge never
  // grow past it
  override def update(buf: ArrayBuffer[Long], row: InternalRow): ArrayBuffer[Long] = {
    val v = child.eval(row)
    if (v != null && buf.length <= cap) buf += v.asInstanceOf[Number].longValue
    buf
  }

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (i < b.length && a.length <= cap) { a += b(i); i += 1 }
    a
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    if (buf.length > cap) null
    else new GenericArrayData(buf.toArray)

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CollectCapped =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectCapped =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CollectCapped =
    copy(child = c)
  override def prettyName: String = "collect_capped"
}

/** `sorted_pairs2(arr)` → ARRAY<STRUCT<id1,b1,id2,b2>>: every unordered
  * pair of an ARRAY<STRUCT<BIGINT,BIGINT>> posting list where the first
  * field is the id and the second a per-id payload (doc size, simhash
  * …), emitted with the smaller id first and equal-id pairs skipped —
  * the payload-carrying twin of [[SortedPairs]]. Lets the inverted-index
  * pipelines emit (id1, payload1, id2, payload2) from ONE groupBy, so
  * the per-id payload never needs a join back to a second corpus scan
  * (optimization guide §2.4: remove shuffles outright).
  */
case class SortedPairs2(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id1", LongType, nullable = false),
      StructField("b1", LongType, nullable = false),
      StructField("id2", LongType, nullable = false),
      StructField("b2", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(f1, f2)), _)
          if f1.dataType == LongType && f2.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_pairs2 requires ARRAY<STRUCT<BIGINT,BIGINT>>, got ${t.simpleString}")
    }
  override protected def nullSafeEval(v: Any): Any =
    pairsFor(v.asInstanceOf[ArrayData])
  /** Codegen entry. */
  def pairsFor(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val ids = new Array[Long](n)
    val bs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = a.getStruct(i, 2)
      ids(i) = r.getLong(0)
      bs(i) = r.getLong(1)
      i += 1
    }
    // Long-safe sizing, as in SortedPairs.pairsFor
    val np = n.toLong * (n - 1) / 2
    require(np <= Int.MaxValue - 8,
      s"sorted_pairs2: $n ids expand to $np pairs — cap the posting list")
    val out = new Array[Any](np.toInt)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (ids(i) != ids(j)) {
          out(k) =
            if (ids(i) < ids(j)) InternalRow(ids(i), bs(i), ids(j), bs(j))
            else InternalRow(ids(j), bs(j), ids(i), bs(i))
          k += 1
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(if (k == out.length) out else out.take(k))
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pairs2Expr", this, classOf[SortedPairs2].getName)
    defineCodeGen(ctx, ev, c => s"$ref.pairsFor($c)")
  }
  override protected def withNewChildInternal(c: Expression): SortedPairs2 =
    copy(child = c)
  override def prettyName: String = "sorted_pairs2"
}

/** `collect_capped2(id, payload, cap)` → ARRAY<STRUCT<id,b>> or NULL:
  * the payload-carrying twin of [[CollectCapped]] — same bounded buffer
  * (saturates at cap+1 entries, over-cap groups evaluate to NULL), each
  * entry an (id, payload) pair. Feeds [[SortedPairs2]] so the
  * inverted-index pipelines carry doc sizes through the single groupBy
  * instead of joining a second corpus scan back onto the pairs.
  */
case class CollectCapped2(
    left: Expression,
    right: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Long]]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("b", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"collect_capped2 requires two BIGINT columns, got " +
            s"${l.simpleString}, ${r.simpleString}")
    }

  // buffer holds (id, payload) flattened; length 2·(cap+1) is the
  // saturated "exceeded" state, update/merge never grow past it
  override def createAggregationBuffer(): ArrayBuffer[Long] =
    ArrayBuffer.empty[Long]

  override def update(buf: ArrayBuffer[Long], row: InternalRow): ArrayBuffer[Long] = {
    val a = left.eval(row)
    val b = right.eval(row)
    if (a != null && b != null && buf.length <= 2 * cap) {
      buf += a.asInstanceOf[Number].longValue
      buf += b.asInstanceOf[Number].longValue
    }
    buf
  }

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    var i = 0
    while (i < b.length && a.length <= 2 * cap) {
      a += b(i); a += b(i + 1); i += 2
    }
    a
  }

  override def eval(buf: ArrayBuffer[Long]): Any =
    if (buf.length > 2 * cap) null
    else {
      val out = new Array[Any](buf.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = InternalRow(buf(2 * i), buf(2 * i + 1))
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(buf: ArrayBuffer[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.length)
    bb.putInt(buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[Long](n)
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CollectCapped2 =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CollectCapped2 =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CollectCapped2 = copy(left = l, right = r)
  override def prettyName: String = "collect_capped2"
}

/** `simhash_text(text)` → BIGINT: lowercase → whitespace-split → murmur
  * per token → 64-bit SimHash, one pass (replaces an interpreted
  * transform(split(...), w -> xxhash64(w)) per-word lambda).
  */
case class SimHashText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    SimHashText.compute(v.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashText.compute($c.toString())")
  override protected def withNewChildInternal(c: Expression): SimHashText =
    copy(child = c)
  override def prettyName: String = "simhash_text"
}

object SimHashText {
  def compute(text: String): Long = {
    val words = text.trim.toLowerCase.split("\\s+")
    val hashes = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      hashes(i) = HashImpls.murmur(words(i).getBytes("UTF-8"))
      i += 1
    }
    MinHashImpl.simhash64(hashes)
  }
}

/** `simhash64(hashes)` → BIGINT packed SimHash bits. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    MinHashImpl.simhash64(v.asInstanceOf[ArrayData].toLongArray())
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashImpl.simhash64($c.toLongArray())")
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
  override def prettyName: String = "simhash64"
}
