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

/** The reference's OWN sketch algorithms, re-implemented from their
  * public descriptions:
  *
  *  - HyperLogLog with p=10 (1024 registers), the precision the
  *    reference's `ndv()` uses (`be/src/exprs/aggregate-functions-ir.cc`
  *    HllInit/Update/Merge/Finalize; registration
  *    `fe/.../catalog/BuiltinsDb.java:913,1018`). Powers `ndv_hll`.
  *  - ReservoirSample-based `appx_median` and `histogram`
  *    (`BuiltinsDb.java:1001`; ReservoirSample* in
  *    `aggregate-functions.h`).
  *
  * The `ds_hll_*` / `ds_kll_*` family lives in DsSketches.scala on the
  * DataSketches library itself (the reference links the same library's
  * C++ side, so those are wire-compatible).
  *
  * Sketches serialize for the shuffle so they can be stored and
  * re-merged across partitions — the same split aggregate shape Spark
  * uses for its own TypedImperativeAggregates (partial sketch per
  * partition, merge at the final agg: map-side combine keeps the shuffle
  * at O(#groups × sketch size), independent of row count).
  */
object Hll {
  val P = 10
  val M = 1 << P // 1024 registers (DEFAULT_HLL_PRECISION = 10)

  def create(): Array[Byte] = new Array[Byte](M)

  /** Register update per the reference (`aggregate-functions-ir.cc`
    * HllUpdate): index = low P bits of the hash, rank = trailing-zero
    * count of the remaining bits + 1. The hash is
    * [[HashImpls.hllHash]] (murmur64 seeded with FNV64_SEED).
    */
  def update(reg: Array[Byte], hash: Long): Unit = {
    val idx = (hash & (M - 1)).toInt
    val w = hash >>> P
    val rank = (if (w == 0) 64 - P else
      java.lang.Long.numberOfTrailingZeros(w)) + 1
    if (reg(idx) < rank) reg(idx) = rank.toByte
  }

  def merge(a: Array[Byte], b: Array[Byte]): Unit = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
  }

  /** HLL++ k-nearest-neighbor bias correction (k = 6), replicating
    * HllEstimateBias including the C++ map tie semantics (equal
    * distances keep the first-inserted index).
    */
  private def estimateBias(estimate: Long): Long = {
    val dists = scala.collection.mutable.TreeMap.empty[Double, Int]
    var i = 0
    while (i < RawEstimateP10.length) {
      val d = estimate - RawEstimateP10(i)
      val k = d * d
      if (!dists.contains(k)) dists(k) = i
      i += 1
    }
    var bias = 0.0
    dists.valuesIterator.take(6).foreach(j => bias += BiasP10(j))
    (bias / 6).toLong
  }

  /** The reference estimator verbatim (HllFinalEstimate): harmonic
    * mean, HLL++ bias correction below 5m, linear counting below the
    * precision-10 threshold (900).
    */
  def estimate(reg: Array[Byte]): Long = {
    val alpha = 0.7213 / (1.0 + 1.079 / M)
    var harmonic = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      harmonic += java.lang.Math.scalb(1.0, -reg(i))
      if (reg(i) == 0) zeros += 1
      i += 1
    }
    var est = (alpha * M * M / harmonic).toLong
    if (est <= 5L * M) est -= estimateBias(est)
    if (zeros == 0) return est
    val h = (M * math.log(M.toDouble / zeros)).toLong
    if (h <= 900) h else est // HllThreshold(10)
  }

  /** HLL++ empirical tables for precision 10 (Heule/Nunkesser/Hall,
    * "HyperLogLog in Practice", appendix dataset; the reference embeds
    * the same published data in `be/src/exprs/hll-bias.h`).
    */
  private val RawEstimateP10: Array[Double] = Array(
    738.1256, 750.4234, 763.1064, 775.4732, 788.4636, 801.0644, 814.488,
    827.9654, 841.0832, 854.7864, 868.1992, 882.2176, 896.5228, 910.1716,
    924.7752, 938.899, 953.6126, 968.6492, 982.9474, 998.5214, 1013.1064,
    1028.6364, 1044.2468, 1059.4588, 1075.3832, 1091.0584, 1106.8606,
    1123.3868, 1139.5062, 1156.1862, 1172.463, 1189.339, 1206.1936,
    1223.1292, 1240.1854, 1257.2908, 1275.3324, 1292.8518, 1310.5204,
    1328.4854, 1345.9318, 1364.552, 1381.4658, 1400.4256, 1419.849,
    1438.152, 1456.8956, 1474.8792, 1494.118, 1513.62, 1532.5132,
    1551.9322, 1570.7726, 1590.6086, 1610.5332, 1630.5918, 1650.4294,
    1669.7662, 1690.4106, 1710.7338, 1730.9012, 1750.4486, 1770.1556,
    1791.6338, 1812.7312, 1833.6264, 1853.9526, 1874.8742, 1896.8326,
    1918.1966, 1939.5594, 1961.07, 1983.037, 2003.1804, 2026.071,
    2047.4884, 2070.0848, 2091.2944, 2114.333, 2135.9626, 2158.2902,
    2181.0814, 2202.0334, 2224.4832, 2246.39, 2269.7202, 2292.1714,
    2314.2358, 2338.9346, 2360.891, 2384.0264, 2408.3834, 2430.1544,
    2454.8684, 2476.9896, 2501.4368, 2522.8702, 2548.0408, 2570.6738,
    2593.5208, 2617.0158, 2640.2302, 2664.0962, 2687.4986, 2714.2588,
    2735.3914, 2759.6244, 2781.8378, 2808.0072, 2830.6516, 2856.2454,
    2877.2136, 2903.4546, 2926.785, 2951.2294, 2976.468, 3000.867,
    3023.6508, 3049.91, 3073.5984, 3098.162, 3121.5564, 3146.2328,
    3170.9484, 3195.5902, 3221.3346, 3242.7032, 3271.6112, 3296.5546,
    3317.7376, 3345.072, 3369.9518, 3394.326, 3418.1818, 3444.6926,
    3469.086, 3494.2754, 3517.8698, 3544.248, 3565.3768, 3588.7234,
    3616.979, 3643.7504, 3668.6812, 3695.72, 3719.7392, 3742.6224,
    3770.4456, 3795.6602, 3819.9058, 3844.002, 3869.517, 3895.6824,
    3920.8622, 3947.1364, 3973.985, 3995.4772, 4021.62, 4046.628, 4074.65,
    4096.2256, 4121.831, 4146.6406, 4173.276, 4195.0744, 4223.9696,
    4251.3708, 4272.9966, 4300.8046, 4326.302, 4353.1248, 4374.312,
    4403.0322, 4426.819, 4450.0598, 4478.5206, 4504.8116, 4528.8928,
    4553.9584, 4578.8712, 4603.8384, 4632.3872, 4655.5128, 4675.821,
    4704.6222, 4731.9862, 4755.4174, 4781.2628, 4804.332, 4832.3048,
    4862.8752, 4883.4148, 4906.9544, 4935.3516, 4954.3532, 4984.0248,
    5011.217, 5035.3258, 5057.3672, 5084.1828
  )
  private val BiasP10: Array[Double] = Array(
    737.1256, 724.4234, 711.1064, 698.4732, 685.4636, 673.0644, 660.488,
    647.9654, 636.0832, 623.7864, 612.1992, 600.2176, 588.5228, 577.1716,
    565.7752, 554.899, 543.6126, 532.6492, 521.9474, 511.5214, 501.1064,
    490.6364, 480.2468, 470.4588, 460.3832, 451.0584, 440.8606, 431.3868,
    422.5062, 413.1862, 404.463, 395.339, 386.1936, 378.1292, 369.1854,
    361.2908, 353.3324, 344.8518, 337.5204, 329.4854, 321.9318, 314.552,
    306.4658, 299.4256, 292.849, 286.152, 278.8956, 271.8792, 265.118,
    258.62, 252.5132, 245.9322, 239.7726, 233.6086, 227.5332, 222.5918,
    216.4294, 210.7662, 205.4106, 199.7338, 194.9012, 188.4486, 183.1556,
    178.6338, 173.7312, 169.6264, 163.9526, 159.8742, 155.8326, 151.1966,
    147.5594, 143.07, 140.037, 134.1804, 131.071, 127.4884, 124.0848,
    120.2944, 117.333, 112.9626, 110.2902, 107.0814, 103.0334,
    99.4832000000001, 96.3899999999999, 93.7202000000002, 90.1714000000002,
    87.2357999999999, 85.9346, 82.8910000000001, 80.0264000000002,
    78.3834000000002, 75.1543999999999, 73.8683999999998, 70.9895999999999,
    69.4367999999999, 64.8701999999998, 65.0408000000002, 61.6738,
    59.5207999999998, 57.0158000000001, 54.2302, 53.0962, 50.4985999999999,
    52.2588000000001, 47.3914, 45.6244000000002, 42.8377999999998, 43.0072,
    40.6516000000001, 40.2453999999998, 35.2136, 36.4546, 33.7849999999999,
    33.2294000000002, 32.4679999999998, 30.8670000000002, 28.6507999999999,
    28.9099999999999, 27.5983999999999, 26.1619999999998, 24.5563999999999,
    23.2328000000002, 21.9484000000002, 21.5902000000001, 21.3346000000001,
    17.7031999999999, 20.6111999999998, 19.5545999999999, 15.7375999999999,
    17.0720000000001, 16.9517999999998, 15.326, 13.1817999999998,
    14.6925999999999, 13.0859999999998, 13.2754, 10.8697999999999, 11.248,
    7.3768, 4.72339999999986, 7.97899999999981, 8.7503999999999,
    7.68119999999999, 9.7199999999998, 7.73919999999998, 5.6224000000002,
    7.44560000000001, 6.6601999999998, 5.9058, 4.00199999999995,
    4.51699999999983, 4.68240000000014, 3.86220000000003, 5.13639999999987,
    5.98500000000013, 2.47719999999981, 2.61999999999989, 1.62800000000016,
    4.65000000000009, 0.225599999999758, 0.831000000000131,
    -0.359400000000278, 1.27599999999984, -2.92559999999958,
    -0.0303999999996449, 2.37079999999969, -2.0033999999996,
    0.804600000000391, 0.30199999999968, 1.1247999999996, -2.6880000000001,
    0.0321999999996478, -1.18099999999959, -3.9402, -1.47940000000017,
    -0.188400000000001, -2.10720000000038, -2.04159999999956,
    -3.12880000000041, -4.16160000000036, -0.612799999999879,
    -3.48719999999958, -8.17900000000009, -5.37780000000021,
    -4.01379999999972, -5.58259999999973, -5.73719999999958,
    -7.66799999999967, -5.69520000000011, -1.1247999999996,
    -5.58520000000044, -8.04560000000038, -4.64840000000004,
    -11.6468000000004, -7.97519999999986, -5.78300000000036,
    -7.67420000000038, -10.6328000000003, -9.81720000000041
  )
}

/** Flajolet-Martin probabilistic counting, replicating the reference's
  * `distinctpc`/`distinctpcsa` bit-for-bit
  * (`be/src/exprs/aggregate-functions-ir.cc:834-1004` PcUpdate/
  * PcsaUpdate/PcMerge/DistinctEstimateFinalize; registration
  * `BuiltinsDb.java:1106-1117`): 64 bitmaps × 32 bits. PC hashes each
  * value 64 times (seed = bitmap index); PCSA hashes once and uses
  * stochastic averaging (row = h mod 64, bit from h/64). The hash is
  * the reference's `HashUtil::Hash` = hardware CRC32 accumulate
  * (SSE4.2 crc32 = CRC-32C Castagnoli, reflected, NO init/final
  * inversion) followed by a halves swap — re-derived here from the
  * public CRC-32C polynomial, verified against the reference's
  * distinct-estimate.test goldens.
  */
object Pc {
  val NumBitmaps = 64
  val BitmapLen = 32
  private val Theta: Double = 0.77351f.toDouble // PC_THETA (float!)
  private val K: Double = -1.75d // PC_K (-1.75f is exact in binary)

  // byte-wise reflected CRC-32C table, polynomial 0x1EDC6F41
  private val table: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82f63b78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  /** `HashUtil::CrcHash`: raw CRC-32C accumulation over the bytes
    * (the 4-byte-word + tail-byte split is byte-order-equivalent for a
    * reflected CRC), then swap the 16-bit halves.
    */
  def crcHash(bytes: Array[Byte], seed: Int): Int = {
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h = table((h ^ bytes(i)) & 0xff) ^ (h >>> 8)
      i += 1
    }
    (h << 16) | (h >>> 16)
  }

  // BitUtil::CountTrailingZeros(x, 31): ctz, or 31 when x == 0
  private def ctz(x: Int): Int =
    if (x == 0) BitmapLen - 1 else Integer.numberOfTrailingZeros(x)

  def create(): Array[Int] = new Array[Int](NumBitmaps)

  def updatePc(bm: Array[Int], hash: Int => Int): Unit = {
    var i = 0
    while (i < NumBitmaps) {
      val h = hash(i)
      bm(i) |= 1 << ctz(h)
      i += 1
    }
  }

  def updatePcsa(bm: Array[Int], hash: Int => Int): Unit = {
    val h = hash(0)
    val u = h.toLong & 0xffffffffL
    val row = (u % NumBitmaps).toInt
    bm(row) |= 1 << ctz((u / NumBitmaps).toInt)
  }

  def merge(a: Array[Int], b: Array[Int]): Unit = {
    var i = 0
    while (i < NumBitmaps) { a(i) |= b(i); i += 1 }
  }

  /** Average leading-ones count → (2^avg − 2^(K·avg)) / θ. */
  def estimate(bm: Array[Int]): Double = {
    if (bm.forall(_ == 0)) return 0d
    var sum = 0
    var i = 0
    while (i < NumBitmaps) {
      var c = 0
      while (c < BitmapLen && (bm(i) & (1 << c)) != 0) c += 1
      sum += c
      i += 1
    }
    val avg = sum.toDouble / NumBitmaps
    (math.pow(2d, avg) - math.pow(2d, avg * K)) / Theta
  }
}

/** `distinctpc(x)` / `distinctpcsa(x)` → BIGINT (truncated estimate;
  * PCSA scales by the bitmap count per stochastic averaging).
  */
case class PcEstimate(
    child: Expression,
    pcsa: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Array[Int] = Pc.create()

  /** Seeded hash of one value — `AnyValUtil::Hash` (`anyval-util.h:51-92`):
    * one CrcHash over the value bytes, EXCEPT TIMESTAMP, whose
    * `TimestampValue::Hash` (`timestamp-value.h:315-318`) chains TWO
    * CrcHash calls (8-byte time-of-day nanos, then 4-byte Julian day
    * seeded with the first result) — each with its own halves swap, so
    * a single pass over the 12-byte image diverges.
    */
  private def hashValue(v: Any, seed: Int): Int =
    if (child.dataType == TimestampType) {
      val b = HashImpls.timestampBytes(v.asInstanceOf[Long])
      Pc.crcHash(java.util.Arrays.copyOfRange(b, 8, 12),
        Pc.crcHash(java.util.Arrays.copyOf(b, 8), seed))
    } else Pc.crcHash(HashImpls.valueBytes(v, child.dataType), seed)

  override def update(b: Array[Int], row: InternalRow): Array[Int] = {
    val v = child.eval(row)
    if (v != null) {
      val hash = (seed: Int) => hashValue(v, seed)
      if (pcsa) Pc.updatePcsa(b, hash) else Pc.updatePc(b, hash)
    }
    b
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    Pc.merge(a, b); a
  }

  override def eval(b: Array[Int]): Any = {
    val est = Pc.estimate(b)
    (if (pcsa) est * Pc.NumBitmaps else est).toLong
  }

  override def serialize(b: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * b.length)
    b.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): PcEstimate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PcEstimate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): PcEstimate =
    copy(child = c)
  override def prettyName: String =
    if (pcsa) "distinctpcsa" else "distinctpc"
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
    if (v != null)
      Hll.update(b, HashImpls.hllHash(v, child.dataType))
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

// ds_hll_* / ds_kll_* live in DsSketches.scala on the DataSketches
// library itself — wire-compatible with the reference and Hive.

// ---------------------------------------------------------------------------


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

/** `sample(x)` → STRING — the reference's reservoir sample printer
  * (`aggregate-functions-ir.cc` ReservoirSampleFinalize): every
  * retained sample in buffer order, ", "-separated, formatted per
  * input type via PrintSample. Exact below the 20 000-sample
  * reservoir, deterministic-prefix sample above (same note as
  * [[HistogramAgg]]).
  */
case class SampleAgg(
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
    UTF8String.fromString(
      b.map(printSample(_, child.dataType)).mkString(", "))
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

  override def withNewMutableAggBufferOffset(o: Int): SampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): SampleAgg =
    copy(child = c)
  override def prettyName: String = "sample"
}

/** `appx_median(x)` — the reference's ReservoirSample median
  * (`aggregate-functions-ir.cc` AppxMedianFinalize → GetMedian:
  * element n/2 of the sorted samples), type-preserving — a DATE median
  * is a DATE; strings truncate to the 10-byte sample cap. Exact below
  * the 20 000-sample reservoir, deterministic-prefix sample above
  * (same note as [[HistogramAgg]]).
  */
case class AppxMedianAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Any]]
    with UnaryLike[Expression] {

  import HistogramAgg._

  override def dataType: DataType = child.dataType
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
    denormalize(sorted(b.length / 2), child.dataType)
  }

  private def denormalize(v: Any, t: DataType): Any = (v, t) match {
    case (l: Long, ByteType) => l.toByte
    case (l: Long, ShortType) => l.toShort
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, DateType) => l.toInt
    case (bytes: Array[Byte], _) => UTF8String.fromBytes(bytes)
    case (d: java.math.BigDecimal, dt: DecimalType) =>
      Decimal(d, dt.precision, dt.scale)
    case (other, _) => other
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

  override def withNewMutableAggBufferOffset(o: Int): AppxMedianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AppxMedianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): AppxMedianAgg =
    copy(child = c)
  override def prettyName: String = "appx_median"
}

object HistogramAgg {
  /** NUM_BUCKETS / NUM_BUCKETS·NUM_SAMPLES_PER_BUCKET
    * (aggregate-functions-ir.cc:1008-1009).
    */
  val NumBuckets = 100
  val MaxSamples = 20000
  private val MaxStringLen = 10 // MAX_STRING_SAMPLE_LEN

  /** Catalyst value → serializable buffer entry. */
  private[functions] def normalize(v: Any, t: DataType): Any = (v, t) match {
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

  private[functions] def less(x: Any, y: Any, t: DataType): Boolean = (x, y) match {
    case (a: Long, b: Long) => a < b
    case (a: Float, b: Float) => a < b
    case (a: Double, b: Double) => a < b
    case (a: Boolean, b: Boolean) => !a && b
    case (a: Array[Byte], b: Array[Byte]) => cmpBytes(a, b) < 0
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) => a.compareTo(b) < 0
    case _ => false
  }

  private[functions] def printSample(v: Any, t: DataType): String = (v, t) match {
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

