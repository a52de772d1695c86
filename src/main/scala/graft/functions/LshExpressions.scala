package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH kernel for the similarity operators
  * (graft.operators.Similarity). The higher-order-function formulation
  * (aggregate ∘ zip_with ∘ transform with per-element lambdas) costs
  * O(tables·m) interpreted expression evaluations per row and falls out
  * of whole-stage codegen; this kernel is one JVM loop per row over a
  * plane matrix held once in the expression — the same HOF→native move
  * that took the MinHash pass from 387 s to 1.9 s at sf0.1
  * (DedupExpressions.scala).
  *
  * No reference-engine counterpart (the reference has no vector search);
  * the scheme is standard sign-random-projection (Charikar '02).
  */
object LshImpl {

  /** Deterministic pseudo-random hyperplanes (splitmix64 → [-1, 1)).
    * Bit-compatible with the round-2 HOF formulation so signatures (and
    * the measured recall-1.0 parameter points) carry over unchanged.
    */
  def hyperplanes(m: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    Array.fill(m, dim)((next() >>> 11) * (2.0 / (1L << 53)) - 1.0)
  }

  /** Flattened plane matrix for L tables: row l*m+i is plane i of table
    * l, table l seeded `seed + 1000·l` (the round-2 convention).
    */
  def tablePlanes(m: Int, dim: Int, tables: Int, seed: Long): Array[Array[Double]] =
    (0 until tables).flatMap(l => hyperplanes(m, dim, seed + 1000L * l)).toArray

  /** One m-bit signature per table: bit i = (plane_{l,i} · v >= 0),
    * packed little-endian into an int (m ≤ 30).
    */
  def signatures(v: Array[Double], planes: Array[Array[Double]],
      m: Int, tables: Int): Array[Int] = {
    val out = new Array[Int](tables)
    var l = 0
    while (l < tables) {
      var sig = 0
      var i = 0
      while (i < m) {
        if (VectorImpl.dot(planes(l * m + i), v) >= 0) sig |= (1 << i)
        i += 1
      }
      out(l) = sig
      l += 1
    }
    out
  }
}

/** `lsh_signatures(vec, m, dim, tables, seed)` → ARRAY<INT> of `tables`
  * packed m-bit sign-projection signatures. m/dim/tables/seed must be
  * foldable; vec is ARRAY<FLOAT> or ARRAY<DOUBLE>.
  */
case class LshSignatures(child: Expression, m: Int, dim: Int, tables: Int,
    seed: Long) extends UnaryExpression {
  require(m <= 30, "signature must pack into a positive int")

  @transient private lazy val planes: Array[Array[Double]] =
    LshImpl.tablePlanes(m, dim, tables, seed)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any = sigFor(v.asInstanceOf[ArrayData])

  /** Codegen entry: keeps the plane matrix in one shared object. */
  def sigFor(a: ArrayData): ArrayData = {
    val v = child.dataType match {
      case ArrayType(FloatType, _) => VectorImpl.arrF(a)
      case _ => VectorImpl.arrD(a)
    }
    new GenericArrayData(LshImpl.signatures(v, planes, m, tables))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshExpr", this, classOf[LshSignatures].getName)
    defineCodeGen(ctx, ev, c => s"$ref.sigFor($c)")
  }

  override protected def withNewChildInternal(c: Expression): LshSignatures =
    copy(child = c)
  override def prettyName: String = "lsh_signatures"
}
