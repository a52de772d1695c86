package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Impala string-similarity builtins missing from Spark (Spark has only
  * `levenshtein`): `damerau_levenshtein`, `jaro_distance`,
  * `jaro_similarity`, `jaro_winkler_distance`, `jaro_winkler_similarity`
  * (reference: `be/src/exprs/string-functions-ir.cc`).
  *
  * `damerau_levenshtein` is the optimal-string-alignment (restricted)
  * variant, the one commonly shipped by SQL engines. Jaro-Winkler uses
  * the standard scaling factor 0.1 over a max 4-char common prefix.
  */
object StringDistanceImpls {

  def damerauLevenshtein(a: UTF8String, b: UTF8String): Int = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0) return m
    if (m == 0) return n
    // three-row OSA dynamic program
    var prev2 = new Array[Int](m + 1)
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var j = 1
      while (j <= m) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        var d = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (i > 1 && j > 1 && s.charAt(i - 1) == t.charAt(j - 2) &&
          s.charAt(i - 2) == t.charAt(j - 1)) {
          d = math.min(d, prev2(j - 2) + 1)
        }
        cur(j) = d
        j += 1
      }
      val tmp = prev2; prev2 = prev; prev = cur; cur = tmp
      i += 1
    }
    prev(m)
  }

  def jaroSimilarity(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString
    val t = b.toString
    val n = s.length
    val m = t.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(math.max(n, m) / 2 - 1, 0)
    val sMatch = new Array[Boolean](n)
    val tMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!tMatch(j) && s.charAt(i) == t.charAt(j)) {
          sMatch(i) = true; tMatch(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var transpositions = 0
    var k = 0
    i = 0
    while (i < n) {
      if (sMatch(i)) {
        while (!tMatch(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) transpositions += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    (mm / n + mm / m + (mm - transpositions / 2.0) / mm) / 3.0
  }

  def jaroDistance(a: UTF8String, b: UTF8String): Double =
    1.0 - jaroSimilarity(a, b)

  /** Winkler prefix bonus applies only above the 0.7 boost threshold,
    * matching the reference's default (`string-functions-ir.cc`
    * JaroWinklerDistance boost_threshold).
    */
  def jaroWinklerSimilarity(a: UTF8String, b: UTF8String): Double = {
    val jaro = jaroSimilarity(a, b)
    if (jaro <= 0.7) return jaro
    val s = a.toString
    val t = b.toString
    val maxPrefix = math.min(math.min(s.length, t.length), 4)
    var prefix = 0
    while (prefix < maxPrefix && s.charAt(prefix) == t.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  def jaroWinklerDistance(a: UTF8String, b: UTF8String): Double =
    1.0 - jaroWinklerSimilarity(a, b)
}

sealed abstract class StringDistanceExpr extends BinaryExpression
    {
  protected def fnName: String
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.StringDistanceImpls.$fnName($a, $b)")
}

/** `damerau_levenshtein(s, t)` → INT (OSA edit distance). */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = IntegerType
  override protected def fnName: String = "damerauLevenshtein"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceImpls.damerauLevenshtein(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "damerau_levenshtein"
}

/** `jaro_similarity(s, t)` → DOUBLE in [0,1]. */
case class JaroSimilarity(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  override protected def fnName: String = "jaroSimilarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceImpls.jaroSimilarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "jaro_similarity"
}

/** `jaro_distance(s, t)` = 1 - jaro_similarity. */
case class JaroDistance(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  override protected def fnName: String = "jaroDistance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceImpls.jaroDistance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "jaro_distance"
}

/** `jaro_winkler_similarity(s, t)` → DOUBLE in [0,1]. */
case class JaroWinklerSimilarity(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  override protected def fnName: String = "jaroWinklerSimilarity"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceImpls.jaroWinklerSimilarity(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "jaro_winkler_similarity"
}

/** `jaro_winkler_distance(s, t)` = 1 - jaro_winkler_similarity. */
case class JaroWinklerDistance(left: Expression, right: Expression)
    extends StringDistanceExpr {
  override def dataType: DataType = DoubleType
  override protected def fnName: String = "jaroWinklerDistance"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistanceImpls.jaroWinklerDistance(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "jaro_winkler_distance"
}
