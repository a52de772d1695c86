package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for graft.operators.TextAnalysis (r18, guide §1.2
  * per-task work / §4.1 built-ins beat interpreted stacks): the
  * token/subword/stopword counts were a stack of java.util.regex
  * evaluations — 5-10 compiled-pattern scans with per-match allocation
  * per row. Each kernel below is one allocation-free JVM pass.
  *
  * Equivalence contracts (asserted in OperatorsSpec against the exact
  * regex formulations they replace):
  *  - `\s` means Java's ASCII class [ \t\n\x0B\f\r];
  *  - iteration is by CODE POINT (Java regex matches classes against
  *    code points, so a surrogate pair is one "char");
  *  - `text_stats.n_tokens` replicates size(split(trim(s), "\s+")):
  *    Spark trim strips 0x20 only, and Java split with limit -1 yields
  *    (number of separator runs) + 1 fields for non-empty input
  *    (leading/trailing runs contribute empty fields), empty → 0 via
  *    the caller's guard, folded in here;
  *  - `marker_hits` replicates size(regexp_extract_all(s,
  *    "\b(w1|...|wn)\b")): a \b boundary exists only at ASCII
  *    word-char ([A-Za-z0-9_]) transitions, so every match covers one
  *    maximal word-char run exactly — the count is the number of runs
  *    string-equal to any of the words.
  */
object TextStatsImpl {

  @inline private def isWs(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  @inline private def isAlpha(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
  @inline private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'
  @inline private def isWord(cp: Int): Boolean =
    isAlpha(cp) || isDigit(cp) || cp == '_'

  /** (n_tokens, n_subwords, n_nonspace, n_punct) in one pass. */
  def compute(s: String): InternalRow = {
    val n = s.length
    // --- n_tokens: over the 0x20-trimmed view [lo, hi)
    var lo = 0
    var hi = n
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    var nTokens = 0
    if (hi > lo) {
      var wsRuns = 0
      var inWs = false
      var i = lo
      while (i < hi) {
        // ws chars are all BMP singles; charAt is safe for this test
        val w = isWs(s.charAt(i))
        if (w && !inWs) wsRuns += 1
        inWs = w
        i += 1
      }
      nTokens = wsRuns + 1
    }
    // --- subword/nonspace/punct: code-point scan of the full string
    var nSub = 0
    var nNonspace = 0
    var nPunct = 0
    var i = 0
    var prevClass = 0 // 0 = other/ws boundary, 1 = alpha run, 2 = digit run
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isWs(cp)) {
        prevClass = 0
      } else {
        nNonspace += 1
        if (isAlpha(cp)) {
          if (prevClass != 1) nSub += 1
          prevClass = 1
        } else if (isDigit(cp)) {
          if (prevClass != 2) nSub += 1
          prevClass = 2
        } else {
          nSub += 1
          nPunct += 1
          prevClass = 0
        }
      }
      i += Character.charCount(cp)
    }
    InternalRow(nTokens, nSub, nNonspace, nPunct)
  }

  /** Count maximal ASCII word-char runs equal to any of `words`. */
  def markerHits(s: String, words: Array[String]): Int = {
    val n = s.length
    var hits = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isWord(cp)) {
        val start = i
        var j = i
        while (j < n && isWord(s.codePointAt(j))) j += Character.charCount(s.codePointAt(j))
        val len = j - start
        var w = 0
        while (w < words.length) {
          val word = words(w)
          if (word.length == len && s.regionMatches(start, word, 0, len)) {
            hits += 1
            w = words.length
          } else w += 1
        }
        i = j
      } else {
        i += Character.charCount(cp)
      }
    }
    hits
  }
}

/** `text_stats(text)` → STRUCT<n_tokens:int, n_subwords:int,
  * n_nonspace:int, n_punct:int>. Multiple uses in one projection
  * collapse to a single evaluation via whole-stage-codegen
  * subexpression elimination (the trees are identical).
  */
case class TextStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", IntegerType, nullable = false),
    StructField("n_nonspace", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false)))
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_stats requires STRING, got ${t.simpleString}")
    }
  override protected def nullSafeEval(v: Any): Any =
    TextStatsImpl.compute(v.toString)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextStatsImpl.compute($c.toString())")
  override protected def withNewChildInternal(c: Expression): TextStats =
    copy(child = c)
  override def prettyName: String = "text_stats"
}

/** `marker_hits(text, 'w1,w2,…')` → INT: maximal ASCII word-char runs
  * of `text` equal to any listed word (the `\b(w1|…)\b` count). The
  * word list must be a foldable literal.
  */
case class MarkerHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  private val wordArr = words.toArray
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"marker_hits requires STRING, got ${t.simpleString}")
    }
  override protected def nullSafeEval(v: Any): Any =
    TextStatsImpl.markerHits(v.toString, wordArr)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerHits", this, classOf[MarkerHits].getName)
    defineCodeGen(ctx, ev, c => s"$ref.hitsFor($c)")
  }
  /** Codegen entry: keeps the word array in one shared object. */
  def hitsFor(s: UTF8String): Int =
    TextStatsImpl.markerHits(s.toString, wordArr)
  override protected def withNewChildInternal(c: Expression): MarkerHits =
    copy(child = c)
  override def prettyName: String = "marker_hits"
}
