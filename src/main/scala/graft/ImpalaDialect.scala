package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast, SortOrder}

/** Impala SQL dialect shim (SURVEY.md §7.1 item 3) — runs Impala SQL
  * text on Spark where the two dialects differ:
  *
  *  1. Default NULL ordering: Impala sorts ASC→NULLS LAST,
  *     DESC→NULLS FIRST (`fe/.../analysis/OrderByElement.java:115-116`)
  *     — exactly opposite to Spark. The parsed plan cannot distinguish
  *     "unspecified" from an explicit `NULLS FIRST`, so dialect mode
  *     applies Impala's default to every sort key; queries needing
  *     Spark's ordering spell it explicitly through the normal API.
  *  2. `CAST(x AS T FORMAT 'fmt')` (`be/src/exprs/cast-format-expr.h`,
  *     ISO-SQL tokens per `be/src/runtime/datetime-iso-sql-format-
  *     parser.cc`) → `to_timestamp/date_format` with the pattern
  *     translated to Spark's (Java) tokens.
  *
  * Everything else in Impala's SQL grammar that Spark already parses
  * (DIV, %, !=, <=>, ILIKE, RLIKE, ordinals in ORDER BY/GROUP BY, CTEs,
  * VALUES, lateral views) passes through untouched; name-level function
  * differences are handled by the registry layer
  * ([[graft.functions.GraftFunctions]]).
  */
object ImpalaDialect {

  /** ISO-SQL datetime format tokens → Spark/Java pattern letters,
    * longest-first so e.g. `MI` wins over `M`.
    */
  private val formatTokens: Seq[(String, String)] = Seq(
    "YYYY" -> "yyyy", "YYY" -> "yyy", "YY" -> "yy",
    "DDD" -> "DDD", "DD" -> "dd",
    "HH24" -> "HH", "HH12" -> "hh", "HH" -> "hh",
    "MI" -> "mm",
    "SSSSS" -> "", // second-of-day: unsupported, dropped
    "SS" -> "ss",
    "MONTH" -> "MMMM", "MON" -> "MMM", "MM" -> "MM",
    "DAY" -> "EEEE", "DY" -> "EEE",
    "TZH" -> "xx", "TZM" -> "",
    "FF9" -> "SSSSSSSSS", "FF6" -> "SSSSSS", "FF3" -> "SSS", "FF" -> "SSSSSS",
    "AM" -> "a", "PM" -> "a",
  )

  /** Translate an ISO-SQL format string to a Spark datetime pattern. */
  def translateFormat(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    val upper = fmt.toUpperCase
    while (i < fmt.length) {
      formatTokens.find { case (tok, _) => upper.startsWith(tok, i) } match {
        case Some((tok, repl)) => sb.append(repl); i += tok.length
        case None => sb.append(fmt.charAt(i)); i += 1
      }
    }
    sb.toString
  }

  /** `<expr> AS <type> FORMAT '<fmt>'` tail of a CAST body; the format
    * literal may be single- or double-quoted, the target may carry a
    * length (CHAR(19), VARCHAR(38)).
    */
  private val castBodyRe =
    ("""(?is)^(.*\S)\s+AS\s+(TIMESTAMP|DATE|STRING|CHAR\s*\(\s*\d+\s*\)""" +
      """|VARCHAR(?:\s*\(\s*\d+\s*\))?)\s+FORMAT\s+(?:'([^']*)'|"([^"]*)")\s*$""").r

  private def isWordChar(c: Char) = Character.isLetterOrDigit(c) || c == '_'

  /** Index of the ')' matching the '(' at `open`, honoring quoted
    * strings; -1 when unbalanced.
    */
  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Rewrite every FORMAT-clause CAST (Spark has no such grammar); the
    * target type picks the direction (parse vs print). A balanced-paren
    * scan, innermost-first, so nested `CAST(CAST(x AS STRING FORMAT …)
    * AS TIMESTAMP FORMAT …)` round-trips correctly.
    */
  def rewriteCastFormat(sql: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < sql.length) {
      if (sql.regionMatches(true, i, "CAST", 0, 4) &&
          (i == 0 || !isWordChar(sql.charAt(i - 1)))) {
        var j = i + 4
        while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
        val close = if (j < sql.length && sql.charAt(j) == '(')
          matchingParen(sql, j) else -1
        if (close > 0) {
          val inner = rewriteCastFormat(sql.substring(j + 1, close))
          castBodyRe.findFirstMatchIn(inner) match {
            case Some(m) =>
              val expr = m.group(1)
              val target = m.group(2).toUpperCase.takeWhile(Character.isLetter)
              val fmt = translateFormat(
                Option(m.group(3)).getOrElse(m.group(4))).replace("'", "''")
              out.append(target match {
                case "TIMESTAMP" => s"to_timestamp($expr, '$fmt')"
                case "DATE" => s"to_date($expr, '$fmt')"
                case _ => s"date_format($expr, '$fmt')"
              })
            case None =>
              out.append(sql.substring(i, j + 1)).append(inner).append(')')
          }
          i = close + 1
        } else { out.append(sql.charAt(i)); i += 1 }
      } else { out.append(sql.charAt(i)); i += 1 }
    }
    out.toString
  }

  /** Impala join-level plan hints (`fe/.../analysis/PlanHint.java`):
    * the bracket form `JOIN [BROADCAST] t` and the comment form
    * (slash-star +SHUFFLE star-slash after JOIN), neither of which is
    * Spark grammar (Spark hints are SELECT-level plus-hints). Each join
    * hint is lifted to the statement head on the hinted relation (alias
    * when present): BROADCAST → BROADCAST(t), SHUFFLE → SHUFFLE_HASH(t)
    * (Impala SHUFFLE means "partitioned join", DistributedPlanner.java:
    * 479-575); NOSHUFFLE is dropped (AQE owns that decision).
    * `SELECT STRAIGHT_JOIN` (SingleNodePlanner.java FROM-order fallback)
    * is stripped — FROM order is already what Spark keeps when its CBO
    * join reorder doesn't fire.
    */
  private val joinHintRe =
    ("""(?i)JOIN\s*(?:\[\s*(BROADCAST|SHUFFLE|NOSHUFFLE)\s*\]|""" +
      """/\*\s*\+\s*(BROADCAST|SHUFFLE|NOSHUFFLE)\s*\*/)\s*""" +
      """([A-Za-z_][\w.]*)(\s+(?:AS\s+)?([A-Za-z_]\w*))?""").r

  private val sqlKeywords = Set("ON", "USING", "WHERE", "GROUP", "ORDER",
    "HAVING", "LIMIT", "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "CROSS",
    "UNION", "INTERSECT", "EXCEPT", "AS")

  private val straightJoinRe = """(?i)\bSELECT\s+STRAIGHT_JOIN\b""".r

  def rewriteHints(sql: String): String = {
    val hints = scala.collection.mutable.ArrayBuffer.empty[String]
    val stripped = joinHintRe.replaceAllIn(sql, m => {
      val hint = Option(m.group(1)).getOrElse(m.group(2)).toUpperCase
      val table = m.group(3)
      val alias = Option(m.group(5))
        .filterNot(a => sqlKeywords.contains(a.toUpperCase))
      val target = alias.getOrElse(table.split('.').last)
      hint match {
        case "BROADCAST" => hints += s"BROADCAST($target)"
        case "SHUFFLE" => hints += s"SHUFFLE_HASH($target)"
        case _ => // NOSHUFFLE: advisory no-op under AQE
      }
      java.util.regex.Matcher.quoteReplacement(
        s"JOIN $table${m.group(4) match { case null => ""; case s => s }}")
    })
    // fallback: hints in positions the lift cannot target (before a
    // derived table or quoted name) are still removed so the statement
    // parses — hint lost, semantics kept (hints are advisory)
    val bareStripped = bareHintRe.replaceAllIn(stripped, "")
    val noStraight = straightJoinRe.replaceAllIn(bareStripped, "SELECT")
    if (hints.isEmpty) noStraight
    else {
      val at = outerSelectOffset(noStraight)
      if (at < 0) noStraight
      else noStraight.patch(at + "SELECT".length,
        s" /*+ ${hints.mkString(", ")} */", 0)
    }
  }

  /** Leftover Impala-form hints with no Spark meaning: `[BROADCAST]`
    * brackets anywhere (Impala SQL has no other bracket syntax) and the
    * paren-less comment forms — Spark's own `BROADCAST(t)` hints have
    * parens and are untouched.
    */
  private val bareHintRe =
    ("""(?i)(?:\[\s*(?:BROADCAST|SHUFFLE|NOSHUFFLE)\s*\]""" +
      """|/\*\s*\+\s*(?:BROADCAST|SHUFFLE|NOSHUFFLE)\s*\*/)""").r

  /** Offset of the statement's outer query block's SELECT: the first
    * SELECT token at paren depth 0 outside string literals — skips past
    * a leading `WITH x AS (SELECT …)` prefix, where an injected hint
    * would reference relations out of scope and be silently dropped.
    */
  private[graft] def outerSelectOffset(sql: String): Int = {
    var depth = 0
    var inStr = false
    var i = 0
    def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'S' | 's' if depth == 0 &&
            sql.regionMatches(true, i, "SELECT", 0, 6) &&
            (i == 0 || !isWord(sql.charAt(i - 1))) &&
            (i + 6 >= sql.length || !isWord(sql.charAt(i + 6))) =>
          return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Back-compat name: round-1 callers knew this as a pure strip. */
  def stripBracketHints(sql: String): String = rewriteHints(sql)

  /** Impala puts IGNORE NULLS *inside* the analytic call
    * (`first_value(x ignore nulls)`, AnalyticExpr.java); Spark's grammar
    * wants a second boolean argument. One nesting level of parens in the
    * operand is supported (cast(...), coalesce(...)).
    */
  private val ignoreNullsRe =
    """(?is)\b(first_value|last_value)\s*\(((?:[^()]|\([^()]*\))*?)\s+ignore\s+nulls\s*\)""".r

  /** Impala accepts zero-argument `count()` as `count(*)`. */
  private val countEmptyRe = """(?i)\bcount\s*\(\s*\)""".r

  /** Impala accepts double-quoted typed literals (`DATE "2020-01-01"`);
    * Spark's grammar wants single quotes.
    */
  private val typedLitRe = """(?i)\b(DATE|TIMESTAMP)\s+"([^"]*)"""".r

  /** Impala's two-argument `extract(ts, 'unit')` (ExtractFromExpr.java)
    * → Spark's `date_part('unit', ts)`; the SQL-standard
    * `EXTRACT(unit FROM ts)` form parses in both and is untouched.
    */
  private val extract2Re =
    """(?i)\bextract\s*\(([^(),]+?),\s*([^()]+?)\)""".r

  private def rewriteFunctionForms(sql: String): String = {
    val a = ignoreNullsRe.replaceAllIn(sql, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)}(${m.group(2)}, true)"))
    val b = countEmptyRe.replaceAllIn(a, "count(*)")
    val c = typedLitRe.replaceAllIn(b, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"${m.group(1)} '${m.group(2)}'"))
    extract2Re.replaceAllIn(c, m =>
      java.util.regex.Matcher.quoteReplacement(
        s"date_part(${m.group(2).trim}, ${m.group(1).trim})"))
  }

  /** Per-index paren depth and inside-string-literal flags (one pass). */
  private def depthMap(sql: String): (Array[Int], Array[Boolean]) = {
    val d = new Array[Int](sql.length)
    val q = new Array[Boolean](sql.length)
    var depth = 0
    var quote: Char = 0
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) { q(i) = true; if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c; q(i) = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
      }
      d(i) = depth
      i += 1
    }
    (d, q)
  }

  private val rightSemiAntiRe = """(?i)\bRIGHT\s+(SEMI|ANTI)\s+JOIN\b""".r

  /** Impala supports RIGHT SEMI/ANTI JOIN (`TJoinOp`, PlanNodes.thrift:
    * 361-378); Spark's grammar has only the LEFT forms. Semantically
    * `A RIGHT SEMI JOIN B ON c ≡ B LEFT SEMI JOIN A ON c` — swap the
    * operands. Conservative: rewrites only when the left operand is the
    * single relation directly after FROM at the same nesting depth
    * (no preceding join tree or comma list); anything else is left
    * untouched rather than risk a wrong swap.
    */
  def rewriteRightSemiAnti(sql: String): String = {
    val m = rightSemiAntiRe.findFirstMatchIn(sql).orNull
    if (m == null) return sql
    val (d, q) = depthMap(sql)
    if (q(m.start)) return sql
    val depth = d(m.start)
    val froms = """(?i)\bFROM\b""".r
      .findAllMatchIn(sql.substring(0, m.start)).toSeq
      .filter(f => !q(f.start) && d(f.start) == depth)
    if (froms.isEmpty) return sql
    val f = froms.last
    val between = sql.substring(f.end, m.start)
    val singleRelation =
      !between.zipWithIndex.exists { case (c, k) =>
        c == ',' && !q(f.end + k) && d(f.end + k) == depth } &&
      !"""(?i)\bJOIN\b""".r.findAllMatchIn(between).exists(j =>
        !q(f.end + j.start) && d(f.end + j.start) == depth)
    if (!singleRelation) return sql
    val on = """(?i)\bON\b""".r.findAllMatchIn(sql)
      .find(o => o.start >= m.end && !q(o.start) && d(o.start) == depth)
      .orNull
    if (on == null) return sql
    val rel1 = between.trim
    val rel2 = sql.substring(m.end, on.start).trim
    rewriteRightSemiAnti(
      sql.substring(0, f.end) + " " + rel2 + " LEFT " +
        m.group(1).toUpperCase + " JOIN " + rel1 + " " + sql.substring(on.start))
  }

  /** All string-level dialect rewrites, in application order. */
  def rewrite(text: String): String =
    rewriteFunctionForms(rewriteCastFormat(rewriteRightSemiAnti(rewriteHints(text))))

  /** Run Impala-dialect SQL: hint strip + format-cast rewrite, parse,
    * then flip every sort key to Impala's default NULL ordering.
    */
  def sql(spark: SparkSession, text: String): DataFrame = {
    GraftSession.tune(spark)
    val plan = org.apache.spark.sql.graft.Bridge.parsePlan(
      spark, rewrite(text))
    val impalaSorted = plan.transformAllExpressions {
      case SortOrder(c, Ascending, NullsFirst, same) =>
        SortOrder(c, Ascending, NullsLast, same)
      case SortOrder(c, Descending, NullsLast, same) =>
        SortOrder(c, Descending, NullsFirst, same)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark, impalaSorted)
  }
}
