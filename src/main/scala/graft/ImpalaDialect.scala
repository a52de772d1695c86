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

  private val castFormatRe =
    """(?is)CAST\s*\(\s*(.+?)\s+AS\s+(TIMESTAMP|DATE|STRING|VARCHAR)\s+FORMAT\s+'([^']*)'\s*\)""".r

  /** String-level rewrite of the FORMAT-clause CAST (Spark has no such
    * grammar); the target type picks the direction (parse vs print).
    */
  def rewriteCastFormat(sql: String): String =
    castFormatRe.replaceAllIn(sql, m => {
      val expr = m.group(1)
      val target = m.group(2).toUpperCase
      val fmt = translateFormat(m.group(3)).replace("'", "''")
      val repl = target match {
        case "TIMESTAMP" => s"to_timestamp($expr, '$fmt')"
        case "DATE" => s"to_date($expr, '$fmt')"
        case _ => s"date_format($expr, '$fmt')"
      }
      java.util.regex.Matcher.quoteReplacement(repl)
    })

  /** Impala bracketed plan hints (`[BROADCAST]`/`[SHUFFLE]` after JOIN —
    * `fe/.../analysis/PlanHint.java`) aren't Spark grammar. They are
    * advisory; AQE makes the distribution decision instead, so dialect
    * mode strips them (comment-style plus-hints already parse).
    */
  private val bracketHintRe = """(?i)\[\s*(BROADCAST|SHUFFLE|NOSHUFFLE)\s*\]""".r

  def stripBracketHints(sql: String): String =
    bracketHintRe.replaceAllIn(sql, "")

  /** Run Impala-dialect SQL: hint strip + format-cast rewrite, parse,
    * then flip every sort key to Impala's default NULL ordering.
    */
  def sql(spark: SparkSession, text: String): DataFrame = {
    GraftSession.tune(spark)
    val plan = org.apache.spark.sql.graft.Bridge.parsePlan(
      spark, rewriteCastFormat(stripBracketHints(text)))
    val impalaSorted = plan.transformAllExpressions {
      case SortOrder(c, Ascending, NullsFirst, same) =>
        SortOrder(c, Ascending, NullsLast, same)
      case SortOrder(c, Descending, NullsLast, same) =>
        SortOrder(c, Descending, NullsFirst, same)
    }
    org.apache.spark.sql.graft.Bridge.ofRows(spark, impalaSorted)
  }
}
