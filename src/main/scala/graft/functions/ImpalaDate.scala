package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Impala's strict DATE semantics (`be/src/runtime/date-value.cc`,
  * `date-parse-util.cc`): the reference ERRORS on unparseable or
  * out-of-range date strings where Spark's cast nulls, pins the valid
  * range to [0001-01-01, 9999-12-31] with real (proleptic Gregorian)
  * calendar validation, and refuses DATE↔numeric casts at analysis.
  * Applied by the dialect only (`ImpalaDialect.impalaExpr`), so
  * Spark-native callers keep Spark behavior — `date.test`'s CATCH
  * rows pin the whole contract.
  */
object ImpalaDateUtil {
  private val dateRe = """(\d{1,4})-(\d{1,2})-(\d{1,2})""".r
  // cast-from-string accepts a trailing time section (accept_time_toks
  // in ParseSimpleDateFormat — the date part of a default-format
  // timestamp string)
  private val timeTailRe =
    """\d{1,2}(:\d{1,2}(:\d{1,2}(\.\d*)?)?)?""".r

  /** The default-format parse: `yyyy-M-d[ HH:mm:ss[.f]]`; returns epoch
    * days, or None on any parse/range/calendar failure.
    */
  def parse(raw: String, acceptTime: Boolean): Option[Int] = {
    val s = raw.trim
    val sep = s.indexWhere(c => c == ' ' || c == 'T')
    val (datePart, tail) =
      if (sep < 0) (s, None) else (s.substring(0, sep), Some(s.substring(sep + 1)))
    if (tail.exists(t => !acceptTime || !timeTailRe.matches(t.trim)))
      return None
    datePart match {
      case dateRe(y, m, d) =>
        val yy = y.toInt
        if (yy < 1 || yy > 9999) None
        else
          try Some(java.time.LocalDate.of(yy, m.toInt, d.toInt)
            .toEpochDay.toInt)
          catch { case _: java.time.DateTimeException => None }
      case _ => None
    }
  }

  /** 1400-01-01 as epoch days — the TimestampValue lower bound. */
  val MinTimestampDays: Int =
    java.time.LocalDate.of(1400, 1, 1).toEpochDay.toInt
}

/** Strict default-format STRING→DATE cast: Impala raises
  * `String to Date parse failed. Invalid string val: '…'` instead of
  * nulling (`date-parse-util.cc` ParseSimpleDateFormat + the cast's
  * error path).
  */
case class ImpalaCastToDate(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val raw = v.toString
    ImpalaDateUtil.parse(raw, acceptTime = true).getOrElse(
      Ds.udfError(s"String to Date parse failed. Invalid string val: '$raw'"))
  }
  override protected def withNewChildInternal(c: Expression): ImpalaCastToDate =
    copy(c)
  override def prettyName: String = "impala_cast_to_date"
}

/** DATE→TIMESTAMP range guard: dates below 1400-01-01 cannot convert
  * (`date.test` — "The valid date range for the Timestamp type is
  * 1400-01-01..9999-12-31."). Passes the date through unchanged so the
  * enclosing Cast keeps Spark's zone semantics.
  */
case class ImpalaDateRangeCheck(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = {
    val days = v.asInstanceOf[Int]
    if (days < ImpalaDateUtil.MinTimestampDays)
      Ds.udfError("Date to Timestamp conversion failed. The valid date " +
        "range for the Timestamp type is 1400-01-01..9999-12-31.")
    days
  }
  override protected def withNewChildInternal(c: Expression): ImpalaDateRangeCheck =
    copy(c)
  override def prettyName: String = "impala_date_range_check"
}

/** FORMAT-clause STRING→DATE strictness: `parsed` is the lenient
  * `try_to_date` result; a null parse of a NON-null input raises the
  * reference's generic `String to Date parse failed.` (the FORMAT
  * error path omits the value).
  */
case class ImpalaDateParseStrict(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val p = left.eval(input)
    if (p == null && right.eval(input) != null)
      Ds.udfError("String to Date parse failed.")
    p
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(l, r)
  override def prettyName: String = "impala_date_fmt_strict"
}
