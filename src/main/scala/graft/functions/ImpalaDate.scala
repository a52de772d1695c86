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

/** Short-year fill for FORMAT-clause date parsing
  * (`datetime-parser-common.cc` PrefixYear/RoundYear): an input year
  * with fewer digits than the token takes its missing HIGH-ORDER
  * digits from the current year (YYYY/YYY/YY/Y and 1/3-digit RR
  * inputs), while a 2-digit year under RR/RRRR applies the round-year
  * century rule. `now` is the session's NOW_STRING override year when
  * set (the reference test runner pins it), else the wall clock.
  * Rewrites field `idx` of the dash-normalized input to 4 digits.
  */
case class ImpalaYearFill(child: Expression, tok: String, idx: Int,
    now: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  private def fill(d: String): String =
    if (d.length >= 4 || d.isEmpty || !d.forall(_.isDigit)) d
    else (tok, d.length) match {
      case ("RRRR" | "RR", 2) =>
        val yy = d.toInt
        val cent = now / 100
        val c =
          if (yy < 50) (if (now % 100 < 50) cent else cent + 1)
          else (if (now % 100 < 50) cent - 1 else cent)
        f"${c * 100 + yy}%04d"
      case _ => now.toString.take(4 - d.length) + d
    }
  override protected def nullSafeEval(v: Any): Any = {
    val fields = v.toString.split("-", -1)
    if (idx >= fields.length) return v.asInstanceOf[UTF8String]
    fields(idx) = fill(fields(idx).trim)
    UTF8String.fromString(fields.mkString("-"))
  }
  override protected def withNewChildInternal(c: Expression): ImpalaYearFill =
    copy(child = c)
  override def prettyName: String = "impala_year_fill"
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

/** DECIMAL_V2 zero-divisor guard: Impala raises `Cannot divide decimal
  * by zero` where Spark's TRY division nulls
  * (`be/src/exprs/operators.cc` decimal paths; decimal-exprs.test).
  * Passes the divisor through unchanged otherwise.
  */
case class ImpalaDecimalDivisor(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = {
    if (v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.signum == 0)
      Ds.udfError("Cannot divide decimal by zero")
    v
  }
  override protected def withNewChildInternal(c: Expression): ImpalaDecimalDivisor =
    copy(c)
  override def prettyName: String = "impala_decimal_divisor"
}

/** Strict STRING→DECIMAL cast (DECIMAL_V2): parse failure and value
  * overflow RAISE (`string-parser.h` decimal path + the V2 error
  * contract) instead of Spark's TRY null.
  */
case class ImpalaCastToDecimal(child: Expression,
    target: DecimalType) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = target
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val s = v.toString.trim
    val bd =
      try new java.math.BigDecimal(s)
      catch { case _: NumberFormatException =>
        Ds.udfError("String to Decimal parse failed") }
    val dec = org.apache.spark.sql.types.Decimal(bd)
    if (!dec.changePrecision(target.precision, target.scale))
      Ds.udfError("String to Decimal cast overflowed")
    dec
  }
  override protected def withNewChildInternal(c: Expression): ImpalaCastToDecimal =
    copy(child = c)
  override def prettyName: String = "impala_cast_to_decimal"
}

/** regexp_match_count's start-position contract: offsets below 1 RAISE
  * (`string-functions-ir.cc` RegexpMatchCount — "Illegal starting
  * position"). Passes the position through otherwise.
  */
case class ImpalaRegexpStartPos(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = {
    if (v.asInstanceOf[Number].longValue < 1L)
      throw new RuntimeException(s"Illegal starting position $v")
    v
  }
  override protected def withNewChildInternal(c: Expression): ImpalaRegexpStartPos =
    copy(c)
  override def prettyName: String = "impala_regexp_start_pos"
}

/** regexp_match_count's match-parameter contract: only i/c/m/n are
  * legal ("Illegal match parameter x").
  */
case class ImpalaRegexpParams(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = {
    v.toString.foreach { ch =>
      if ("icmn".indexOf(ch) < 0)
        throw new RuntimeException(s"Illegal match parameter $ch")
    }
    v
  }
  override protected def withNewChildInternal(c: Expression): ImpalaRegexpParams =
    copy(c)
  override def prettyName: String = "impala_regexp_params"
}

/** trunc()'s unit contract: an unknown unit RAISES ("Invalid Truncate
  * Unit: …", `timestamp-functions.cc` TruncUnitFromString); known
  * units pass through (Spark evaluates the truncation itself).
  */
case class ImpalaTruncUnit(child: Expression) extends UnaryExpression
    with CodegenFallback {
  private val valid = Set("SYYYY", "YYYY", "YEAR", "SYEAR", "YYY", "YY",
    "Y", "Q", "MONTH", "MON", "MM", "RM", "WW", "W", "DDD", "DD", "J",
    "DAY", "DY", "D", "HH", "HH12", "HH24", "MI")
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = {
    if (!valid(v.toString.toUpperCase))
      throw new RuntimeException(s"Invalid Truncate Unit: $v")
    v
  }
  override protected def withNewChildInternal(c: Expression): ImpalaTruncUnit =
    copy(c)
  override def prettyName: String = "impala_trunc_unit"
}

/** Marks a column whose Parquet page index failed validation
  * (ParquetFooterCheck.invalidOffsetIndexColumns). Inert pass-through
  * until the dialect's per-statement pass resolves it against
  * ABORT_ON_ERROR: =1 raises the scanner's "Invalid offset index in
  * Parquet file" (Impala aborts the query), =0 strips to the raw
  * column (Impala recovers by ignoring the index) —
  * parquet-page-index.test pins both sides.
  */
case class ImpalaPageIndexSentinel(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any = v
  override protected def withNewChildInternal(c: Expression): ImpalaPageIndexSentinel =
    copy(c)
  override def prettyName: String = "impala_page_index_sentinel"
}

/** Marks a scan column whose raw values may sit outside Impala's
  * representable range. Inert pass-through until the dialect's
  * per-statement pass resolves it against ABORT_ON_ERROR: =1 raises
  * `msg` when an out-of-range value is READ (Impala aborts the scan),
  * =0 nulls it (Impala's recover-with-warning path). `loMicros` /
  * `hiMicros` bound the valid range in UTC epoch micros.
  */
case class ImpalaScanRangeSentinel(child: Expression, msg: String,
    loMicros: Long, hiMicros: Long)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val us = v.asInstanceOf[Long]
    if (us < loMicros || us > hiMicros) null else us
  }
  override protected def withNewChildInternal(c: Expression): ImpalaScanRangeSentinel =
    copy(child = c)
  override def prettyName: String = "impala_scan_range_sentinel"
}

/** DATE twin of [[ImpalaScanRangeSentinel]]: child is the RAW stored
  * epoch-day int; values outside Impala's [0001-01-01, 9999-12-31]
  * null here (recovery read) or raise `msg` under ABORT_ON_ERROR=1
  * (the dialect resolves it).
  */
case class ImpalaDateRangeSentinel(child: Expression, msg: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val d = v.asInstanceOf[Number].intValue
    if (d < -719162 || d > 2932896) null else d
  }
  override protected def withNewChildInternal(c: Expression): ImpalaDateRangeSentinel =
    copy(child = c)
  override def prettyName: String = "impala_date_range_sentinel"
}

/** A column that raises `msg` if (and only if) it is actually READ.
  * Deliberately NON-foldable: ConstantFolding must never evaluate it
  * at plan time — an unused poison column gets pruned away (the
  * metadata-only count(*) path over a BIT_PACKED file), a referenced
  * one raises per scan.
  */
case class ImpalaRaiseOnRead(msg: String, dataType: DataType,
    det: Boolean = true)
    extends LeafExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def foldable: Boolean = false
  // det=false keeps ConvertToLocalRelation from eagerly evaluating a
  // poisoned projection over a LocalRelation-backed view while column
  // pruning still drops it when unreferenced (unsupported_types);
  // aggregate-guard uses must stay deterministic (CheckAnalysis)
  override lazy val deterministic: Boolean = det
  override def eval(input: InternalRow): Any =
    throw new RuntimeException(msg)
}
