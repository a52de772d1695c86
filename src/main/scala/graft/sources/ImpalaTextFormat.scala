package graft.sources

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Impala's delimited-text WRITER value rendering — the bytes an
  * `INSERT` into a text table produces.
  *
  * The reference writes each value through a `stringstream` at
  * `RawValue::ASCII_PRECISION = 16` significant digits
  * (`be/src/exec/hdfs-text-table-writer.cc:51`,
  * `be/src/runtime/raw-value.h:36`), i.e. C `%.16g` semantics for
  * FLOAT/DOUBLE (a float is promoted to double first), `true`/`false`
  * booleans, and timestamps via `TimestampValue::ToString`
  * (`be/src/runtime/timestamp-value.cc:205`) — ISO date, space, and a
  * boost `to_simple_string` time that prints a full nine-digit
  * nanosecond fraction when nonzero. NULLs write the table's
  * `serialization.null.format` (Hive default `\N`).
  *
  * This model exists so the engine can reproduce Impala's on-disk
  * text layout exactly — partition file byte sizes surface in
  * `SHOW TABLE STATS` (ImpalaStats) and users compare them against
  * their Impala warehouses.
  */
object ImpalaTextFormat {

  /** C `%.16g` of a double: round to 16 significant decimal digits
    * (correctly rounded from the binary value, ties to even — glibc),
    * fixed notation while the decimal exponent is in [-4, 16), else
    * scientific with a signed two-digit-minimum exponent; trailing
    * fractional zeros strip in both forms.
    */
  def g16(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isInfinite) return if (d > 0) "inf" else "-inf"
    if (d == 0.0) return if (1.0 / d < 0) "-0" else "0"
    val bd = new JBigDecimal(d).round(new MathContext(16, RoundingMode.HALF_EVEN))
    val exp = bd.precision - bd.scale - 1
    if (exp < -4 || exp >= 16) {
      // scientific: one leading digit, stripped fraction, e±NN
      val mant = bd.movePointLeft(exp).stripTrailingZeros.toPlainString
      val sign = if (exp < 0) "-" else "+"
      f"${mant}e$sign${math.abs(exp)}%02d"
    } else {
      val s = bd.stripTrailingZeros
      // stripTrailingZeros may leave scientific form (e.g. 1E+2)
      val plain = (if (s.scale < 0) s.setScale(0) else s).toPlainString
      plain
    }
  }

  /** Render one value the way the text writer streams it; None = SQL
    * NULL (caller substitutes the null format).
    */
  def render(v: Any): Option[String] = v match {
    case null => None
    case b: Boolean => Some(if (b) "true" else "false")
    case f: Float => Some(g16(f.toDouble))
    case d: Double => Some(g16(d))
    case d: java.math.BigDecimal => Some(d.toPlainString)
    case d: BigDecimal => Some(d.underlying.toPlainString)
    case t: java.sql.Timestamp =>
      val ldt = t.toLocalDateTime
      val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
        f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
        f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
      Some(if (ldt.getNano == 0) base else base + f".${ldt.getNano}%09d")
    case ldt: java.time.LocalDateTime =>
      render(java.sql.Timestamp.valueOf(ldt))
    case d: java.sql.Date => Some(d.toString)
    case d: java.time.LocalDate => Some(d.toString)
    case b: Array[Byte] => Some(new String(b, "UTF-8"))
    case other => Some(other.toString)
  }

  /** UTF-8 byte size of one written row: fields joined by
    * `fieldDelim`, terminated by `lineDelim`.
    */
  def rowBytes(row: Row, nullFmt: String = "\\N",
      fieldDelimLen: Int = 1, lineDelimLen: Int = 1): Long = {
    var total = 0L
    var i = 0
    while (i < row.length) {
      val cell = render(row.get(i)).getOrElse(nullFmt)
      total += cell.getBytes("UTF-8").length
      i += 1
    }
    total + fieldDelimLen.toLong * (row.length - 1) + lineDelimLen
  }

  /** Total text bytes of a written file holding `rows`. */
  def fileBytes(rows: Iterable[Row], nullFmt: String = "\\N"): Long =
    rows.iterator.map(rowBytes(_, nullFmt)).sum
}
