package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DecimalType

/** Query registry shared by SparkEntry / Verify / Bench.
  *
  * Every operator claimed in SURVEY.md §2 gets a [[Q.Def]]: a named
  * DataFrame query plus (when SQL-expressible) a DuckDB oracle that must
  * hash-match. Conventions for bit-exact oracle parity:
  *   - money doubles are 2-decimal: sum via DECIMAL cast, then CAST AS
  *     DOUBLE (deterministic in both engines; avoids fp reorder drift);
  *   - averages computed as exact-decimal-sum / count;
  *   - timestamps never output raw — formatted as 'yyyy-MM-dd …' strings;
  *   - every query ends in a deterministic ORDER BY (unique tie-break).
  */
object Q {
  type Fn = (SparkSession, String) => DataFrame

  final case class Def(name: String, fn: Fn, oracle: Option[String] = None)

  /** Exact 2-decimal money cast (fixture money columns are 2-dec). */
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Small-fraction cast for discount/tax (0.00–0.10). */
  def frac2(c: Column): Column = c.cast(DecimalType(4, 2))
}

trait QueryGroup {
  def defs: Seq[Q.Def]
}
