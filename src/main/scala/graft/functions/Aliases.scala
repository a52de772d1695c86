package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._

/** Impala builtin names that are aliases / thin compositions of Spark
  * built-ins (reference registry: `common/function-registry/
  * impala_functions.py`, `fe/.../catalog/BuiltinsDb.java`,
  * `be/src/exprs/conditional-functions.h`). Registered on the session's
  * FunctionRegistry so Impala SQL text runs where only the name differs.
  */
object Aliases {

  /** Unresolved call — the analyzer resolves it on the next pass, so we
    * can alias to any builtin without naming its Expression class.
    */
  private def call(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  private def lit(v: Any): Expression = Literal(v)

  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    // conditional (be/src/exprs/conditional-functions.h)
    "nvl" -> (a => call("coalesce", a: _*)),
    "isnull" -> (a =>
      if (a.length == 1) IsNull(a.head) else call("coalesce", a: _*)),
    "nvl2" -> (a => If(IsNotNull(a(0)), a(1), a(2))),
    "zeroifnull" -> (a => call("coalesce", a.head, lit(0))),
    "nullifzero" -> (a => call("nullif", a.head, lit(0))),
    "istrue" -> (a => And(IsNotNull(a.head), a.head)),
    "isfalse" -> (a => And(IsNotNull(a.head), Not(a.head))),
    "isnottrue" -> (a => Or(IsNull(a.head), Not(a.head))),
    "isnotfalse" -> (a => Or(IsNull(a.head), a.head)),
    "nonnullvalue" -> (a => IsNotNull(a.head)),
    "nullvalue" -> (a => IsNull(a.head)),
    // string (be/src/exprs/string-functions-ir.cc)
    "strleft" -> (a => call("left", a: _*)),
    "strright" -> (a => call("right", a: _*)),
    // math (be/src/exprs/math-functions-ir.cc)
    "dround" -> (a => call("round", a: _*)),
    "fmod" -> (a => call("mod", a: _*)),
    "quotient" -> (a => call("div", a: _*)),
    // aggregates (fe/.../catalog/BuiltinsDb.java:913-1288)
    "ndv" -> (a => call("approx_count_distinct", a.head)),
    "appx_median" -> (a => call("percentile_approx", a.head, lit(0.5), lit(10000))),
    "group_concat" -> (a =>
      if (a.length == 1) call("concat_ws", lit(", "), call("collect_list", a.head))
      else call("concat_ws", a(1), call("collect_list", a(0)))),
  )

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  def names: Seq[String] = builders.keys.toSeq.sorted
}
