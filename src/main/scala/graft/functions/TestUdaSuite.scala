package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** The reference's native test-UDA suite
  * (`be/src/testutil/test-udas.cc`, loaded from libTestUdas.so by
  * test_udfs.py) as compositions of built-in aggregates — each test
  * UDA's update/merge/finalize chain reduces to a builtin aggregate
  * plus a finalize-side cast or constant:
  *
  *  - TestCount ≡ count(arg); TruncSum sums doubles and truncates at
  *    finalize (cast to BIGINT); SumSmallDecimal ≡ sum;
  *    CharIntermediateSum sums ints through a CHAR intermediate (≡
  *    sum cast back to INT); CountNulls counts NULL inputs.
  *  - ToggleNull nulls its intermediate on every second update, so the
  *    result is NULL iff the row count is even.
  *  - ArgIsConst returns whether the trailing argument was constant —
  *    an analysis-time fact here (foldable).
  *  - The Agg*Intermediate probes validate FunctionContext plumbing
  *    and finalize to NULL (or the constant 100 for the string
  *    variant).
  *  - Hll finalizes to the STRING render of the distinct estimate —
  *    the same estimator as Impala's ndv (Sketches).
  */
object TestUdaSuite {

  private def call(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    "hll" -> (a => Cast(call("ndv", a.head), StringType)),
    "test_count" -> (a => call("count", a.head)),
    "sum_small_decimal" -> (a => call("sum", a.head)),
    "trunc_sum" -> (a => Cast(call("sum", a.head), LongType)),
    "char_intermediate_sum" -> (a => Cast(call("sum", a.head), IntegerType)),
    "count_nulls" -> (a =>
      Subtract(call("count", Literal(1)), call("count", a.head))),
    "toggle_null" -> (_ =>
      If(EqualTo(Pmod(call("count", Literal(1)), Literal(2L)), Literal(0L)),
        Literal.create(null, IntegerType), Literal(1))),
    "arg_is_const" -> (a => call("max", Literal(a(1).foldable))),
    "agg_intermediate" -> (_ =>
      call("max", Cast(Literal.create(null, NullType), LongType))),
    "agg_decimal_intermediate" -> (_ =>
      call("max", Cast(Literal.create(null, NullType), DecimalType(5, 1)))),
    "agg_date_intermediate" -> (_ =>
      call("max", Cast(Literal.create(null, NullType), DateType))),
    "agg_string_intermediate" -> (_ =>
      call("max", Cast(Literal(100), DecimalType(20, 0)))))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  def names: Seq[String] = builders.keys.toSeq.sorted
}
