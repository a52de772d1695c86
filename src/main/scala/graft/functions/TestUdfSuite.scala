package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** The reference's native test-UDF suite
  * (`be/src/testutil/test-udfs.cc`), re-expressed as Catalyst
  * expression builders. The reference loads these from
  * `libTestUdfs.so` into a per-test database
  * (`tests/query_test/test_udfs.py` create-function DDL); a JVM engine
  * has no native loading, so the same names register directly with the
  * same semantics — which is also the faithful performance shape: each
  * is a codegen-able expression, not an external call.
  *
  * Registered ONLY on demand (the udf.test golden replay), not in the
  * default session surface.
  */
object TestUdfSuite {

  private def call(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  /** test-udfs.cc VarSum(IntVal/DoubleVal/DecimalVal): null args are
    * skipped; ALL null → NULL.
    */
  private def skipNullSum(args: Seq[Expression]): Expression =
    If(args.map(IsNull(_): Expression).reduce(And),
      Literal.create(null, NullType),
      args.map(a =>
        call("coalesce", a, Literal(0)): Expression).reduce(Add(_, _)))

  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    // Identity — one symbol per scalar type in the reference; the
    // expression is simply its argument (type-preserving)
    "identity" -> (a => a.head),
    // NoArgs() → "string"
    "no_args" -> (_ => Literal("string")),
    // VarAnd: any NULL → false (not SQL three-valued logic)
    "var_and" -> (a =>
      If(a.map(IsNull(_): Expression).reduce(Or), Literal(false),
        a.reduce(And(_, _)))),
    // VarSum: StringVal variant sums LENGTHS (all-null → 0); numeric
    // variants skip nulls, all-null → NULL
    "var_sum" -> (a =>
      if (a.head.dataType.isInstanceOf[StringType])
        a.map(x => call("coalesce", call("length", x),
          Literal(0)): Expression).reduce(Add(_, _))
      else skipNullSum(a)),
    // VarSumMultiply(d, ints…): d NULL or all ints NULL → NULL, else
    // sum(ints) * d
    "var_sum_multiply" -> (a =>
      If(IsNull(a.head), Literal.create(null, NullType),
        Multiply(Cast(skipNullSum(a.tail), DoubleType), a.head))),
    "var_sum_multiply2" -> (a =>
      If(IsNull(a.head), Literal.create(null, NullType),
        Multiply(Cast(skipNullSum(a.tail), DoubleType), a.head))),
    // AllTypes: len + numeric vals + decimal unscaled + date days
    "all_types_fn" -> (a => Seq[Expression](
      call("length", a(0)), Cast(a(1), IntegerType), Cast(a(2), IntegerType),
      Cast(a(3), IntegerType), Cast(a(4), IntegerType),
      Cast(a(5), IntegerType), Cast(a(6), IntegerType),
      Cast(a(7), IntegerType), Cast(a(8), IntegerType),
      call("datediff", a(9), Literal("1970-01-01")))
      .reduce(Add(_, _))),
    // ConstantTimestamp() = 2013-10-09 00:00:00.000000001 ns — the ns
    // digit is below Spark's µs precision (SURVEY §7.4)
    "constant_timestamp" -> (_ => Cast(
      Literal("2013-10-09 00:00:00"), TimestampType)),
    "constant_date" -> (_ => Cast(Literal("2013-10-09"), DateType)),
    // ConstantArg: the argument when constant, else NULL
    "constant_arg" -> (a =>
      if (a.head.foldable) a.head
      else Literal.create(null, IntegerType)),
    // ValidateArgType: true iff the argument type is STRING
    "validate_arg_type" -> (a =>
      Literal(a.head.dataType.isInstanceOf[StringType])),
    // interpreted-path N-arg sums
    "four_args" -> (a => a.reduce(Add(_, _))),
    "five_args" -> (a => a.reduce(Add(_, _))),
    "six_args" -> (a => a.reduce(Add(_, _))),
    "seven_args" -> (a => a.reduce(Add(_, _))),
    "eight_args" -> (a => a.reduce(Add(_, _))),
    "nine_args" -> (a => a.reduce(Add(_, _))),
    "twenty_args" -> (a => a.reduce(Add(_, _))),
    "twenty_one_args" -> (a => a.reduce(Add(_, _))),
    // Pow registered under a test alias (the .so overrides the builtin)
    "xpow" -> (a => Pow(a(0), a(1))),
    "to_lower" -> (a => Lower(a.head)),
    "to_upper" -> (a => Upper(a.head)),
    // MemTest/DoubleFreeTest track allocations and return the input
    "mem_test" -> (a => a.head),
    "double_free_test" -> (a => a.head),
    "unmangled_symbol" -> (_ => Literal(5L)),
    // TwentyArgs / TwentyOneArgs / NineArgs (test-udfs.cc): sums of
    // their int args. udf-errors.test runs with CODEGEN DISABLED,
    // where the reference's interpreter refuses >20-arg native UDFs
    // and any LLVM-IR UDF — those twins reproduce the pinned error
    // contract (be/src/exprs/scalar-fn-call.cc) instead of a result
    "twenty_args" -> (a => a.reduce(Add(_, _))),
    "twenty_one_args" -> (_ => throw new UnsupportedOperationException(
      "Cannot interpret native UDF 'twenty_one_args': number of " +
        "arguments is more than 20. Codegen is needed. Please set " +
        "DISABLE_CODEGEN to false.")),
    "nine_args_ir" -> (_ => throw new UnsupportedOperationException(
      "Cannot interpret LLVM IR UDF 'nine_args_ir': Codegen is " +
        "needed. Please set DISABLE_CODEGEN to false.")),
    // BadExpr/BadExpr2 (test-udfs.cc): their prepare_fns fail — the
    // combined message carries both fragment-scope spellings the
    // goldens pin ("BadExpr error" / "BadExpr2 prepare error")
    "bad_expr" -> (_ => throw new IllegalStateException(
      "BadExpr prepare error")),
    "bad_expr2" -> (_ => throw new IllegalStateException(
      "BadExpr2 prepare error: BadExpr error")),
    "hive_pi" -> (_ => Literal(math.Pi)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  def names: Seq[String] = builders.keys.toSeq.sorted
}
