package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._

/** The reference's Java test-UDF jar re-expressed as Catalyst
  * expression builders (`java/test-hive-udfs/src/main/java/org/apache/
  * impala/TestUdf.java` + friends, registered by
  * `QueryTest/load-java-udfs.test` from impala-hive-udfs.jar). The
  * hive_* names bind Hive builtin classes (UDFPI, UDFBin) — their
  * semantics are the matching Spark builtins; the TestUdf adds follow
  * the java overloads exactly (primitive-returning variants yield -1
  * on NULL input, boolean AND yields false, Writable-returning double
  * yields NULL). A thrown exception surfaces as NULL (IMPALA-1392).
  */
object TestJavaUdfSuite {

  private def call(name: String, args: Expression*): Expression =
    UnresolvedFunction(Seq(name), args, isDistinct = false)

  private def anyNull(a: Seq[Expression]): Expression =
    a.map(IsNull(_): Expression).reduce(Or)

  private def identityB(a: Seq[Expression]): Expression =
    if (a.length == 1) a.head
    else If(anyNull(a), Literal.create(null, StringType),
      Concat(a.map(Cast(_, StringType))))

  private val builders: Map[String, Seq[Expression] => Expression] = Map(
    "hive_pi" -> (_ => Literal(math.Pi)),
    "hive_bin" -> (a => call("bin", a.head)),
    "hive_round" -> (a => call("round", a.head)),
    "hive_floor" -> (a => Cast(call("floor", a.head), LongType)),
    "hive_mod" -> (a => call("mod", a(0), a(1))),
    "hive_lower" -> (a => Lower(a.head)),
    "identity" -> identityB,
    "identity_anytype" -> identityB,
    // TestUdf.evaluate(a, b): numeric adds; primitive-returning int/
    // short/float yield -1 on NULL, Writable double yields NULL,
    // boolean is AND-with-false-on-NULL
    "hive_add" -> (a => a.head.dataType match {
      case BooleanType => If(anyNull(a), Literal(false), a.reduce(And(_, _)))
      case DoubleType =>
        If(anyNull(a), Literal.create(null, DoubleType), a.reduce(Add(_, _)))
      case t =>
        If(anyNull(a), Cast(Literal(-1), t), a.reduce(Add(_, _)))
    }),
    "throws_exception" -> (_ => Literal.create(null, BooleanType)),
    // ReplaceStringUdf: NULL/"" → "", else replace "s" → "ss"
    "replace_string" -> (a =>
      If(Or(IsNull(a.head), EqualTo(a.head, Literal(""))), Literal(""),
        call("replace", a.head, Literal("s"), Literal("ss")))),
    // ImportsNearbyClassesUdf → UtilForUdf.getHello()
    "import_nearby_classes" -> (_ => Literal("Hello")))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "built-in")
    }
  }

  def names: Seq[String] = builders.keys.toSeq.sorted
}
