package graft.functions

/** Itanium C++ ABI name mangling for the reference's UDF/UDA symbol
  * shapes — free functions and `impala::` static members over
  * `impala_udf::*Val` parameter types.
  *
  * Impala's catalog stores the RESOLVED (mangled) symbol and SHOW
  * CREATE FUNCTION prints it (`fe/.../analysis/FunctionArgs` resolution
  * via `LibCache`, rendered by `Function.toSql(true)`); the goldens pin
  * strings like
  * `_Z6VarSumPN10impala_udf15FunctionContextEiPKNS_6IntValE`. A JVM
  * engine has no native symbol table, but the mangling is deterministic
  * from the C++ signature (Itanium ABI §5.1), so the same strings are
  * DERIVED here: substitution components (namespaces, nested names,
  * qualified/pointer types) register in order of first appearance and
  * later uses emit `S_`/`S<n>_` back-references.
  */
object ItaniumMangle {

  sealed trait Param
  /** plain C `int` (the trailing vararg count). */
  case object IntParam extends Param
  /** `const T&` — the template parameter of a member template. */
  case object TRef extends Param
  /** `impala_udf::<cls>*` */
  final case class Ptr(cls: String) extends Param
  /** `const impala_udf::<cls>&` */
  final case class ConstRef(cls: String) extends Param
  /** `const impala_udf::<cls>*` */
  final case class ConstPtr(cls: String) extends Param

  private val NS = "impala_udf"

  def mangle(name: String, params: Seq[Param],
      memberOf: Option[(String, String)] = None,
      templateArg: Option[String] = None): String = {
    val subs = scala.collection.mutable.ArrayBuffer.empty[String]
    def subRef(i: Int): String =
      if (i == 0) "S_"
      else "S" + java.lang.Long.toString(i - 1, 36).toUpperCase + "_"
    def idx(key: String): Option[Int] = {
      val i = subs.indexOf(key)
      if (i >= 0) Some(i) else None
    }
    def reg(key: String): Unit = if (!subs.contains(key)) subs += key
    def len(s: String) = s.length.toString + s
    def nested(cls: String): String = idx(s"$NS::$cls") match {
      case Some(i) => subRef(i)
      case None =>
        val out = idx(NS) match {
          case Some(j) => "N" + subRef(j) + len(cls) + "E"
          case None => reg(NS); "N" + len(NS) + len(cls) + "E"
        }
        reg(s"$NS::$cls")
        out
    }
    def param(p: Param): String = p match {
      case IntParam => "i"
      case TRef => "RKT_"
      case Ptr(cls) =>
        idx(s"P $NS::$cls") match {
          case Some(i) => subRef(i)
          case None =>
            val out = "P" + nested(cls)
            reg(s"P $NS::$cls")
            out
        }
      case ConstPtr(cls) =>
        idx(s"PK $NS::$cls") match {
          case Some(i) => subRef(i)
          case None =>
            val out = idx(s"K $NS::$cls") match {
              case Some(k) => "P" + subRef(k)
              case None =>
                val inner = nested(cls); reg(s"K $NS::$cls"); "PK" + inner
            }
            reg(s"PK $NS::$cls")
            out
        }
      case ConstRef(cls) =>
        idx(s"RK $NS::$cls") match {
          case Some(i) => subRef(i)
          case None =>
            val out = idx(s"K $NS::$cls") match {
              case Some(k) => "R" + subRef(k)
              case None =>
                val inner = nested(cls); reg(s"K $NS::$cls"); "RK" + inner
            }
            reg(s"RK $NS::$cls")
            out
        }
    }
    val head = memberOf match {
      case Some((ns, cls)) =>
        reg(ns); reg(s"$ns::$cls")
        templateArg match {
          case Some(targ) =>
            // member TEMPLATE: the template-prefix substitutes BEFORE
            // the template arguments (Itanium §5.1.6), so the
            // argument's namespace lands at the S-index the parameter
            // list back-references; templated functions also mangle
            // their (void) return type
            reg(s"$ns::$cls::$name")
            "_ZN" + len(ns) + len(cls) + len(name) +
              "I" + nested(targ) + "EEv"
          case None =>
            "_ZN" + len(ns) + len(cls) + len(name) + "E"
        }
      case None => "_Z" + len(name)
    }
    head + params.map(param).mkString
  }

  /** SQL type → `impala_udf` Val class (udf.h). */
  def valClass(sqlType: String): String =
    sqlType.trim.toUpperCase.takeWhile(c => c.isLetter || c == '_') match {
      case "BOOLEAN" => "BooleanVal"
      case "TINYINT" => "TinyIntVal"
      case "SMALLINT" => "SmallIntVal"
      case "INT" | "INTEGER" => "IntVal"
      case "BIGINT" => "BigIntVal"
      case "FLOAT" => "FloatVal"
      case "DOUBLE" => "DoubleVal"
      case "STRING" | "CHAR" | "VARCHAR" => "StringVal"
      case "TIMESTAMP" => "TimestampVal"
      case "DATE" => "DateVal"
      case "DECIMAL" => "DecimalVal"
      case other => other.toLowerCase.capitalize + "Val"
    }

  private def ctx = Ptr("FunctionContext")

  /** Scalar UDF symbol: `Sym(FunctionContext*, const ArgVal&...)`;
    * a variadic last arg mangles as `(int, const ArgVal*)`.
    */
  def udfSymbol(sym: String, argTypes: Seq[String],
      varArgs: Boolean): String = {
    val params: Seq[Param] =
      if (varArgs)
        argTypes.init.map(t => ConstRef(valClass(t))) ++
          Seq(IntParam, ConstPtr(valClass(argTypes.last)))
      else argTypes.map(t => ConstRef(valClass(t)))
    mangle(sym, ctx +: params)
  }

  /** UDA function symbols over `intermediate` (the Val class of the
    * intermediate/return type): update(ctx, args.., inter*),
    * init(ctx, inter*), merge(ctx, const inter&, inter*),
    * finalize(ctx, const inter&).
    */
  def udaUpdate(sym: String, argTypes: Seq[String],
      intermediate: String): String =
    mangle(sym, ctx +: (argTypes.map(t => ConstRef(valClass(t))) :+
      Ptr(intermediate)))
  def udaInit(sym: String, intermediate: String): String =
    mangle(sym, Seq(ctx, Ptr(intermediate)))
  def udaMerge(sym: String, intermediate: String): String =
    mangle(sym, Seq(ctx, ConstRef(intermediate), Ptr(intermediate)))
  def udaFinalize(sym: String, intermediate: String): String =
    mangle(sym, Seq(ctx, ConstRef(intermediate)))
}
