package graft

import scala.util.Try

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Impala nested-collection table refs → Spark LATERAL VIEW chains.
  *
  * Impala's FROM clause admits paths into collection-typed columns as
  * table refs (`fe/src/main/java/org/apache/impala/analysis/
  * CollectionTableRef.java`, grammar `sql-parser.cup` table_ref):
  *
  *   - `FROM complextypestbl.int_array`           (absolute ref)
  *   - `FROM complextypestbl t, t.int_array a`    (relative, correlated)
  *   - `FROM t.nested_struct.c.d d, d.item i`     (chained, via structs)
  *   - `FROM t.nested_struct.g, g.value.h.i`      (maps; implicit alias
  *     = last path segment)
  *
  * An array ref exposes columns `item`/`pos`, a map ref `key`/`value`,
  * and an array-of-struct ref additionally exposes the struct's fields
  * directly (`Path.java` resolution; `nested-types-scanner-*.test`
  * reference `i.e`, `i.item.e`, and bare `e` interchangeably). The
  * comma-join form is INNER: rows with NULL/empty collections drop out.
  *
  * Spark translation (this object, applied before the text-level
  * dialect rewrites in [[ImpalaDialect.sql]]):
  *
  *   - intermediate collection steps (a path that continues past an
  *     array/map, e.g. `t.int_array_array.item`) become hidden
  *     `LATERAL VIEW explode(...)` views;
  *   - a final array step becomes `LATERAL VIEW posexplode(E) A AS
  *     pos, item`; when the element is a struct, a second
  *     `LATERAL VIEW inline(array(named_struct('pos', …, 'item', …,
  *     field…)))` under the user's alias exposes pos/item AND the
  *     element fields as columns of A — so `A.pos`, `A.e`, `A.item.e`
  *     and bare `e` all resolve exactly as in Impala;
  *   - a final map step becomes `LATERAL VIEW explode(E) A AS key,
  *     value`.
  *
  * `explode`/`posexplode`/`inline` skip NULL/empty input collections,
  * matching the INNER join semantics. All Generates stay inside
  * whole-stage codegen; at scale this is Spark's native unnest shape
  * (one Generate per collection level, no shuffle).
  *
  * Scope: comma-separated refs in any FROM clause (top level and
  * subqueries). Collection paths appearing as explicit JOIN operands
  * (`t JOIN t.int_array ON …`) are left untouched.
  */
object NestedRefs {

  private case class Scope(
      aliases: scala.collection.mutable.Map[String, DataType]) {
    def lookup(name: String): Option[DataType] =
      aliases.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
  }

  private val fromRe = """(?i)\bFROM\b""".r
  private val clauseEnders = Seq("WHERE", "GROUP", "HAVING", "ORDER",
    "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT", "WINDOW",
    "QUALIFY")
  private val pathItemRe =
    """(?is)^\s*([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)+)(?:\s+(?:as\s+)?([A-Za-z_]\w*))?\s*$""".r
  private val plainItemRe =
    """(?is)^\s*([A-Za-z_]\w*)(?:\s+(?:as\s+)?([A-Za-z_]\w*))?\s*$""".r
  private val aliasGuard = Set("on", "using", "join", "inner", "left",
    "right", "full", "cross", "where", "group", "order", "limit",
    "union", "intersect", "except", "tablesample")

  def rewrite(spark: SparkSession, sql: String): String = {
    val lower = sql.toLowerCase
    if (!lower.contains("from") || !sql.contains(".")) return sql
    val recursed = recurseParens(spark, sql)
    rewriteScope(spark, recursed)
  }

  /** Recursively rewrite parenthesized subquery bodies innermost-last
    * (each recursion re-enters rewrite → its own paren pass).
    */
  private def recurseParens(spark: SparkSession, s: String): String = {
    val (d, q) = ImpalaDialect.depthMap(s)
    val sb = new java.lang.StringBuilder
    var i = 0
    var last = 0
    while (i < s.length) {
      if (s.charAt(i) == '(' && !q(i) && i >= last) {
        val close = matching(s, i, d, q)
        if (close > i) {
          val inner = s.substring(i + 1, close)
          val t = inner.trim.toLowerCase
          if (t.startsWith("select") || t.startsWith("with")) {
            sb.append(s, last, i + 1)
            sb.append(rewrite(spark, inner))
            sb.append(')')
            last = close + 1
            i = close
          }
        }
      }
      i += 1
    }
    sb.append(s, last, s.length)
    sb.toString
  }

  private def matching(s: String, open: Int, d: Array[Int],
      q: Array[Boolean]): Int = {
    val base = d(open)
    var i = open + 1
    while (i < s.length) {
      if (s.charAt(i) == ')' && !q(i) && d(i) == base - 1) return i
      i += 1
    }
    -1
  }

  /** Rewrite every depth-0 FROM clause of one scope (subqueries were
    * already handled by the paren recursion, and their text is opaque
    * here because clause scanning sticks to depth 0).
    */
  private def rewriteScope(spark: SparkSession, s: String): String = {
    val (d, q) = ImpalaDialect.depthMap(s)
    val froms = fromRe.findAllMatchIn(s).toSeq.filter { m =>
      !q(m.start) && d(m.start) == 0 && isKeywordAt(s, m.start, "from")
    }
    if (froms.isEmpty) return s
    var out = s
    // right-to-left so earlier offsets stay valid
    froms.reverse.foreach { m =>
      val start = m.end
      val end = clauseEnd(s, start, d, q)
      val clause = s.substring(start, end)
      rewriteFromClause(spark, clause).foreach { nw =>
        out = out.substring(0, start) + nw + out.substring(end)
      }
    }
    out
  }

  private def isKeywordAt(s: String, pos: Int, kw: String): Boolean = {
    val before = pos == 0 || !isWord(s.charAt(pos - 1))
    val after = pos + kw.length >= s.length || !isWord(s.charAt(pos + kw.length))
    before && after
  }

  private def isWord(c: Char) = Character.isLetterOrDigit(c) || c == '_'

  private def clauseEnd(s: String, start: Int, d: Array[Int],
      q: Array[Boolean]): Int = {
    var i = start
    while (i < s.length) {
      if (!q(i) && d(i) == 0 && Character.isLetter(s.charAt(i)) &&
          (i == 0 || !isWord(s.charAt(i - 1)))) {
        val rest = s.substring(i, math.min(s.length, i + 10)).toUpperCase
        if (clauseEnders.exists(k => rest.startsWith(k) &&
            (i + k.length >= s.length || !isWord(s.charAt(i + k.length)))))
          return i
      }
      i += 1
    }
    s.length
  }

  private def splitTopLevel(str: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    var quote: Char = 0
    var start = 0
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      if (quote != 0) { if (ch == quote) quote = 0 }
      else ch match {
        case '\'' | '"' | '`' => quote = ch
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += str.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += str.substring(start)
    out.toSeq
  }

  /** Rewrite one FROM clause's comma items. Returns None when nothing
    * in the clause is a collection ref (text untouched).
    */
  private def rewriteFromClause(spark: SparkSession,
      clause: String): Option[String] = {
    val items = splitTopLevel(clause)
    if (!items.exists(it => pathItemRe.findFirstIn(it).isDefined))
      return None
    val scope = Scope(scala.collection.mutable.LinkedHashMap.empty)
    val baseItems = scala.collection.mutable.ArrayBuffer.empty[String]
    val laterals = scala.collection.mutable.ArrayBuffer.empty[String]
    var counter = 0
    var changed = false

    def tableSchema(name: String): Option[StructType] =
      Try(spark.table(name).schema).toOption

    items.foreach { raw =>
      raw match {
        case plainItemRe(name, alias) if alias == null ||
            !aliasGuard.contains(alias.toLowerCase) =>
          // plain table/view ref — register its schema for later
          // relative refs
          tableSchema(name).foreach { sch =>
            scope.aliases(Option(alias).getOrElse(name)) = sch
          }
          baseItems += raw
        case pathItemRe(path, alias) if alias == null ||
            !aliasGuard.contains(alias.toLowerCase) =>
          val segs = path.split('.').toSeq
          val head = segs.head
          // resolve the base: previously-bound alias, else a table
          val resolved: Option[(String, DataType, Seq[String])] =
            scope.lookup(head) match {
              case Some(t) => Some((head, t, segs.tail))
              case None =>
                tableSchema(head) match {
                  case Some(sch) =>
                    if (!scope.aliases.exists(_._1.equalsIgnoreCase(head)))
                      scope.aliases(head) = sch
                    // absolute ref: implicitly add the base table once
                    if (!baseItems.exists(b =>
                        b.trim.split("""\s+""").headOption
                          .exists(_.equalsIgnoreCase(head))))
                      baseItems += head
                    Some((head, sch, segs.tail))
                  case None => None
                }
            }
          resolved match {
            case Some((baseName, baseType, rest))
                if rest.nonEmpty && walkable(baseType, rest) =>
              val userAlias = Option(alias).getOrElse(segs.last)
              val (views, rowType) =
                buildLaterals(baseName, baseType, rest, userAlias,
                  () => { counter += 1; counter })
              laterals ++= views
              scope.aliases(userAlias) = rowType
              changed = true
            case _ =>
              baseItems += raw
          }
        case _ =>
          baseItems += raw
      }
    }
    if (!changed) None
    else Some(" " + (baseItems.map(_.trim).mkString(", ") + " " +
      laterals.mkString(" ")).trim + " ")
  }

  /** Can the path be walked from the base row type to a collection?
    * (Pre-check so unknown columns fall through untouched.) The walk
    * rule is uniform because every alias — table or collection view —
    * is registered as the StructType of its visible columns: struct
    * segments navigate textually; hitting an array/map with segments
    * left consumes `item`/`key`/`value` through a hidden explode.
    */
  private def walkable(base: DataType, path: Seq[String]): Boolean = {
    var cur: DataType = base
    var i = 0
    while (i < path.length) {
      val seg = path(i)
      cur match {
        case st: StructType =>
          st.fields.find(_.name.equalsIgnoreCase(seg)) match {
            case Some(f) => cur = f.dataType
            case None => return false
          }
        case ArrayType(elem, _) =>
          if (!seg.equalsIgnoreCase("item")) return false
          cur = elem
        case MapType(kt, vt, _) =>
          if (seg.equalsIgnoreCase("value")) cur = vt
          else if (seg.equalsIgnoreCase("key")) cur = kt
          else return false
        case _ => return false
      }
      i += 1
    }
    cur.isInstanceOf[ArrayType] || cur.isInstanceOf[MapType]
  }

  /** Emit the LATERAL VIEW chain for one collection ref. Returns the
    * view SQL plus the ref's ROW TYPE — the StructType of the columns
    * the new alias exposes (pos/item [+ element fields] for arrays,
    * key/value for maps) — registered in scope so later relative refs
    * (`d.item i`, `g.value.h.i`) walk it exactly like a table schema.
    */
  private def buildLaterals(baseName: String, baseType: DataType,
      path: Seq[String], userAlias: String, nextId: () => Int)
      : (Seq[String], StructType) = {
    val views = scala.collection.mutable.ArrayBuffer.empty[String]
    var expr = baseName
    var cur: DataType = baseType
    var i = 0
    // struct-field steps ride the expression text; each intermediate
    // collection becomes a hidden explode
    while (i < path.length) {
      val seg = path(i)
      cur match {
        case st: StructType =>
          val f = st.fields.find(_.name.equalsIgnoreCase(seg)).get
          expr = s"$expr.$seg"
          cur = f.dataType
        case ArrayType(elem, _) =>
          // more path after an array: `item` enters the element
          val id = nextId()
          views += s"LATERAL VIEW explode($expr) __g$id AS __c$id"
          expr = s"__g$id.__c$id"
          cur = elem
        case MapType(kt, vt, _) =>
          val id = nextId()
          views += s"LATERAL VIEW explode($expr) __g$id AS __k$id, __v$id"
          if (seg.equalsIgnoreCase("key")) { expr = s"__g$id.__k$id"; cur = kt }
          else { expr = s"__g$id.__v$id"; cur = vt }
        case other =>
          throw new IllegalStateException(s"unwalkable $other at $seg")
      }
      i += 1
    }
    // `expr` now denotes the final collection
    cur match {
      case ArrayType(elem, _) =>
        // Impala's pos is BIGINT (`RowBatch` positional slot); Spark's
        // posexplode emits INT, so the inline view re-exposes it cast.
        val id = nextId()
        val fields = elem match {
          case st: StructType => st.fields.filterNot(f =>
            f.name.equalsIgnoreCase("pos") || f.name.equalsIgnoreCase("item"))
          case _ => Array.empty[StructField]
        }
        val structArgs = (Seq(s"'pos', bigint(__p$id)", s"'item', __i$id") ++
          fields.map(f => s"'${f.name}', __i$id.${f.name}")).mkString(", ")
        val outCols = (Seq("pos", "item") ++ fields.map(_.name)).mkString(", ")
        views += s"LATERAL VIEW posexplode($expr) __e$id AS __p$id, __i$id"
        views += s"LATERAL VIEW inline(array(named_struct($structArgs))) " +
          s"$userAlias AS $outCols"
        (views.toSeq, StructType(
          StructField("pos", LongType) +: StructField("item", elem) +:
            fields.toSeq))
      case MapType(kt, vt, _) =>
        views += s"LATERAL VIEW explode($expr) $userAlias AS key, value"
        (views.toSeq, StructType(Seq(
          StructField("key", kt), StructField("value", vt))))
      case other =>
        throw new IllegalStateException(s"non-collection final $other")
    }
  }
}
