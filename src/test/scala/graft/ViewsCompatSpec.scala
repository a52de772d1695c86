package graft

import java.nio.file.{Files, Paths}

/** Replays `views-compatibility.test` (+ the hive3-only variant): the
  * Impala↔Hive view interoperability grid
  * (`tests/metadata/test_views_compatibility.py`). Per block the
  * reference creates the view in BOTH engines and then queries each
  * engine's stored view text from each engine, pinning SUCCESS/FAILURE
  * per step.
  *
  * Here the Impala-side verdicts are REAL — the statement (and, for
  * QUERY_IMPALA_VIEW, the engine's regenerated extended view text from
  * [[ImpalaMeta.expandViewSql]], the ToSqlUtils twin) runs through
  * [[ImpalaDialect.sql]] against the functional fixtures. The Hive
  * side has no engine in the sandbox, so its verdicts come from a
  * documented acceptance model of HiveParser's two relevant gaps:
  * identifiers cannot START with an underscore (HiveLexer `Identifier:
  * (Letter | Digit) (Letter | Digit | '_')*`), and `grouping_id()` is
  * not a Hive function (Hive exposes the `grouping__id` virtual column
  * instead). The hive2-only variant pins Hive 2's hint-in-view
  * rejection (HIVE-21782) — out of scope, the model targets Hive 3
  * like the rest of the repo's Hive twins.
  */
class ViewsCompatSpec extends SparkSpecBase {

  private val dir = Paths.get(sys.env.getOrElse("GRAFT_GOLDEN_FUNC_DIR",
    "/root/reference/testdata/workloads/functional-query/queries/QueryTest"))

  private case class Block(
      createSql: String,
      createRes: Map[String, Boolean],
      queryHive: Option[Map[String, Boolean]],
      queryImpala: Option[Map[String, Boolean]])

  private val sectionRe = """^----\s*([A-Z_]+)\s*$""".r

  private def parseBlocks(text: String): Seq[Block] =
    text.split("(?m)^====\\s*$").toSeq.flatMap { section =>
      var cur: String = null
      val blocks = scala.collection.mutable.Map.empty[String, Vector[String]]
      section.linesIterator.foreach {
        case sectionRe(name) => cur = name; blocks(cur) = Vector.empty
        case l if cur != null && !l.trim.startsWith("#") =>
          blocks(cur) = blocks(cur) :+ l
        case _ =>
      }
      def verdicts(k: String): Option[Map[String, Boolean]] =
        blocks.get(k).map(_.flatMap { l =>
          l.trim.split("=") match {
            case Array(eng, res) if Set("IMPALA", "HIVE")(eng.trim) =>
              Some(eng.trim -> (res.trim == "SUCCESS"))
            case _ => None
          }
        }.toMap)
      blocks.get("CREATE_VIEW").map(_.mkString("\n").trim).filter(_.nonEmpty)
        .map(sql => Block(sql,
          verdicts("CREATE_VIEW_RESULTS").getOrElse(Map.empty),
          verdicts("QUERY_HIVE_VIEW_RESULTS"),
          verdicts("QUERY_IMPALA_VIEW_RESULTS")))
    }

  /** The view body + optional explicit column-alias list. */
  private val createViewRe =
    ("""(?is)^\s*create\s+view\s+([\w.]+)\s*(?:\(([^)]*)\))?\s+as\s+""" +
      """(.*?);?\s*$""").r

  /** Hive 3 acceptance model (see class doc): FAILURE iff the text
    * contains a bare leading-underscore identifier or a grouping_id
    * call.
    */
  private def hiveAccepts(sql: String): Boolean = {
    var i = 0
    var quote: Char = 0
    var ok = true
    while (i < sql.length && ok) {
      val c = sql.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '_' if i == 0 ||
            !(Character.isLetterOrDigit(sql.charAt(i - 1)) ||
              sql.charAt(i - 1) == '_' || sql.charAt(i - 1) == '.') =>
          ok = false
        case _ => i += 1
      }
    }
    ok && !"""(?i)\bgrouping_id\s*\(""".r.findFirstIn(sql).isDefined
  }

  /** Analyze (and lightly execute — limit 0 collect) through the
    * Impala dialect; the fixtures replace the functional db.
    */
  private def impalaAccepts(body: String): Boolean = {
    val stripped = body
      .replaceAll("(?i)\\bfunctional\\.", "")
      .replaceAll("(?i)\\bfunctional_parquet\\.", "")
    try {
      ImpalaDialect.sql(spark, stripped).queryExecution.analyzed
      true
    } catch { case _: Throwable => false }
  }

  private def checkCase(b: Block, label: String): Seq[String] = {
    val errs = scala.collection.mutable.ArrayBuffer.empty[String]
    val m = createViewRe.findFirstMatchIn(b.createSql).getOrElse {
      return Seq(s"$label: unparseable CREATE VIEW: ${b.createSql.take(80)}")
    }
    val aliases = Option(m.group(2)).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))
    val body = m.group(3).trim
    def cmp(step: String, engine: String, expected: Boolean,
        actual: Boolean): Unit =
      if (expected != actual)
        errs += s"$label $step $engine: expected " +
          s"${if (expected) "SUCCESS" else "FAILURE"} got " +
          s"${if (actual) "SUCCESS" else "FAILURE"}\n  ${b.createSql.take(120)}"

    // CREATE in each engine
    val impalaCreate = impalaAccepts(body)
    b.createRes.get("IMPALA").foreach(cmp("create", "IMPALA", _, impalaCreate))
    val hiveCreate = hiveAccepts(b.createSql)
    b.createRes.get("HIVE").foreach(cmp("create", "HIVE", _, hiveCreate))

    // query the HIVE-stored view (Hive stores the original text)
    b.queryHive.foreach { exp =>
      exp.get("IMPALA").foreach(cmp("query-hive-view", "IMPALA", _,
        impalaAccepts(body)))
      exp.get("HIVE").foreach(cmp("query-hive-view", "HIVE", _,
        hiveAccepts(b.createSql)))
    }

    // query the IMPALA-stored view — the engine's regenerated text
    b.queryImpala.foreach { exp =>
      if (impalaCreate) {
        val expanded = ImpalaMeta.expandViewSql("test", "test", aliases,
          body, selfContained = true)
        val expandedBody = expanded.replaceFirst(
          """(?is)^\s*CREATE\s+VIEW\s+\S+\s+AS\s*""", "")
        exp.get("IMPALA").foreach(cmp("query-impala-view", "IMPALA", _,
          impalaAccepts(expandedBody)))
        exp.get("HIVE").foreach(cmp("query-impala-view", "HIVE", _,
          hiveAccepts(expanded)))
      } else errs += s"$label: QUERY_IMPALA_VIEW present but create failed"
    }
    errs.toSeq
  }

  private def run(file: String): (Int, Seq[String]) = {
    val p = dir.resolve(file)
    assume(Files.exists(p), s"$file not present")
    val blocks = parseBlocks(new String(Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8))
    val errs = blocks.zipWithIndex.flatMap { case (b, i) =>
      checkCase(b, s"$file[$i]")
    }
    (blocks.size, errs)
  }

  test("views-compatibility grid matches the reference verdicts") {
    sources.FunctionalTables.register(spark)
    val (n1, e1) = run("views-compatibility.test")
    val (n2, e2) = run("views-compatibility-hive3-only.test")
    val errs = e1 ++ e2
    info(s"view-compat cases: ${n1 + n2} (${errs.size} verdict mismatches)")
    assert(errs.isEmpty, errs.mkString("\n"))
    // floor: the base file's 18 cases + hive3-only's 1
    assert(n1 + n2 >= 19, s"only ${n1 + n2} cases parsed")
  }
}
