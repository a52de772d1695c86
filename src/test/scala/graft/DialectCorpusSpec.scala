package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Measures the dialect shim against the reference's OWN query corpus
  * (`testdata/workloads/.../queries/` .test files — QueryTest, tpch,
  * tpcds): every SELECT/WITH/VALUES statement is pushed
  * through [[ImpalaDialect]]'s rewrites and must parse under Spark's
  * grammar. Parse-only (the corpus references catalog tables that don't
  * exist here); the point is pinning the measured dialect-coverage
  * number instead of arguing it.
  *
  * Guarded: skips when the reference checkout isn't present.
  */
class DialectCorpusSpec extends SparkSpecBase {

  private val corpusRoots = Seq(
    "/root/reference/testdata/workloads/functional-query/queries/QueryTest",
    "/root/reference/testdata/workloads/tpch/queries",
    "/root/reference/testdata/workloads/tpcds/queries")

  /** `---- QUERY` block bodies, `#` comment lines dropped. */
  private def extractQueries(file: Path): Seq[String] = {
    val lines = Files.readAllLines(file).asScala
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var cur: scala.collection.mutable.ArrayBuffer[String] = null
    lines.foreach { line =>
      if (line.startsWith("---- QUERY")) {
        cur = scala.collection.mutable.ArrayBuffer.empty[String]
      } else if (line.startsWith("----") || line.startsWith("====")) {
        if (cur != null && cur.nonEmpty) out += cur.mkString("\n")
        cur = null
      } else if (cur != null && !line.trim.startsWith("#")) {
        cur += line
      }
    }
    if (cur != null && cur.nonEmpty) out += cur.mkString("\n")
    out.toSeq
  }

  test("reference query corpus: dialect shim parse rate") {
    assume(Files.isDirectory(Paths.get(corpusRoots.head)),
      "reference corpus not present")
    val statements = corpusRoots.flatMap { root =>
      Files.list(Paths.get(root)).iterator().asScala
        .filter(_.toString.endsWith(".test")).toSeq.sortBy(_.toString)
        .flatMap(extractQueries)
    }
      // query tier only: DDL/DML/session statements are driver-dependent
      .map(_.trim).filter { s =>
        val l = s.toLowerCase
        l.startsWith("select") || l.startsWith("with") || l.startsWith("values")
      }
      // test-runner variables (`$DATABASE`, `$UNIQUE_DB`, …) → identifier
      .map(_.replaceAll("""\$\{?[A-Za-z_]\w*\}?""", "tvar"))
      // single statement per parse call
      .map(s => s.stripSuffix(";"))
      .filterNot(_.contains(";"))

    assert(statements.size >= 200, s"corpus too small: ${statements.size}")
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var ok = 0
    statements.foreach { s =>
      val rewritten =
        try ImpalaDialect.rewrite(s)
        catch { case e: Throwable => failures += ((s, "rewrite: " + e.getMessage)); "" }
      if (rewritten.nonEmpty) {
        try {
          org.apache.spark.sql.graft.Bridge.parsePlan(spark, rewritten)
          ok += 1
        } catch {
          case e: Throwable =>
            failures += ((s, Option(e.getMessage).getOrElse("?").take(120)))
        }
      }
    }
    val rate = ok.toDouble / statements.size
    info(f"dialect corpus: $ok/${statements.size} parsed (${rate * 100}%.1f%%)")
    failures.take(15).foreach { case (s, m) =>
      info(s"MISS: ${s.replaceAll("\\s+", " ").take(100)} => $m")
    }
    // measured 99.7% on 3136 statements (round 4; was 97.6% in r3 before
    // the VALUES-row-alias / quoted-alias / column-INTERVAL / set-op-
    // branch rewrites). The 8-statement tail is: 4 error-path statements
    // (varchar(-1), DATE "not a date" — Impala errors on these too) and
    // 4 nanosecond/overflow INTERVALs (Spark's timestamp is µs — the
    // documented SURVEY §7.4 precision delta).
    assert(rate >= 0.985, f"parse rate ${rate * 100}%.1f%% below pinned floor")
  }
}
