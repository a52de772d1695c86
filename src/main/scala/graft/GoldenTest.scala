package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

/** Runner for the reference's golden `.test` workload files
  * (`testdata/workloads/tpch/queries/tpch-q*.test`, format per
  * `tests/common/impala_test_suite.py:494-523`): `====`-delimited
  * sections, each with a `---- QUERY[: name]` block of Impala SQL,
  * a `---- RESULTS` block of golden rows and a `---- TYPES` line.
  *
  * The QUERY text is executed VERBATIM through [[ImpalaDialect.sql]] —
  * this is the run-rate counterpart to DialectCorpusSpec's parse rate.
  * The golden RESULTS rows are bound to the reference's TPC-H load (SF1
  * — e.g. tpch-q1's count_order=1478493) which does not exist in this
  * environment, so value verification runs against the DuckDB oracle
  * over the same substituted fixture (driver correctness gate,
  * `golden_qN` rows) and the RESULTS section is used only for its
  * shape; the TYPES line is checked directly (GoldenTpchSpec).
  */
object GoldenTest {

  /** One QUERY section of a `.test` file. */
  final case class Case(name: String, query: String, types: Seq[String],
      goldenRows: Int)

  /** Parse the `.test` format. Comment lines (`#`) inside the QUERY
    * block are dropped; RESULTS rows are counted, not interpreted.
    */
  def parse(text: String): Seq[Case] = {
    text.split("(?m)^====\\s*$").toSeq.flatMap { section =>
      val lines = section.linesIterator.toSeq
      val qIdx = lines.indexWhere(_.trim.startsWith("---- QUERY"))
      if (qIdx < 0) None
      else {
        val name = lines(qIdx).trim.stripPrefix("---- QUERY")
          .stripPrefix(":").trim
        val rest = lines.drop(qIdx + 1)
        val rIdx = rest.indexWhere(_.trim.startsWith("---- RESULTS"))
        val body = (if (rIdx < 0) rest else rest.take(rIdx))
          .filterNot(_.trim.startsWith("#"))
        val afterResults = if (rIdx < 0) Nil else rest.drop(rIdx + 1)
        val tIdx = afterResults.indexWhere(_.trim.startsWith("---- TYPES"))
        val golden = (if (tIdx < 0) afterResults else afterResults.take(tIdx))
          .count(_.trim.nonEmpty)
        val types =
          if (tIdx < 0 || tIdx + 1 >= afterResults.length) Nil
          else afterResults(tIdx + 1).split(",").toSeq
            .map(_.trim.toLowerCase).filter(_.nonEmpty)
        val query = body.mkString("\n").trim
        if (query.isEmpty) None
        else Some(Case(name, query, types, golden))
      }
    }
  }

  def load(path: Path): Seq[Case] =
    parse(new String(Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8))

  /** Reference workload dir (absent outside the build sandbox — callers
    * must guard on [[available]]).
    */
  val tpchQueryDir: Path = Paths.get(
    sys.env.getOrElse("GRAFT_GOLDEN_TPCH_DIR",
      "/root/reference/testdata/workloads/tpch/queries"))

  def available: Boolean = Files.isDirectory(tpchQueryDir)

  /** First QUERY section of `tpch-qN.test`. */
  def tpchCase(n: Int): Case =
    load(tpchQueryDir.resolve(s"tpch-q$n.test")).head
}
