package graft.queries

import graft.GraftSession
import org.apache.spark.sql.SparkSession

/** One substituted catalog table: a derivation SELECT over the raw
  * fixture tables. `sparkSql`/`duckSql` are usually the same ANSI text;
  * they differ only where the engines name a function differently
  * (e.g. day-name rendering).
  */
final case class Sub(table: String, sparkSql: String, duckSql: String)

object Sub {
  def apply(table: String, sql: String): Sub = Sub(table, sql, sql)
}

/** A deterministic substituted catalog shared by BOTH engines: Spark
  * sees it as temp views under the target names (so reference SQL runs
  * verbatim), DuckDB sees it as `_g` CTEs spliced around the same query
  * text — identical data on both sides, which is what lets the driver's
  * oracle gate value-verify verbatim reference SQL (GoldenQueries,
  * TpcdsGoldenQueries).
  */
final class SubstitutionCatalog(val subs: Seq[Sub]) {

  /** Register as Spark temp views. All derivation frames are resolved
    * against the RAW fixture views first (DataFrames hold resolved
    * plans), then the views are replaced — substitutions never see each
    * other.
    */
  def register(spark: SparkSession, dir: String): Unit = {
    GraftSession.registerAll(spark, dir)
    val frames = subs.map { s => s.table -> spark.sql(s.sparkSql) }
    frames.foreach { case (n, df) => df.createOrReplaceTempView(n) }
  }

  /** Like [[register]], but the derivation frames are written to
    * parquet once per fixture dir and served from disk. Load-bearing
    * where a derivation's expression is too large for codegen (the
    * TPC-DS item CASE vocabulary exceeds janino's method limit inside
    * q41's plan, forcing interpreted evaluation): a parquet-backed view
    * keeps every downstream plan fully codegen'd — and it is the 100 TB
    * shape anyway (dimensions are materialized tables, not inline
    * CASE pyramids).
    */
  def registerMaterialized(spark: SparkSession, dir: String,
      cacheRoot: String): Unit = synchronized {
    import java.nio.file.{Files, Paths}
    GraftSession.registerAll(spark, dir)
    val leaf = Paths.get(dir).getFileName.toString
    val root = s"$cacheRoot/$leaf"
    if (!Files.exists(Paths.get(root, "_SUCCESS_ALL"))) {
      Files.createDirectories(Paths.get(root))
      val frames = subs.map { s => s.table -> spark.sql(s.sparkSql) }
      frames.foreach { case (n, df) =>
        df.write.mode("overwrite").parquet(s"$root/$n")
      }
      Files.createFile(Paths.get(root, "_SUCCESS_ALL"))
    }
    subs.foreach { s =>
      spark.read.parquet(s"$root/${s.table}").createOrReplaceTempView(s.table)
    }
  }

  // longest-first so e.g. `partsupp` wins over `part`
  private val token =
    ("\\b(" + subs.map(_.table).sortBy(t => -t.length).mkString("|") + ")\\b").r

  /** DuckDB oracle for a verbatim reference query: substituted tables
    * become `_g` CTEs over the raw parquet views and the query's table
    * tokens are rewritten to the CTE names; a leading WITH in the query
    * merges into the CTE list.
    */
  def oracleSql(query: String): String = {
    val ctes = subs
      .map(s => s"${s.table}_g AS (${s.duckSql.replace("\n", " ")})")
      .mkString(",\n")
    // quote/comment-aware: a table name inside a string literal (e.g.
    // 'Customer%Complaints') must NOT be rewritten — only the DuckDB
    // side sees this text, so a literal rewrite would silently diverge
    // the two engines' inputs
    val (_, inLiteral) = graft.ImpalaDialect.depthMap(query)
    val body = token.replaceAllIn(query, m =>
      if (inLiteral(m.start)) java.util.regex.Matcher.quoteReplacement(m.matched)
      else m.group(1) + "_g")
    val trimmed = body.trim
    if (trimmed.toLowerCase.startsWith("with"))
      s"WITH $ctes,\n${trimmed.drop(4).trim}"
    else
      s"WITH $ctes\n$trimmed"
  }

  /** Rendering-normalization shared by the golden-query gate rows: both
    * engines project positionally-renamed columns (c0..cK) cast per the
    * golden `---- TYPES` line — the analog of the reference harness's
    * stringified row compare (impala_test_suite.py). Needed because the
    * engines surface identical VALUES under different wire types
    * (DuckDB client: DECIMAL→float64, integer SUM→HUGEINT→float).
    */
  def normTypes(types: Seq[String]): Seq[String] = types.map {
    case "decimal" | "double" | "float" => "double"
    case "bigint" | "int" | "smallint" | "tinyint" => "bigint"
    case _ => "string"
  }

  /** Build one oracle-gated Q.Def from a golden case: Spark runs the
    * text verbatim through the dialect over the substituted views;
    * DuckDB runs the rewritten text; both normalize through c0..cK.
    */
  def goldenDef(name: String, c: graft.GoldenTest.Case,
      decimalCols: Map[Int, Int] = Map.empty): Q.Def = {
    val query = c.query.stripSuffix(";")
    goldenDefVia(name, c, c.types, (s, dir) => {
      register(s, dir)
      graft.ImpalaDialect.sql(s, query)
    }, decimalCols)
  }

  /** Like [[goldenDef]] but with an arbitrary Spark-side runner —
    * used by the nested TPC-H gate, where Spark executes the NESTED
    * golden text over the nested catalog while DuckDB replays the FLAT
    * golden text (`oracleCase`) over the raw parquet: the nested
    * workload is defined to produce the flat answers
    * (testdata/bin/load_nested.py derives one schema from the other).
    *
    * `decimalCols` pins named columns to DECIMAL(38,s) on BOTH engines
    * instead of DOUBLE — closing the avg/division representation gap
    * (Spark: exact decimal at its result scale; DuckDB: avg/division
    * of decimals is DOUBLE) that kept q1/q8/q14/q17 out of the gate.
    */
  def goldenDefVia(name: String, oracleCase: graft.GoldenTest.Case,
      types: Seq[String],
      run: (SparkSession, String) => org.apache.spark.sql.DataFrame,
      decimalCols: Map[Int, Int] = Map.empty,
      dateCols: Set[Int] = Set.empty): Q.Def = {
    val norm = normTypes(types)
    val aliases = norm.indices.map("c" + _)
    val duckCasts = norm.zipWithIndex.map { case (t, i) =>
      // dateCols: the Spark side renders a date-only string (nested
      // schema), the flat oracle a midnight TIMESTAMP — truncate
      if (dateCols(i)) s"CAST(CAST(c$i AS DATE) AS VARCHAR) AS c$i"
      else {
        val d = decimalCols.get(i) match {
          case Some(s) => s"DECIMAL(38,$s)"
          case None => if (t == "string") "VARCHAR" else t.toUpperCase
        }
        s"CAST(c$i AS $d) AS c$i"
      }
    }.mkString(", ")
    val oracle =
      s"SELECT $duckCasts FROM (\n${oracleSql(oracleCase.query.stripSuffix(";"))}\n) g(${aliases.mkString(", ")})"
    Q.Def(name, (s, dir) => {
      val df = run(s, dir)
      df.select(norm.zipWithIndex.map { case (t, i) =>
        val target = decimalCols.get(i) match {
          case Some(sc) => s"decimal(38,$sc)"
          case None => t
        }
        org.apache.spark.sql.functions.col(df.columns(i)).cast(target).as(s"c$i")
      }: _*)
    }, Some(oracle))
  }
}
