package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{AcidFiles, AcidLayout}

/** Replays the acid golden files' Hive-side state effects (the
  * HIVE_QUERY blocks the reference runs via beeline, plus Impala-side
  * DML on transactional tables) against REAL ACID directory layouts:
  * each statement writes actual base/delta/delete-delta dirs through
  * [[AcidLayout]] and the registered views read them back through
  * [[AcidFiles]] — the library is exercised end-to-end; this class
  * only sequences writeIds and parses the statements, the way the
  * reference's test runner drives live Hive.
  */
class AcidSim(spark: SparkSession) {

  private case class Table(
      dir: Path,
      var schema: StructType,          // data columns
      partCols: Seq[(String, DataType)],
      var transactional: Boolean,
      var insertOnly: Boolean,
      var nextWriteId: Long = 1L,
      var origFileCount: Int = 0,
      var compactionV: Long = 100L,
      var statsAccurate: Boolean = false)

  private val wh = Files.createTempDirectory("graft-acid-sim")
  private val tables = scala.collection.mutable.LinkedHashMap
    .empty[String, Table]
  // never reused across reset(): a recreated table must not see a
  // previous incarnation's delta dirs
  private var dirSeq = 0
  private def freshDir(name: String): Path = {
    dirSeq += 1
    val d = wh.resolve(s"${name.toLowerCase}_$dirSeq")
    deleteContents(d)
    Files.createDirectories(d)
    d
  }

  def reset(): Unit = {
    tables.keys.foreach(n =>
      scala.util.Try(spark.catalog.dropTempView(n)))
    tables.clear()
  }

  private def partStruct(t: Table): StructType =
    StructType(t.partCols.map { case (n, dt) => StructField(n, dt) })

  private def register(name: String): Unit = {
    val t = tables(name)
    val sel = AcidFiles.select(t.dir)
    val df =
      if (sel.inserts.isEmpty && sel.originals.isEmpty) {
        val full = StructType(t.schema.fields ++ partStruct(t).fields)
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), full)
      } else if (t.transactional && !t.insertOnly)
        AcidFiles.readFullAcid(spark, t.dir.toString, partStruct(t))
      else
        AcidFiles.readInsertOnly(spark, t.dir.toString, "orc",
          partStruct(t))
    df.createOrReplaceTempView(name)
  }

  // ---- statement shapes ----
  private val createRe =
    ("""(?is)^\s*create\s+(?:external\s+)?table\s+(?:if\s+not\s+exists\s+)?([A-Za-z_]\w*)""" +
      """\s*\(([^)]*)\)\s*(?:partitioned\s+by\s*\(([^)]*)\))?""" +
      """\s*(?:stored\s+as\s+(\w+))?\s*(?:tblproperties\s*\((.*)\))?\s*$""").r
  private val ctasRe =
    ("""(?is)^\s*create\s+table\s+(?:if\s+not\s+exists\s+)?([A-Za-z_]\w*)""" +
      """\s*(?:partitioned\s+by\s*\(([^)]*)\))?\s*(?:stored\s+as\s+(\w+))?""" +
      """\s*tblproperties\s*\(([^)]*)\)\s*as\s+(select\b.*)$""").r
  private val insertRe =
    ("""(?is)^\s*insert\s+(into|overwrite)\s+(?:table\s+)?([A-Za-z_]\w*)""" +
      """\s*(?:partition\s*\(([^)]*)\))?\s*(values\b.*|select\b.*|with\b.*)$""").r
  private val deleteRe =
    """(?is)^\s*delete\s+from\s+([A-Za-z_]\w*)(?:\s+where\s+(.*))?\s*$""".r
  private val updateRe =
    """(?is)^\s*update\s+([A-Za-z_]\w*)\s+set\s+(.*?)(?:\s+where\s+(.*))?\s*$""".r
  private val alterPropsRe =
    ("""(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)\s+set\s+tblproperties""" +
      """\s*\((.*)\)\s*$""").r
  private val compactRe =
    ("""(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)""" +
      """(?:\s+partition\s*\(([^)]*)\))?\s+compact\s+""" +
      """['"](major|minor)['"](?:\s+and\s+wait)?\s*$""").r
  private val truncateRe =
    """(?is)^\s*truncate\s+(?:table\s+)?([A-Za-z_]\w*)\s*$""".r
  private val dropRe =
    """(?is)^\s*drop\s+table\s+(?:if\s+exists\s+)?([A-Za-z_]\w*)\s*(?:purge\s*)?$""".r
  private val refreshRe =
    """(?is)^\s*(?:refresh|invalidate\s+metadata)\s+([A-Za-z_]\w*)\s*$""".r
  // ADD PARTITION is metadata-only here — partition dirs materialize
  // on insert (clear-statsaccurate's Hive-side setup)
  private val addPartNoopRe =
    ("""(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)\s+add\s+""" +
      """(?:if\s+not\s+exists\s+)?partition\s*\(.*\)\s*$""").r
  private val analyzeRe =
    ("""(?is)^\s*analyze\s+table\s+([\w.$]+)\s*""" +
      """(?:partition\s*\([^)]*\)\s*)?compute\s+statistics\b.*$""").r
  private val loadRe =
    ("""(?is)^\s*load\s+data\s+inpath\s+'([^']+)'\s+(overwrite\s+)?""" +
      """into\s+table\s+([A-Za-z_]\w*)""" +
      """\s*(?:partition\s*\(([^)]*)\))?\s*$""").r
  private val addPartRe =
    ("""(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)\s+add\s+""" +
      """(?:if\s+not\s+exists\s+)?partition\s*\(.*\)\s*$""").r

  private def transactionalProps(props: String): (Boolean, Boolean) = {
    val p = props.toLowerCase
    val trans =
      """'transactional'\s*=\s*'true'""".r.findFirstIn(p).isDefined
    val insertOnly =
      """'transactional_properties'\s*=\s*'insert_only'""".r
        .findFirstIn(p).isDefined
    (trans, trans && insertOnly)
  }

  private def parseCols(txt: String): Seq[(String, DataType)] =
    txt.split(",").map(_.trim).filter(_.nonEmpty).map { c =>
      val parts = c.split("\\s+", 2)
      (parts(0),
        org.apache.spark.sql.types.DataType.fromDDL(
          parts(1).replaceAll("(?i)comment\\s+'[^']*'", "").trim))
    }.toIndexedSeq

  /** Evaluate an INSERT source + partition spec into a full-row frame
    * (data columns then partition columns, cast to the table types).
    */
  private def insertFrame(t: Table, partTxt: String,
      sourceTxt: String): DataFrame = {
    val entries = Option(partTxt).getOrElse("").split(",")
      .map(_.trim).filter(_.nonEmpty).toSeq
    val static = entries.filter(_.contains("=")).map { e =>
      val Array(k, v) = e.split("=", 2); k.trim.toLowerCase -> v.trim
    }.toMap
    val dynParts = entries.filterNot(_.contains("=")).map(_.toLowerCase)
    val src = ImpalaDialect.sql(spark,
      if (sourceTxt.trim.toLowerCase.startsWith("values"))
        s"SELECT * FROM ($sourceTxt)"
      else sourceTxt).coalesce(1)
    // positional binding: data columns first, then dynamic partitions
    val targets = t.schema.fields.map(f => (f.name, f.dataType)) ++
      t.partCols.filter(p => dynParts.contains(p._1.toLowerCase))
    val out = src.select(targets.zipWithIndex.map { case ((n, dt), i) =>
      col(src.columns(i)).cast(dt).as(n)
    }.toIndexedSeq: _*)
    t.partCols.foldLeft(out) { case (d, (n, dt)) =>
      if (d.columns.exists(_.equalsIgnoreCase(n))) d
      else d.withColumn(n,
        expr(static.getOrElse(n.toLowerCase, "NULL")).cast(dt))
    }
  }

  private def snapshot(name: String): DataFrame = spark.table(name)

  /** True when the statement was handled (state mutated, views fresh). */
  def exec(stmt: String): Boolean = stmt match {
    case createRe(name, cols, parts, stored, props) =>
      val (trans, insertOnly) =
        transactionalProps(Option(props).getOrElse(""))
      // claim every simple CREATE in a sim file: a plain table here
      // may be promoted to ACID by a later ALTER (upgrade paths)
      val t = Table(freshDir(name),
        StructType(parseCols(cols).map { case (n, d) =>
          StructField(n, d) }),
        Option(parts).map(parseCols).getOrElse(Nil),
        trans, insertOnly)
      tables(name.toLowerCase) = t
      register(name.toLowerCase)
      true
    case ctasRe(name, parts, stored, props, select) =>
      val (trans, insertOnly) = transactionalProps(props)
      if (!trans) return false
      val src = ImpalaDialect.sql(spark, select)
      // CTAS partition clauses carry NAMES only — types resolve from
      // the select (Hive CTAS semantics)
      val partNames = Option(parts).getOrElse("").split(",")
        .map(_.trim).filter(_.nonEmpty).toSeq.map { n =>
          (n, src.schema.fields.find(_.name.equalsIgnoreCase(n))
            .map(_.dataType).getOrElse(IntegerType))
        }
      val t = Table(freshDir(name),
        StructType(src.schema.fields.filterNot(f =>
          partNames.exists(_._1.equalsIgnoreCase(f.name)))),
        partNames, trans, insertOnly)
      tables(name.toLowerCase) = t
      writeRows(t, src, overwrite = false)
      register(name.toLowerCase)
      true
    case insertRe(mode, name, parts, source)
        if tables.contains(name.toLowerCase) =>
      val t = tables(name.toLowerCase)
      val df = insertFrame(t, parts, source)
      val overwrite = mode.equalsIgnoreCase("overwrite")
      val static = Option(parts).getOrElse("").split(",")
        .map(_.trim).filter(_.contains("="))
      if (overwrite && static.nonEmpty && df.isEmpty) {
        // a STATIC-partition overwrite from an empty source still
        // clears the partition (Hive writes an empty base there)
        val pd = static.foldLeft(t.dir) { (d, e) =>
          val Array(k, v) = e.split("=", 2)
          d.resolve(s"${k.trim}=${v.trim}")
        }
        AcidLayout.writeTruncate(spark, pd, t.schema, t.nextWriteId,
          wrapped = t.transactional && !t.insertOnly, padded = false)
        t.nextWriteId += 1
      } else writeRows(t, df, overwrite)
      register(name.toLowerCase)
      true
    case deleteRe(name, pred) if tables.contains(name.toLowerCase) =>
      val t = tables(name.toLowerCase)
      val victims = snapshot(name.toLowerCase)
        .where(Option(pred).getOrElse("true"))
      val keys = victims.select(
        (t.partCols.map(p => col(p._1)) ++ Seq(
          col("row__id.originaltransaction").as("originalTransaction"),
          col("row__id.bucket").as("bucket"),
          col("row__id.rowid").as("rowId"))): _*)
      AcidLayout.writeDelete(spark, t.dir, keys, t.nextWriteId,
        t.partCols.map(_._1))
      t.nextWriteId += 1
      register(name.toLowerCase)
      true
    case updateRe(name, sets, pred) if tables.contains(name.toLowerCase) =>
      val t = tables(name.toLowerCase)
      val victims = snapshot(name.toLowerCase)
        .where(Option(pred).getOrElse("true"))
      val keys = victims.select(
        (t.partCols.map(p => col(p._1)) ++ Seq(
          col("row__id.originaltransaction").as("originalTransaction"),
          col("row__id.bucket").as("bucket"),
          col("row__id.rowid").as("rowId"))): _*)
      val assigns = sets.split(",").map(_.trim).map { a =>
        val Array(k, v) = a.split("=", 2); k.trim.toLowerCase -> v.trim
      }.toMap
      val newRows = victims.select(
        (t.schema.fields.map(f =>
          assigns.get(f.name.toLowerCase)
            .map(e => expr(e).cast(f.dataType).as(f.name))
            .getOrElse(col(f.name))) ++
          t.partCols.map(p => col(p._1))).toIndexedSeq: _*)
      val wid = t.nextWriteId
      AcidLayout.writeDelete(spark, t.dir, keys, wid,
        t.partCols.map(_._1))
      AcidLayout.writeInsert(spark, t.dir, newRows, wid, wid,
        t.partCols.map(_._1))
      t.nextWriteId = wid + 1
      register(name.toLowerCase)
      true
    case alterPropsRe(name, props) if tables.contains(name.toLowerCase) =>
      val t = tables(name.toLowerCase)
      val (trans, insertOnly) = transactionalProps(props)
      if (trans) { t.transactional = true; t.insertOnly = insertOnly }
      register(name.toLowerCase)
      true
    case compactRe(name, partSpec, kind)
        if tables.contains(name.toLowerCase) =>
      val t = tables(name.toLowerCase)
      // a partition-scoped compaction rewrites only that partition
      val snap = Option(partSpec).filter(_.trim.nonEmpty)
        .map(spec => snapshot(name.toLowerCase).where(
          spec.split(",").map(_.trim).mkString(" AND ")))
        .getOrElse(snapshot(name.toLowerCase))
      val wid = math.max(t.nextWriteId - 1, 1)
      AcidLayout.writeCompactedBase(spark, t.dir, snap, wid,
        t.compactionV, t.partCols.map(_._1))
      t.compactionV += 1
      register(name.toLowerCase)
      true
    case truncateRe(name) if tables.contains(name.toLowerCase) =>
      val t = tables(name.toLowerCase)
      if (t.partCols.nonEmpty) {
        // per-partition empty bases (Hive truncates each partition)
        val parts = snapshot(name.toLowerCase)
          .select(t.partCols.map(p => col(p._1)): _*).distinct().collect()
        parts.foreach { r =>
          val pd = t.partCols.zipWithIndex.foldLeft(t.dir) {
            case (d, ((n, _), i)) => d.resolve(s"$n=${r.get(i)}")
          }
          AcidLayout.writeTruncate(spark, pd, t.schema, t.nextWriteId,
            wrapped = t.transactional && !t.insertOnly, padded = false)
        }
      } else
        AcidLayout.writeTruncate(spark, t.dir, t.schema, t.nextWriteId,
          wrapped = t.transactional && !t.insertOnly, padded = false)
      t.nextWriteId += 1
      t.statsAccurate = false // Hive truncate drops COLUMN_STATS_ACCURATE
      register(name.toLowerCase)
      true
    case dropRe(name) if tables.contains(name.toLowerCase) =>
      tables.remove(name.toLowerCase)
      scala.util.Try(spark.catalog.dropTempView(name.toLowerCase))
      true
    case addPartNoopRe(name) if tables.contains(name.toLowerCase) =>
      true
    case refreshRe(name) if tables.contains(name.toLowerCase) =>
      register(name.toLowerCase)
      true
    case analyzeRe(name) =>
      // Hive ANALYZE sets COLUMN_STATS_ACCURATE on the table (SHOW
      // CREATE TABLE's row_regex probe; truncate clears it)
      tables.get(name.split('.').last.toLowerCase)
        .foreach(_.statsAccurate = true)
      true
    case loadRe(path, ow, name, partSpec)
        if tables.contains(name.toLowerCase) =>
      execLoad(path, ow != null, name.toLowerCase, Option(partSpec))
    case addPartRe(name) if tables.contains(name.toLowerCase) =>
      // an empty partition is invisible to every data read here (the
      // reference surfaces it only via SHOW PARTITIONS metadata)
      true
    case _ => false
  }

  private def bare(name: String): String =
    name.split('.').last.toLowerCase

  def has(name: String): Boolean = tables.contains(bare(name))

  /** Live table listing (SHOW TABLES over the sim's test db). */
  def tableNames: Seq[String] = tables.keys.toSeq

  /** SHOW FILES rows (path, size, partition): the current snapshot's
    * VISIBLE files (AcidFiles.select — a base hides older deltas, like
    * the reference's file listing), spelled with the managed-warehouse
    * prefix the goldens pin (after their $NAMENODE/$MANAGED_WAREHOUSE
    * variable substitution).
    */
  def showFiles(name: String): Option[Seq[(String, String, String)]] =
    tables.get(bare(name)).map { t =>
      val sel = AcidFiles.select(t.dir)
      (sel.inserts ++ sel.deletes ++ sel.originals).map { p =>
        val rel = t.dir.relativize(p).toString.replace('\\', '/')
        val part = rel.split('/').takeWhile(_.contains('=')).mkString("/")
        (s"/test-warehouse/managed/acidsim.db/${bare(name)}/$rel",
          graft.ImpalaStats.printBytes(Files.size(p)), part)
      }
    }

  /** SHOW CREATE TABLE text — column list, storage and tblproperties
    * (the goldens' COLUMN_STATS_ACCURATE row_regex probes).
    */
  def showCreate(name: String): Option[String] =
    tables.get(bare(name)).map { t =>
      val props = Seq(
        Option.when(t.transactional)("'transactional'='true'"),
        Option.when(t.insertOnly)(
          "'transactional_properties'='insert_only'"),
        Option.when(t.statsAccurate)(
          "'COLUMN_STATS_ACCURATE'='{\"BASIC_STATS\":\"true\"}'")
      ).flatten
      val cols = t.schema.fields.map(f =>
        s"  ${f.name} ${graft.functions.DsResolve.typeName(f.dataType)}")
        .mkString(",\n")
      val partClause =
        if (t.partCols.isEmpty) ""
        else t.partCols.map { case (n, dt) =>
          s"$n ${graft.functions.DsResolve.typeName(dt)}" }
          .mkString("\nPARTITIONED BY (\n  ", ",\n  ", "\n)")
      s"CREATE TABLE ${bare(name)} (\n$cols\n)$partClause\n" +
        s"STORED AS ORC\nTBLPROPERTIES (${props.mkString(", ")})"
    }

  // ---- LOAD DATA INPATH (tests/metadata/test_load.py environment) ----
  // staging dir N -> (rows, consumed): a load MOVES the files, so each
  // staged source serves exactly once
  private val staging =
    scala.collection.mutable.Map.empty[String, (DataFrame, Boolean)]

  /** load.test's python-side environment: test_load (LIKE alltypes,
    * partitioned) + test_load_nopart (LIKE alltypesnopart) + staging
    * dirs 1-3 (one alltypes 2010/1 text file each) and 4-5 (the four
    * alltypesaggmultifiles 2010/1/1 files).
    */
  def prepareLoadFixtures(): Unit = {
    val at = spark.table("alltypes")
    val dataCols = at.columns.filterNot(c => c == "year" || c == "month")
    exec("create table test_load (" +
      dataCols.map(c => s"$c " +
        at.schema(c).dataType.sql).mkString(", ") +
      ") partitioned by (year int, month int)")
    exec("create table test_load_nopart (" +
      dataCols.map(c => s"$c " +
        at.schema(c).dataType.sql).mkString(", ") + ")")
    val at2010 = at.where(col("year") === 2010 && col("month") === 1)
      .select(dataCols.map(col).toIndexedSeq: _*)
    (1 to 3).foreach(i => staging(i.toString) = (at2010, false))
    val agg = scala.util.Try(spark.table("alltypesagg")).toOption
    agg.foreach { a =>
      val rows = a.where(col("year") === 2010 && col("month") === 1 &&
          col("day") === 1)
        .select(dataCols.map(col).toIndexedSeq: _*)
      (4 to 5).foreach(i => staging(i.toString) = (rows, false))
    }
  }

  /** A LOAD moves files: staged sources serve once; loading a file out
    * of another sim table's partition drains that partition; a table
    * loading its own directory is a data no-op.
    */
  private def execLoad(rawPath: String, overwrite: Boolean,
      name: String, partSpec: Option[String]): Boolean = {
    val t = tables(name)
    val stagingKeyRe = """test_load_staging/(\d+)""".r
    val tablePathRe = """test-warehouse/([A-Za-z_]\w*)(/[^']*)?$""".r
    val static = partSpec.getOrElse("").split(",").map(_.trim)
      .filter(_.contains("=")).map { e =>
        val Array(k, v) = e.split("=", 2); k.trim -> v.trim
      }.toSeq
    def targetDir: Path = static.foldLeft(t.dir) { case (d, (k, v)) =>
      d.resolve(s"$k=$v")
    }
    val rows: Option[DataFrame] =
      stagingKeyRe.findFirstMatchIn(rawPath) match {
        case Some(m) =>
          staging.get(m.group(1)) match {
            case Some((df, false)) =>
              staging(m.group(1)) = (df, true); Some(df)
            case _ => None // already moved
          }
        case None => tablePathRe.findFirstMatchIn(rawPath) match {
          case Some(m) if m.group(1).toLowerCase == name =>
            // self-load: files move out and back — data unchanged
            register(name); return true
          case Some(m) if tables.contains(m.group(1).toLowerCase) =>
            val src = tables(m.group(1).toLowerCase)
            val sub = Option(m.group(2)).getOrElse("")
            val partFilter = """([A-Za-z_]\w*)=([^/]+)""".r
              .findAllMatchIn(sub).map(mm =>
                col(mm.group(1)) === lit(mm.group(2))).toSeq
            val snap = spark.table(m.group(1).toLowerCase)
            val picked = partFilter.foldLeft(snap)(_ where _)
            val out = Some(picked.select(
              snap.columns.filterNot(c =>
                src.partCols.exists(_._1.equalsIgnoreCase(c)))
                .map(col).toIndexedSeq: _*))
            // the files MOVE out of the source partition
            val srcDir = """([A-Za-z_]\w*=[^/]+)""".r
              .findAllMatchIn(sub).map(_.group(1))
              .foldLeft(src.dir)((d, seg) => d.resolve(seg))
            // materialize to local rows BEFORE the source files move
            // (a cached plan could still recompute from deleted files)
            val materialized = out.map { df =>
              val rows = df.collect().toSeq
              spark.createDataFrame(
                scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava,
                df.schema)
            }
            deleteContents(srcDir)
            register(m.group(1).toLowerCase)
            materialized
          case _ => None
        }
      }
    rows match {
      case None => true // nothing staged (already consumed) — no-op
      case Some(df) =>
        if (overwrite) { deleteContents(targetDir) }
        val suffix =
          if (t.origFileCount == 0) "000000_0"
          else s"000000_0_copy_${t.origFileCount}"
        t.origFileCount += 1
        val full = static.foldLeft(df) { case (d, (k, v)) =>
          val dt = t.partCols.find(_._1.equalsIgnoreCase(k))
            .map(_._2).getOrElse(StringType)
          d.withColumn(k, expr(v).cast(dt))
        }
        AcidLayout.writeOriginal(spark, t.dir, full,
          t.partCols.map(_._1), suffix)
        register(name)
        true
    }
  }

  private def writeRows(t: Table, df: DataFrame,
      overwrite: Boolean): Unit = {
    val wid = t.nextWriteId
    if (!t.transactional) {
      // plain table: original files (promotable later); an overwrite
      // clears only the partitions the data lands in (Hive overwrite
      // semantics), the whole dir when unpartitioned
      if (overwrite) {
        if (t.partCols.isEmpty) { deleteContents(t.dir); t.origFileCount = 0 }
        else df.select(t.partCols.map(p => col(p._1)): _*).distinct()
          .collect().foreach { r =>
            val pd = t.partCols.zipWithIndex.foldLeft(t.dir) {
              case (d, ((n, _), i)) => d.resolve(s"$n=${r.get(i)}")
            }
            deleteContents(pd)
          }
      }
      val suffix =
        if (t.origFileCount == 0) "000000_0"
        else s"000000_0_copy_${t.origFileCount}"
      t.origFileCount += 1
      AcidLayout.writeOriginal(spark, t.dir, df,
        t.partCols.map(_._1), suffix)
    } else if (t.insertOnly)
      AcidLayout.writeInsertOnly(spark, t.dir, df, wid,
        t.partCols.map(_._1), asBase = overwrite, padded = false)
    else
      AcidLayout.writeInsert(spark, t.dir, df, wid, wid,
        t.partCols.map(_._1), asBase = overwrite, padded = false)
    if (t.transactional) t.nextWriteId = wid + 1
  }

  private def deleteContents(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      val cs = try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.toVector
      } finally s.close()
      cs.foreach { c => deleteContents(c); Files.deleteIfExists(c) }
    }
  }
}
