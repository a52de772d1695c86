package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Registers the reference environment's LOADED-STATS tables for
  * show-stats.test and hidden-files.test: the data load runs COMPUTE
  * STATS over the functional db (testdata/bin/compute-table-stats.sh),
  * so SHOW TABLE/COLUMN STATS sees populated registries with warehouse
  * dataset locations (`$NAMENODE/test-warehouse/<dataset>/…`).
  *
  * File sizes are modeled from the writers that actually produced the
  * warehouse files:
  *  - the alltypes family: the reference's Java data generator
  *    (`java/datagenerator/.../TestDataGenerator.java`
  *    GenerateAllTypesPartition — `%b` booleans, Java Float/Double
  *    toString, `yyyy-MM-dd HH:mm:ss.S` timestamps with UNPADDED
  *    millisecond values);
  *  - alltypesaggmultifilesnopart: Hive INSERT … SELECT text
  *    (LazySimpleSerDe — `\N` nulls, java.sql.Timestamp.toString
  *    trailing-zero-trimmed fractions), split into four files by
  *    `id % 4` per the schema template's LOAD section.
  * Stats come from the bit-exact COMPUTE STATS path over the same
  * fixture data — the pinned NDVs/sizes reproduce, not transcribe.
  */
object StatsFixtureEnv {

  /** Hive FileUtils.escapePathName for partition directory values. */
  private def escapePath(s: String): String =
    s.flatMap { c =>
      if (c.isLetterOrDigit || "_-".contains(c)) c.toString
      else f"%%${c.toInt}%02X"
    }

  /** One generator-written alltypes row's text bytes
    * (TestDataGenerator.GenerateAllTypesPartition's two format calls).
    * `idx` is the row's 0-based position within its partition: the
    * generator's `yyyy-MM-dd HH:mm:ss.S` prints the millisecond FIELD
    * value unpadded (30 ms → ".30"), and the fixture's stored
    * timestamp carries the re-parse-padded value (".30" reads back as
    * 300 ms) — so the written field is recomputed from the
    * generator's clock recurrence, not taken from the stored value.
    */
  private def generatorRowBytes(r: Row, idx: Int): Long = {
    val d = idx / 10
    val i = idx % 10
    // accumulated real ms at this tuple: d days of (10 min + 450 ms)
    // drift plus i minutes plus 5i(i-1) ms within the day
    val totalMs = (d * 10 + i) * 60000L + d * 450L + 5L * i * (i - 1)
    val msField = (totalMs % 1000).toString // unpadded, "0" when 0
    def txt(name: String): String = r.getAs[Any](name) match {
      case null => "" // writeNulls mode emits the empty string
      case _: java.sql.Timestamp => "" // handled via msField below
      case v => String.valueOf(v)
    }
    val cols = Seq("id", "bool_col", "tinyint_col", "smallint_col",
      "int_col", "bigint_col", "float_col", "double_col",
      "date_string_col", "string_col")
    cols.map(c => txt(c).length.toLong).sum +
      19 + 1 + msField.length + // "yyyy-MM-dd HH:mm:ss" "." ms
      cols.length + 1 // commas + \n
  }

  /** One Hive-text-serde row (LazySimpleSerDe defaults; timestamps
    * per TimestampWritable.toString — fraction trimmed entirely when
    * nanos are zero, unlike java.sql.Timestamp's ".0").
    */
  private def hiveRowBytes(r: Row, cols: Seq[String]): Long = {
    def txt(name: String): String = r.getAs[Any](name) match {
      case null => "\\N"
      case t: java.sql.Timestamp =>
        if (t.getNanos == 0) t.toString.take(19) else t.toString
      case v => String.valueOf(v)
    }
    cols.map(c => txt(c).length.toLong).sum + cols.length
  }

  private def partitioned(df: DataFrame, partCols: Seq[String])
      : (StructType, StructType, Seq[(Seq[String], Seq[Row])]) = {
    val dataCols = StructType(df.schema.fields.filterNot(f =>
      partCols.exists(_.equalsIgnoreCase(f.name))))
    val pCols = StructType(partCols.flatMap(p =>
      df.schema.fields.find(_.name.equalsIgnoreCase(p))))
    val rows = df.collect().toSeq
    val groups = rows.groupBy(r =>
        partCols.map(p => String.valueOf(r.getAs[Any](p))))
      .toSeq.sortBy(_._1.map(v => f"${v.toInt}%08d").mkString)
    (dataCols, pCols, groups)
  }

  /** hidden-files.test: an alltypes clone whose 2010/1 dir holds the
    * one visible generator file (the runner's hidden ._/.tmp/.copying
    * copies are invisible to both engines) and whose 2010/2 dir holds
    * only hidden files (tests/metadata/test_hidden_files.py).
    */
  def registerHiddenFiles(spark: SparkSession): Unit = {
    import ImpalaStats.{Model, Partition}
    val at = spark.table("alltypes")
    val (atData, atParts, _) = partitioned(at, Seq("year", "month"))
    val vis = at.where("year = 2010 and month = 1")
    val visRows = vis.collect().toSeq.sortBy(_.getAs[Int]("id"))
    val bytes = visRows.zipWithIndex
      .map { case (r, i) => generatorRowBytes(r, i) }.sum
    val parts = Seq(
      Partition(Seq(Some("2010"), Some("1")), Seq(bytes), "TEXT",
        "$NAMENODE/test-warehouse/test_hidden_files/year=2010/month=1"),
      Partition(Seq(Some("2010"), Some("2")), Nil, "TEXT",
        "$NAMENODE/test-warehouse/test_hidden_files/year=2010/month=2"))
    ImpalaStats.register(Model("test_hidden_files", () => atData,
      () => atParts, () => parts, () => vis))
    vis.createOrReplaceTempView("test_hidden_files")
  }

  /** set.test: alltypesagg's partition listing (10 day partitions +
    * the NULL-day partition) feeds the partition-key-scan explain
    * synthesis (`constant-operands=11`).
    */
  def registerAlltypesAgg(spark: SparkSession): Unit = {
    import ImpalaStats.{Model, Partition}
    val agg = spark.table("alltypesagg")
    val dataCols = StructType(agg.schema.fields.filterNot(f =>
      Seq("year", "month", "day").contains(f.name.toLowerCase)))
    val pCols = StructType(agg.schema.fields.filter(f =>
      Seq("year", "month", "day").contains(f.name.toLowerCase)))
    val keys = agg.select("year", "month", "day").distinct().collect()
      .toSeq.map(r => Seq(Option(r.get(0)).map(String.valueOf(_)),
        Option(r.get(1)).map(String.valueOf(_)),
        Option(r.get(2)).map(String.valueOf(_))))
      .sortBy(_.map(_.getOrElse("")).mkString("/"))
    val parts = keys.map { k =>
      // the reference loader writes ONE text file per day partition,
      // named yymmdd.txt (100101.txt …); the NULL-day partition holds
      // Hive's 000000_0 (SHOW FILES pins the basenames; sizes are
      // regex cells). 1000 generator rows ≈ 81KB in the text model.
      val file = k(2) match {
        case Some(d) => f"1001${d.toInt}%02d.txt"
        case None => "000000_0"
      }
      Partition(k, Seq(81 * 1024L), "TEXT",
        "$NAMENODE/test-warehouse/alltypesagg/" +
          s"year=${k(0).getOrElse("NULL")}/month=${k(1).getOrElse("NULL")}" +
          s"/day=${k(2).getOrElse("__HIVE_DEFAULT_PARTITION__")}",
        Seq(file))
    }
    ImpalaStats.register(Model("alltypesagg", () => dataCols,
      () => pCols, () => parts, () => agg))
  }

  def register(spark: SparkSession): Unit = {
    import ImpalaStats.{Model, Partition}

    // ---- alltypes: TEXT, partitioned, stats loaded ----
    val at = spark.table("alltypes")
    val (atData, atParts, atGroups) = partitioned(at, Seq("year", "month"))
    val atPartList = atGroups.map { case (k, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("id"))
      Partition(k.map(Some(_)),
        Seq(sorted.zipWithIndex
          .map { case (r, i) => generatorRowBytes(r, i) }.sum), "TEXT",
        s"$$NAMENODE/test-warehouse/alltypes/year=${k(0)}/month=${k(1)}")
    }
    ImpalaStats.register(Model("alltypes", () => atData, () => atParts,
      () => atPartList, () => at))
    ImpalaStats.computeStats(spark, "alltypes", incremental = false)

    // ---- alltypesaggmultifilesnopart: unpartitioned, 4 files ----
    val agg = spark.table("alltypesaggmultifilesnopart")
    val aggRows = agg.collect().toSeq
    val aggCols = agg.schema.fields.map(_.name).toSeq
    val aggBytes = (0 until 4).map(m =>
      aggRows.filter(_.getAs[Int]("id") % 4 == m)
        .map(hiveRowBytes(_, aggCols)).sum)
    ImpalaStats.register(Model("alltypesaggmultifilesnopart",
      () => agg.schema, () => new StructType(),
      () => Seq(Partition(Nil, aggBytes, "TEXT",
        "$NAMENODE/test-warehouse/alltypesaggmultifilesnopart")),
      () => agg))
    ImpalaStats.computeStats(spark, "alltypesaggmultifilesnopart",
      incremental = false)

    // ---- alltypesmixedformat: per-partition formats, no stats ----
    val mixed = spark.table("alltypesmixedformat")
    val (mxData, mxParts, mxGroups) =
      partitioned(mixed, Seq("year", "month"))
    val fmts = Seq("TEXT", "SEQUENCE_FILE", "RC_FILE", "PARQUET")
    val mxPartList = mxGroups.zipWithIndex.map { case ((k, rs), i) =>
      // the SIZE cells are regex-pinned; the text byte model stands in
      // for the legacy row formats' sizes
      val sorted = rs.sortBy(_.getAs[Int]("id"))
      Partition(k.map(Some(_)),
        Seq(sorted.zipWithIndex
          .map { case (r, j) => generatorRowBytes(r, j) }.sum), fmts(i),
        s"$$NAMENODE/test-warehouse/alltypesmixedformat/year=${k(0)}/month=${k(1)}")
    }
    ImpalaStats.register(Model("alltypesmixedformat", () => mxData,
      () => mxParts, () => mxPartList, () => mixed))

    // ---- functional_parquet.alltypes: parquet twin, no stats ----
    // real file sizes: one partitioned single-file-per-dir parquet
    // write of the fixture (SIZE cells are regex-pinned, #FILES is 1)
    val pqDir = java.nio.file.Files
      .createTempDirectory("graft-stats-pq").toString
    at.coalesce(1).write.mode("overwrite")
      .partitionBy("year", "month").parquet(pqDir)
    val pqPartList = atGroups.map { case (k, _) =>
      val d = java.nio.file.Paths.get(pqDir,
        s"year=${k(0)}", s"month=${k(1)}")
      val s = java.nio.file.Files.list(d)
      val bytes =
        try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator())
          .asScala.filter(_.getFileName.toString.endsWith(".parquet"))
          .map(java.nio.file.Files.size).toSeq
        finally s.close()
      Partition(k.map(Some(_)), bytes, "PARQUET",
        s"$$NAMENODE/test-warehouse/alltypes_parquet/year=${k(0)}/month=${k(1)}")
    }
    ImpalaStats.register(Model("functional_parquet.alltypes",
      () => atData, () => atParts, () => pqPartList, () => at))

    // ---- allcomplextypes: complex-typed columns, no stats/parts ----
    val act = spark.table("allcomplextypes")
    val actData = StructType(act.schema.fields.filterNot(f =>
      Seq("year", "month").contains(f.name.toLowerCase)))
    val actParts = StructType(act.schema.fields.filter(f =>
      Seq("year", "month").contains(f.name.toLowerCase)))
    ImpalaStats.register(Model("allcomplextypes", () => actData,
      () => actParts, () => Seq.empty, () => act))

    // ---- part_strings_with_quotes (IMPALA-7784): quote-valued
    // partitions, stats loaded, %-escaped directory names ----
    val quoteVals = Seq("\"", "'", "\\\"", "\\'")
    val pswSchema = StructType(Seq(StructField("i", IntegerType),
      StructField("p", StringType)))
    val pswData = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          quoteVals.map(v => Row(1, v))).asJava), pswSchema)
    val pswParts = quoteVals.map { v =>
      Partition(Seq(Some(v)), Seq(2L /* "1\n" */), "TEXT",
        "$NAMENODE/test-warehouse/part_strings_with_quotes/p=" +
          escapePath(v))
    }
    ImpalaStats.register(Model("part_strings_with_quotes",
      () => StructType(pswSchema.fields.take(1)),
      () => StructType(pswSchema.fields.drop(1)),
      () => pswParts, () => pswData))
    ImpalaStats.computeStats(spark, "part_strings_with_quotes",
      incremental = false)
  }
}
