package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Native snapshot reader for the Hive ACID table directory layout —
  * the storage model behind the reference's full-ACID and insert-only
  * ORC tables (ref: fe/src/main/java/org/apache/impala/util/
  * AcidUtils.java file selection; be/src/exec/hdfs-orc-scanner.h:60
  * row validation; be/src/exec/orc/orc-metadata-utils.h ACID schema).
  *
  * Spark-first mapping: the directory walk is driver-side METADATA
  * (exactly the half Impala runs in its frontend), feeding ONE
  * distributed ORC scan per file class. Full-ACID files carry the
  * five-field transaction wrapper `(operation, originalTransaction,
  * bucket, rowId, currentTransaction, row struct<...>)`; the reader
  * surfaces it as a `row__id` struct column (complex-typed, so Impala
  * star expansion skips it) next to the flattened data columns.
  * Delete deltas apply as a broadcast-sized anti-join on (partition
  * dir, originalTransaction, bucket, rowId); per-row write-id
  * validation (streaming ingests and compacted deltas can carry
  * uncommitted rows) is a codegen'd filter. Pre-upgrade "original"
  * files synthesize their row__id from the file's bucket number and
  * the per-file row index (`_metadata.row_index` plus a footer-derived
  * starting offset per file — no data scan).
  *
  * At 100 TB the shape holds: N files → one pruned columnar scan;
  * the driver walk is O(directories); delete sets broadcast (they are
  * bounded by the mutation volume, not the table).
  */
object AcidFiles {

  /** Snapshot validity (ValidWriteIdList analog): a writeId is
    * committed iff at-or-below the high watermark and neither open nor
    * aborted.
    */
  case class WriteIds(highWatermark: Long, open: Set[Long] = Set.empty,
      aborted: Set[Long] = Set.empty) {
    def committed(w: Long): Boolean =
      w <= highWatermark && !open(w) && !aborted(w)
    def allAborted(min: Long, max: Long): Boolean =
      (min to max).forall(aborted)
  }
  val allCommitted: WriteIds = WriteIds(Long.MaxValue)

  private val baseRe = """base_(\d+)(?:_v\d+)?""".r
  private val deltaRe = """delta_(\d+)_(\d+)(?:_\d+)?(?:_v\d+)?""".r
  private val deleteDeltaRe =
    """delete_delta_(\d+)_(\d+)(?:_\d+)?(?:_v\d+)?""".r

  /** Selected files of one snapshot, classified. */
  case class Selection(inserts: Seq[Path], deletes: Seq[Path],
      originals: Seq[Path])

  private def dataFile(p: Path): Boolean = {
    val n = p.getFileName.toString
    Files.isRegularFile(p) && !n.startsWith(".") && !n.startsWith("_")
  }

  /** AcidUtils.filterFilesForAcidState per leaf directory: the highest
    * committed base wins; deltas and delete-deltas strictly above it
    * survive unless fully aborted (open writeIds are allowed through —
    * streaming deltas carry them, and the per-ROW validation filters
    * their rows); originals (pre-upgrade files outside any base_/
    * delta_ dir) are visible only until a base covers them.
    */
  def select(tableDir: Path, ids: WriteIds = allCommitted): Selection = {
    val inserts = Seq.newBuilder[Path]
    val deletes = Seq.newBuilder[Path]
    val originals = Seq.newBuilder[Path]
    // leaf dirs keyed by their partition prefix (the dir holding the
    // base_/delta_ dirs — the table dir itself when unpartitioned)
    case class Leaf(partDir: Path)
    val byPart = scala.collection.mutable.LinkedHashMap
      .empty[Path, (scala.collection.mutable.ArrayBuffer[(Long, Path)], // bases
        scala.collection.mutable.ArrayBuffer[(Long, Long, Path)],       // deltas
        scala.collection.mutable.ArrayBuffer[(Long, Long, Path)],       // delete deltas
        scala.collection.mutable.ArrayBuffer[Path])]                    // originals
    def slot(part: Path) = byPart.getOrElseUpdate(part,
      (scala.collection.mutable.ArrayBuffer.empty,
        scala.collection.mutable.ArrayBuffer.empty,
        scala.collection.mutable.ArrayBuffer.empty,
        scala.collection.mutable.ArrayBuffer.empty))
    def walk(dir: Path): Unit = {
      val children = {
        val s = Files.list(dir)
        try s.iterator().asScala.toVector.sortBy(_.getFileName.toString)
        finally s.close()
      }
      children.foreach { c =>
        val name = c.getFileName.toString
        if (Files.isDirectory(c)) name match {
          case baseRe(w) =>
            if (ids.committed(w.toLong)) slot(dir)._1 += ((w.toLong, c))
          case deltaRe(min, max) =>
            if (!ids.allAborted(min.toLong, max.toLong))
              slot(dir)._2 += ((min.toLong, max.toLong, c))
          case deleteDeltaRe(min, max) =>
            if (!ids.allAborted(min.toLong, max.toLong))
              slot(dir)._3 += ((min.toLong, max.toLong, c))
          case _ if !name.startsWith(".") && !name.startsWith("_") =>
            walk(c) // partition dir
          case _ =>
        }
        else if (dataFile(c)) slot(dir)._4 += c
      }
    }
    walk(tableDir)
    byPart.foreach { case (_, (bases, ds, dds, origs)) =>
      val maxBase = bases.map(_._1).maxOption.getOrElse(-1L)
      def filesOf(d: Path): Seq[Path] = {
        val s = Files.list(d)
        try s.iterator().asScala.toVector
          .filter(dataFile).sortBy(_.getFileName.toString)
        finally s.close()
      }
      bases.filter(_._1 == maxBase).foreach(b => inserts ++= filesOf(b._2))
      ds.filter(_._2 > maxBase).sortBy(d => (d._1, d._2))
        .foreach(d => inserts ++= filesOf(d._3))
      dds.filter(_._2 > maxBase).sortBy(d => (d._1, d._2))
        .foreach(d => deletes ++= filesOf(d._3))
      if (maxBase < 0) originals ++= origs
    }
    Selection(inserts.result(), deletes.result(), originals.result())
  }

  /** Hive BucketCodec v1: version 1 in the top 3 bits, bucket id in
    * the next 12, statement id in the low 16 (alltypestiny's
    * 536870912 = bucket 0, statement 0).
    */
  def bucketEncode(bucketId: Int, statementId: Int = 0): Int =
    (1 << 29) | (bucketId << 16) | statementId

  private def committedCol(ids: WriteIds)(w: Column): Column = {
    val invalid = (ids.open ++ ids.aborted).toSeq.sorted
    val base = w <= lit(ids.highWatermark)
    if (invalid.isEmpty) base else base && !w.isin(invalid: _*)
  }

  /** Partition-dir prefix of a data file path — the anti-join key
    * component that scopes delete events to their partition. URI
    * scheme slashes normalize (`file:///x` vs `file:/x`) so driver-
    * derived keys compare equal to `_metadata.file_path`-derived ones.
    */
  private def partKeyCol: Column =
    regexp_replace(
      regexp_replace(col("_metadata.file_path"),
        "/(?:base_|delta_|delete_delta_)[^/]*/[^/]*$|/[^/]*$", ""),
      "^file:/+", "file:/")

  private def normalizePartKey(s: String): String =
    s.stripSuffix("/").replaceFirst("^file:/+", "file:/")

  private def withPartCols(df: DataFrame, partCols: StructType,
      pathCol: Column): DataFrame =
    partCols.fields.foldLeft(df) { (d, f) =>
      d.withColumn(f.name,
        regexp_extract(pathCol, s"/${f.name}=([^/]+)", 1).cast(f.dataType))
    }

  /** Full-ACID snapshot read: base + insert deltas, per-row write-id
    * validation, delete-delta anti-join, original-file row__id
    * synthesis. Output columns: data columns, partition columns,
    * `row__id` struct.
    */
  def readFullAcid(spark: SparkSession, dir: String,
      partCols: StructType = new StructType(),
      ids: WriteIds = allCommitted): DataFrame = {
    val sel = select(Paths.get(dir), ids)
    require(sel.inserts.nonEmpty || sel.originals.nonEmpty,
      s"no visible ACID data under $dir")

    // the scan below the barrier always requests the FULL six-column
    // wrapper: orc-core's SchemaEvolution detects the ACID shape by
    // exact field names and re-wraps any pruned subset, misaligning
    // the column vectors (see graft.plans.PruningBarrier)
    def wrappedScan(files: Seq[Path]): DataFrame =
      graft.plans.PruningBarrier(spark,
        spark.read.orc(files.map(_.toString): _*)
          .select(col("operation"), col("originalTransaction"),
            col("bucket"), col("rowId"), col("currentTransaction"),
            col("row"), partKeyCol.as("_gf_part")))

    def flattenWrapped(files: Seq[Path]): Option[DataFrame] =
      if (files.isEmpty) None
      else {
        val raw = wrappedScan(files)
        Some(raw
          .where(committedCol(ids)(col("originalTransaction")))
          .select(
            struct(
              col("operation"),
              col("originalTransaction").as("originaltransaction"),
              col("bucket"),
              col("rowId").as("rowid"),
              col("currentTransaction").as("currenttransaction")
            ).as("row__id"),
            col("_gf_part"),
            col("row"))
          .select(col("row__id"), col("_gf_part"), col("row.*")))
      }

    def synthesizeOriginals(files: Seq[Path]): Option[DataFrame] =
      if (files.isEmpty) None
      else {
        // per-file starting rowid: originals in one directory share a
        // rowid space per bucket, ordered by file name; offsets come
        // from the ORC footers (no data scan). The in-file row index
        // has no ORC metadata column (unlike parquet), so each file is
        // indexed with zipWithIndex — original files are the bounded
        // pre-first-compaction state of an upgraded table.
        val conf = spark.sessionState.newHadoopConf()
        def bucketIdOf(n: String): Int =
          "^(\\d+)_\\d+".r.findFirstMatchIn(n).map(_.group(1).toInt)
            .getOrElse(0)
        val offsets: Map[Path, Long] = files
          .groupBy(f => (f.getParent, bucketIdOf(f.getFileName.toString)))
          .flatMap { case (_, fs) =>
            var off = 0L
            fs.sortBy(_.getFileName.toString).map { f =>
              val r = org.apache.orc.OrcFile.createReader(
                new org.apache.hadoop.fs.Path(f.toUri),
                org.apache.orc.OrcFile.readerOptions(conf))
              val n = try r.getNumberOfRows finally r.close()
              val e = f -> off
              off += n
              e
            }
          }
        val perFile = files.map { f =>
          val df = spark.read.orc(f.toString)
          val indexed = spark.createDataFrame(
            df.rdd.zipWithIndex().map { case (r, i) =>
              org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
            }, df.schema.add("_gf_idx", LongType))
          indexed.select(
            struct(
              lit(0).as("operation"),
              lit(0L).as("originaltransaction"),
              lit(bucketEncode(bucketIdOf(f.getFileName.toString)))
                .as("bucket"),
              (col("_gf_idx") + lit(offsets(f))).as("rowid"),
              lit(0L).as("currenttransaction")
            ).as("row__id"),
            lit(normalizePartKey(f.getParent.toUri.toString))
              .as("_gf_part"),
            col("*")).drop("_gf_idx")
        }
        Some(perFile.reduce(_.unionByName(_)))
      }

    val visible = (flattenWrapped(sel.inserts).toSeq ++
      synthesizeOriginals(sel.originals).toSeq).reduce(_.unionByName(_))

    val afterDeletes =
      if (sel.deletes.isEmpty) visible
      else {
        // a delete event applies only if its own transaction committed.
        // Hive delete deltas may carry a null `row` struct — such files
        // are ACID-shaped and the scan needs the same full-wrapper
        // barrier as insert deltas
        val delRaw0 = spark.read.orc(sel.deletes.map(_.toString): _*)
        val delRaw =
          if (delRaw0.columns.contains("row"))
            graft.plans.PruningBarrier(spark, delRaw0.select(
              col("operation"), col("originalTransaction"), col("bucket"),
              col("rowId"), col("currentTransaction"), col("row"),
              partKeyCol.as("_gf_part")))
          else delRaw0.select(col("originalTransaction"), col("bucket"),
            col("rowId"), col("currentTransaction"),
            partKeyCol.as("_gf_part"))
        val dels = delRaw
          .where(committedCol(ids)(col("currentTransaction")))
          .select(
            col("_gf_part"),
            col("originalTransaction").as("_d_otxn"),
            col("bucket").as("_d_bucket"),
            col("rowId").as("_d_rowid"))
        visible.join(broadcast(dels),
          visible("_gf_part") === dels("_gf_part") &&
            visible("row__id.originaltransaction") === dels("_d_otxn") &&
            visible("row__id.bucket") === dels("_d_bucket") &&
            visible("row__id.rowid") === dels("_d_rowid"),
          "left_anti")
      }

    val withParts = withPartCols(afterDeletes, partCols, col("_gf_part"))
    // data columns, then partition columns, row__id trailing (it is
    // complex-typed, so Impala-shape star expansion skips it)
    val dataCols = withParts.columns
      .filterNot(c => c == "row__id" || c == "_gf_part" ||
        partCols.fieldNames.contains(c))
    withParts.select(
      (dataCols.map(col) ++ partCols.fieldNames.map(col) :+
        col("row__id")).toIndexedSeq: _*)
  }

  /** Insert-only ACID snapshot read: file selection only (no wrapper,
    * no row__id) over whatever format the table stores.
    */
  def readInsertOnly(spark: SparkSession, dir: String,
      format: String = "orc", partCols: StructType = new StructType(),
      ids: WriteIds = allCommitted): DataFrame = {
    val sel = select(Paths.get(dir), ids)
    val files = sel.inserts ++ sel.originals
    require(files.nonEmpty, s"no visible ACID data under $dir")
    val raw = spark.read.format(format).load(files.map(_.toString): _*)
    if (partCols.isEmpty) raw
    else {
      val withP =
        withPartCols(raw, partCols, col("_metadata.file_path"))
      withP.select((raw.columns.map(col) ++
        partCols.fieldNames.map(col)).toIndexedSeq: _*)
    }
  }
}
