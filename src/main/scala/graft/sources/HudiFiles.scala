package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native reader for Hudi copy-on-write tables — the file-slice
  * selection the reference's HUDI_PARQUET format performs
  * (`fe/src/main/java/org/apache/impala/util/HudiUtil.java`,
  * IMPALA-8778): a base-file name is
  * `<fileId>_<writeToken>_<commitTime>.parquet`; for each (partition,
  * fileId) group only the slice of the LATEST completed commit
  * (`.hoodie/<ts>.commit` markers) is live — reading the directory as
  * plain parquet instead yields every superseded slice (duplicate
  * records), which hudi-parquet.test's `hudi_as_parquet` twin pins.
  *
  * The listing/selection is a driver-side walk; the data read is one
  * parquet scan over the selected files (basePath keeps the
  * `year=/month=/day=` directory partition columns for the
  * partitioned table shape).
  */
object HudiFiles {

  private def parquetFiles(dir: Path): Seq[Path] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Path]
    val walk = Files.walk(dir)
    try walk.iterator().asScala.foreach { p =>
      val s = p.toString
      if (s.endsWith(".parquet") && !s.contains("/.hoodie")) out += p
    } finally walk.close()
    out.toSeq
  }

  private def completedCommits(dir: Path): Set[String] = {
    val list = Files.list(dir.resolve(".hoodie"))
    try list.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".commit"))
      .map(_.stripSuffix(".commit")).toSet
    finally list.close()
  }

  /** The latest live slice per (partition dir, fileId). */
  def liveFiles(dirStr: String): Seq[String] = {
    val dir = Paths.get(dirStr)
    val commits = completedCommits(dir)
    parquetFiles(dir)
      .flatMap { p =>
        val name = p.getFileName.toString.stripSuffix(".parquet")
        val parts = name.split("_")
        if (parts.length < 3) None
        else {
          val commitTs = parts.last
          if (commits.nonEmpty && !commits.contains(commitTs)) None
          else Some(((p.getParent.toString, parts.head), commitTs, p))
        }
      }
      .groupBy(_._1)
      .map { case (_, slices) => slices.maxBy(_._2)._3.toString }
      .toSeq.sorted
  }

  /** COW snapshot read; `partitioned` keeps the key=value directory
    * columns in the schema.
    */
  def readTable(spark: SparkSession, dir: String,
      partitioned: Boolean): DataFrame = {
    val files = liveFiles(dir)
    require(files.nonEmpty, s"no live hudi slices under $dir")
    if (partitioned)
      spark.read.option("basePath", dir).parquet(files: _*)
    else spark.read.parquet(files: _*)
  }

  /** Every base file regardless of slice — the "read it as plain
    * parquet" duplicate-records shape.
    */
  def readAsPlainParquet(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(
      parquetFiles(Paths.get(dir)).map(_.toString): _*)
}
