package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native reader for Iceberg tables in the HadoopTables layout —
  * the metadata chain the reference's scan planner walks
  * (`fe/src/main/java/org/apache/impala/planner/IcebergScanNode.java`,
  * Iceberg spec v1):
  *
  *   `metadata/version-hint.text` → `vN.metadata.json` →
  *   current snapshot's manifest-LIST (avro) → manifest files (avro)
  *   → live data files (manifest-entry status ≠ DELETED) → parquet/orc.
  *
  * No Iceberg runtime needed: the manifests are plain Avro (read with
  * Spark's avro source) and the metadata JSON parses with Jackson.
  * Paths inside the metadata carry the table's ORIGINAL location —
  * they rebase onto the local table directory.
  *
  * Scale shape: the metadata walk is driver-side (a handful of small
  * files); the data read is one `spark.read.parquet(files…)` over the
  * live file list, so pruning/pushdown work as for any parquet scan.
  * Scope: v1 append-only tables (no positional/equality deletes).
  */
object IcebergFiles {

  /** Driver-side read of one small Avro metadata file (manifest list /
    * manifest) — avro-core, no spark-avro module needed.
    */
  private def avroRecords(path: String)
      : Seq[org.apache.avro.generic.GenericRecord] = {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(path), new GenericDatumReader[GenericRecord]())
    try {
      val buf = scala.collection.mutable.ArrayBuffer.empty[GenericRecord]
      while (reader.hasNext) buf += reader.next()
      buf.toSeq
    } finally reader.close()
  }

  def readTable(spark: SparkSession, dir: String): DataFrame = {
    val metaDir = Paths.get(dir, "metadata")
    val hint = new String(
      Files.readAllBytes(metaDir.resolve("version-hint.text"))).trim
    val metaFile = metaDir.resolve(s"v$hint.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readAllBytes(metaFile))
    val location = meta.get("location").asText()
    val currentId = meta.get("current-snapshot-id").asLong()

    def rebase(p: String): String = {
      val i = p.indexOf(location)
      if (i >= 0) dir + p.substring(i + location.length)
      else dir + "/" + p.dropWhile(_ == '/')
    }

    val snapshots = meta.get("snapshots")
    var manifestList: String = null
    (0 until snapshots.size()).foreach { i =>
      val s = snapshots.get(i)
      if (s.get("snapshot-id").asLong() == currentId)
        manifestList = s.get("manifest-list").asText()
    }
    require(manifestList != null,
      s"current snapshot $currentId not found in $metaFile")

    val manifests = avroRecords(rebase(manifestList))
      .map(r => rebase(String.valueOf(r.get("manifest_path"))))
    // manifest entry status: 0 EXISTING, 1 ADDED, 2 DELETED
    val files = manifests.flatMap(avroRecords).flatMap { r =>
      val status = r.get("status").asInstanceOf[Int]
      if (status == 2) None
      else {
        val df = r.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        // the manifest entry carries each file's format — a mixed
        // parquet/orc table is legal in the spec, so trust the entry,
        // not the path extension
        Some((rebase(String.valueOf(df.get("file_path"))),
          String.valueOf(df.get("file_format")).toUpperCase))
      }
    }
    require(files.nonEmpty, s"no live data files under $dir")
    val byFormat = files.groupBy(_._2).toSeq.sortBy(_._1).map {
      case ("ORC", fs) => spark.read.orc(fs.map(_._1).toIndexedSeq: _*)
      case (_, fs) => spark.read.parquet(fs.map(_._1).toIndexedSeq: _*)
    }
    byFormat.reduce(_.unionByName(_))
  }
}
