package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Writer for the Iceberg HadoopTables layout — the producing half of
  * [[IcebergFiles]]. Emits the spec's metadata chain for v1
  * append-only tables: `metadata/vN.metadata.json` +
  * `version-hint.text`, snapshot manifest LISTS and manifests as
  * plain Avro, and parquet/orc data files under `data/`.
  *
  * The reference creates/commits through the Iceberg runtime
  * (`fe/src/main/java/org/apache/impala/service/CatalogOpExecutor.java`
  * createIcebergTable; `IcebergCatalogOpExecutor.java` appendFiles);
  * here the chain is written directly from its public spec — no
  * Iceberg jar exists in the sandbox. Paths inside the metadata carry
  * the table's MODEL location (e.g. an hdfs:// URI) exactly as a real
  * writer would; [[IcebergFiles.readTable]] rebases them onto the
  * local directory.
  *
  * Scale shape: all metadata writes are driver-side small files; data
  * files are written by a normal distributed Spark job. Commit is a
  * single version-file swap, as in the spec.
  */
object IcebergLayout {

  private val mapper = new ObjectMapper()

  /** One partition-spec field. Transform text uses Impala's SHOW
    * PARTITIONS spelling (`IDENTITY`, `BUCKET 1000`, `TRUNCATE 10`,
    * `HOUR`, `DAY`, `MONTH`, `YEAR`); names follow Iceberg's derived
    * field naming (`fe/.../util/IcebergUtil.java` getPartitionSpec).
    */
  final case class PartField(sourceId: Int, fieldId: Int, name: String,
      transform: String)

  /** Parse Impala's `PARTITION BY SPEC (col TRANSFORM[ ARG], …)` body
    * against the table schema (source ids are 1-based top-level
    * column positions, field ids start at 1000).
    */
  def parseSpec(specTxt: String, schema: StructType): Seq[PartField] = {
    val cols = schema.fields.map(_.name.toLowerCase)
    specTxt.split(",").map(_.trim).filter(_.nonEmpty).zipWithIndex
      .map { case (ent, i) =>
        val toks = ent.split("\\s+")
        val col = toks(0).toLowerCase
        val kind = toks(1).toUpperCase
        val arg = if (toks.length > 2) Some(toks(2)) else None
        val sourceId = cols.indexOf(col) + 1
        require(sourceId > 0, s"unknown partition source column $col")
        val (name, transform) = kind match {
          case "IDENTITY" => (col, "IDENTITY")
          case "BUCKET" => (s"${col}_bucket", s"BUCKET ${arg.get}")
          case "TRUNCATE" => (s"${col}_trunc", s"TRUNCATE ${arg.get}")
          case "HOUR" | "HOURS" => (s"${col}_hour", "HOUR")
          case "DAY" | "DAYS" => (s"${col}_day", "DAY")
          case "MONTH" | "MONTHS" => (s"${col}_month", "MONTH")
          case "YEAR" | "YEARS" => (s"${col}_year", "YEAR")
          case other => (col, other)
        }
        PartField(sourceId, 1000 + i, name, transform)
      }.toSeq
  }

  private def specTransformJson(t: String): String = t match {
    case "IDENTITY" => "identity"
    case "HOUR" => "hour"
    case "DAY" => "day"
    case "MONTH" => "month"
    case "YEAR" => "year"
    case b if b.startsWith("BUCKET") => s"bucket[${b.split(' ')(1)}]"
    case tr if tr.startsWith("TRUNCATE") =>
      s"truncate[${tr.split(' ')(1)}]"
    case other => other.toLowerCase
  }

  private def transformFromJson(t: String): String = t match {
    case "identity" => "IDENTITY"
    case "hour" => "HOUR"
    case "day" => "DAY"
    case "month" => "MONTH"
    case "year" => "YEAR"
    case b if b.startsWith("bucket[") =>
      s"BUCKET ${b.stripPrefix("bucket[").stripSuffix("]")}"
    case tr if tr.startsWith("truncate[") =>
      s"TRUNCATE ${tr.stripPrefix("truncate[").stripSuffix("]")}"
    case other => other.toUpperCase
  }

  // ---- schema JSON (spec: "Schemas" — ids assigned depth-first) ----

  private def typeJson(dt: DataType, nextId: () => Int): Object = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date"
    case TimestampType | TimestampNTZType => "timestamp"
    case StringType | _: CharType | _: VarcharType => "string"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case s: StructType =>
      val o = mapper.createObjectNode()
      o.put("type", "struct")
      val fields = o.putArray("fields")
      s.fields.foreach { f =>
        val fo = fields.addObject()
        fo.put("id", nextId())
        fo.put("name", f.name)
        fo.put("required", false)
        fo.set[com.fasterxml.jackson.databind.node.ObjectNode]("type", toNode(typeJson(f.dataType, nextId))): Unit
      }
      o
    case a: ArrayType =>
      val o = mapper.createObjectNode()
      o.put("type", "list")
      o.put("element-id", nextId())
      o.put("element-required", false)
      o.set[com.fasterxml.jackson.databind.node.ObjectNode]("element", toNode(typeJson(a.elementType, nextId))): Unit
      o
    case m: MapType =>
      val o = mapper.createObjectNode()
      o.put("type", "map")
      o.put("key-id", nextId())
      o.put("value-id", nextId())
      o.put("value-required", false)
      o.set[com.fasterxml.jackson.databind.node.ObjectNode]("key", toNode(typeJson(m.keyType, nextId))): Unit
      o.set[com.fasterxml.jackson.databind.node.ObjectNode]("value", toNode(typeJson(m.valueType, nextId))): Unit
      o
    case other =>
      throw new IllegalArgumentException(s"iceberg type for $other")
  }

  private def toNode(v: Object): com.fasterxml.jackson.databind.JsonNode =
    v match {
      case s: String =>
        com.fasterxml.jackson.databind.node.TextNode.valueOf(s)
      case n: com.fasterxml.jackson.databind.JsonNode => n
    }

  private def schemaJson(schema: StructType): ObjectNode = {
    // top-level fields take ids 1..n, nested ids follow (the order
    // Iceberg's TypeUtil.assignFreshIds produces)
    var next = schema.fields.length
    val nextId = () => { next += 1; next }
    val o = mapper.createObjectNode()
    o.put("type", "struct")
    o.put("schema-id", 0)
    val fields = o.putArray("fields")
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val fo = fields.addObject()
      fo.put("id", i + 1)
      fo.put("name", f.name)
      fo.put("required", false)
      fo.set[com.fasterxml.jackson.databind.node.ObjectNode]("type", toNode(typeJson(f.dataType, nextId))): Unit
    }
    o
  }

  private def sparkTypeOf(n: com.fasterxml.jackson.databind.JsonNode)
      : DataType =
    if (n.isTextual) n.asText() match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "timestamp" | "timestamptz" => TimestampType
      case "string" | "uuid" => StringType
      case "binary" => BinaryType
      case d if d.startsWith("decimal") =>
        val Array(p, s) = d.stripPrefix("decimal(").stripSuffix(")")
          .split(",").map(_.trim.toInt)
        DecimalType(p, s)
      case other =>
        throw new IllegalArgumentException(s"iceberg type $other")
    } else n.get("type").asText() match {
      case "struct" =>
        StructType(n.get("fields").elements().asScala.map { f =>
          StructField(f.get("name").asText(), sparkTypeOf(f.get("type")))
        }.toSeq)
      case "list" => ArrayType(sparkTypeOf(n.get("element")))
      case "map" =>
        MapType(sparkTypeOf(n.get("key")), sparkTypeOf(n.get("value")))
    }

  // ------------------------------------------------------------------

  private def currentMeta(dir: Path): Option[(Int, ObjectNode)] = {
    val hintFile = dir.resolve("metadata/version-hint.text")
    if (!Files.exists(hintFile)) None
    else {
      val v = new String(Files.readAllBytes(hintFile)).trim.toInt
      Some((v, mapper.readTree(Files.readAllBytes(
        dir.resolve(s"metadata/v$v.metadata.json"))).asInstanceOf[ObjectNode]))
    }
  }

  def exists(dir: Path): Boolean =
    Files.exists(dir.resolve("metadata/version-hint.text"))

  /** The table's current logical schema (empty-table reads, DESCRIBE
    * of externally-resolved tables).
    */
  def schemaOf(dir: Path): StructType = {
    val (_, meta) = currentMeta(dir).getOrElse(
      throw new IllegalStateException(s"no iceberg table at $dir"))
    sparkTypeOf(schemaNode(meta)).asInstanceOf[StructType]
  }

  private def schemaNode(meta: ObjectNode)
      : com.fasterxml.jackson.databind.JsonNode =
    if (meta.has("schema")) meta.get("schema")
    else {
      val cur = meta.get("current-schema-id").asInt()
      meta.get("schemas").elements().asScala
        .find(_.get("schema-id").asInt() == cur).get
    }

  /** The table's partition spec as SHOW PARTITIONS rows
    * (specId=0, sourceId, fieldId, name, transform).
    */
  def specOf(dir: Path): Seq[PartField] = {
    val (_, meta) = currentMeta(dir).getOrElse(return Nil)
    val specNode =
      if (meta.has("partition-spec")) meta.get("partition-spec")
      else meta.get("partition-specs").get(0).get("fields")
    specNode.elements().asScala.map { f =>
      PartField(f.get("source-id").asInt(), f.get("field-id").asInt(),
        f.get("name").asText(),
        transformFromJson(f.get("transform").asText()))
    }.toSeq
  }

  def propertiesOf(dir: Path): Map[String, String] =
    currentMeta(dir) match {
      case Some((_, meta)) if meta.has("properties") =>
        meta.get("properties").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
      case _ => Map.empty
    }

  /** Snapshot history, oldest first:
    * (timestampMs, snapshotId, parentId, isCurrent).
    */
  def history(dir: Path): Seq[(Long, Long, Option[Long], Boolean)] =
    currentMeta(dir) match {
      case None => Nil
      case Some((_, meta)) =>
        val cur =
          if (meta.has("current-snapshot-id"))
            meta.get("current-snapshot-id").asLong()
          else -1L
        if (!meta.has("snapshots")) Nil
        else meta.get("snapshots").elements().asScala.map { s =>
          (s.get("timestamp-ms").asLong(), s.get("snapshot-id").asLong(),
            Option(s.get("parent-snapshot-id")).map(_.asLong()),
            s.get("snapshot-id").asLong() == cur)
        }.toSeq.sortBy(_._1)
    }

  /** Live data files of the current snapshot: (modelPath, localPath,
    * format, sizeBytes).
    */
  def dataFiles(dir: Path): Seq[(String, String, String, Long)] = {
    val (_, meta) = currentMeta(dir).getOrElse(return Nil)
    if (!meta.has("current-snapshot-id") ||
        meta.get("current-snapshot-id").asLong() < 0) return Nil
    val location = meta.get("location").asText()
    val currentId = meta.get("current-snapshot-id").asLong()
    def rebase(p: String): String = {
      val i = p.indexOf(location)
      if (i >= 0) dir.toString + p.substring(i + location.length)
      else dir.toString + "/" + p.dropWhile(_ == '/')
    }
    val manifestList = meta.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong() == currentId)
      .map(_.get("manifest-list").asText())
      .getOrElse(return Nil)
    val manifests = avroRecords(rebase(manifestList))
      .map(r => String.valueOf(r.get("manifest_path")))
    manifests.flatMap(m => avroRecords(rebase(m))).flatMap { r =>
      if (r.get("status").asInstanceOf[Int] == 2) None
      else {
        val df = r.get("data_file")
          .asInstanceOf[org.apache.avro.generic.GenericRecord]
        val p = String.valueOf(df.get("file_path"))
        Some((p, rebase(p),
          String.valueOf(df.get("file_format")).toUpperCase,
          df.get("file_size_in_bytes").asInstanceOf[Long]))
      }
    }
  }

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

  // ------------------------------------------------------------------

  /** Create an empty table: v1 metadata + version hint. `location` is
    * the MODEL location recorded inside the metadata; `dir` is where
    * the files physically land.
    */
  def create(dir: Path, location: String, schema: StructType,
      spec: Seq[PartField], props: Map[String, String]): Unit = {
    Files.createDirectories(dir.resolve("metadata"))
    val meta = mapper.createObjectNode()
    meta.put("format-version", 1)
    meta.put("table-uuid",
      java.util.UUID.nameUUIDFromBytes(location.getBytes).toString)
    meta.put("location", location)
    meta.put("last-updated-ms", 0L)
    meta.put("last-column-id", schema.fields.length)
    meta.set[com.fasterxml.jackson.databind.node.ObjectNode]("schema", schemaJson(schema)): Unit
    val specArr = mapper.createArrayNode()
    spec.foreach { f =>
      val fo = specArr.addObject()
      fo.put("name", f.name)
      fo.put("transform", specTransformJson(f.transform))
      fo.put("source-id", f.sourceId)
      fo.put("field-id", f.fieldId): Unit
    }
    meta.set[ObjectNode]("partition-spec", specArr)
    meta.put("default-spec-id", 0)
    val specs = meta.putArray("partition-specs")
    val s0 = specs.addObject()
    s0.put("spec-id", 0)
    s0.set[ObjectNode]("fields", specArr.deepCopy())
    val propsNode = meta.putObject("properties")
    props.foreach { case (k, v) => propsNode.put(k, v): Unit }
    meta.put("current-snapshot-id", -1L)
    meta.putArray("snapshots")
    writeVersion(dir, 1, meta)
  }

  private def writeVersion(dir: Path, v: Int, meta: ObjectNode): Unit = {
    Files.write(dir.resolve(s"metadata/v$v.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(meta))
    Files.write(dir.resolve("metadata/version-hint.text"),
      String.valueOf(v).getBytes)
  }

  /** Rewrite the current schema (ALTER TABLE ADD COLUMNS — a new
    * metadata version with the evolved schema, data files untouched).
    */
  def setSchema(dir: Path, schema: StructType): Unit = {
    val (v, meta) = currentMeta(dir).get
    meta.set[com.fasterxml.jackson.databind.node.ObjectNode]("schema", schemaJson(schema)): Unit
    meta.put("last-column-id", schema.fields.length)
    writeVersion(dir, v + 1, meta)
  }

  def setProperties(dir: Path, props: Map[String, String]): Unit = {
    val (v, meta) = currentMeta(dir).get
    val node =
      if (meta.has("properties"))
        meta.get("properties").asInstanceOf[ObjectNode]
      else meta.putObject("properties")
    props.foreach { case (k, v2) => node.put(k, v2): Unit }
    writeVersion(dir, v + 1, meta)
  }

  // ---- manifest avro schemas (spec "Manifests"; the fields the
  // reader consumes plus the required bookkeeping columns) ----

  private val dataFileAvro = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"r2","fields":[
      |{"name":"file_path","type":"string","field-id":100},
      |{"name":"file_format","type":"string","field-id":101},
      |{"name":"record_count","type":"long","field-id":103},
      |{"name":"file_size_in_bytes","type":"long","field-id":104}
      |]}""".stripMargin)

  private val manifestEntryAvro = new org.apache.avro.Schema.Parser().parse(
    s"""{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int","field-id":0},
      |{"name":"snapshot_id","type":"long","field-id":1},
      |{"name":"data_file","type":${dataFileAvro.toString},"field-id":2}
      |]}""".stripMargin)

  private val manifestFileAvro = new org.apache.avro.Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string","field-id":500},
      |{"name":"manifest_length","type":"long","field-id":501},
      |{"name":"partition_spec_id","type":"int","field-id":502},
      |{"name":"added_snapshot_id","type":"long","field-id":503}
      |]}""".stripMargin)

  /** Row count from a data file's own footer (parquet metadata / ORC
    * tail) — no scan job.
    */
  private def footerRowCount(p: Path, format: String): Long = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val hp = new org.apache.hadoop.fs.Path(p.toUri)
    if (format == "orc") {
      val r = org.apache.orc.OrcFile.createReader(hp,
        org.apache.orc.OrcFile.readerOptions(conf))
      try r.getNumberOfRows finally r.close()
    } else {
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(hp, conf))
      try r.getRecordCount finally r.close()
    }
  }

  private def writeAvro(path: Path, schema: org.apache.avro.Schema,
      records: Seq[org.apache.avro.generic.GenericRecord]): Long = {
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    try records.foreach(w.append) finally w.close()
    Files.size(path)
  }

  /** Append `df` as a new snapshot: data files + manifest + manifest
    * list + new metadata version. Returns the row count written.
    */
  def append(spark: SparkSession, dir: Path, df: DataFrame): Long = {
    val (v, meta) = currentMeta(dir).getOrElse(
      throw new IllegalStateException(s"no iceberg table at $dir"))
    val location = meta.get("location").asText()
    val format = propertiesOf(dir)
      .getOrElse("write.format.default",
        propertiesOf(dir).getOrElse("iceberg.file_format", "parquet"))
      .toLowerCase
    // write through a spark job, then move the part files into data/
    val tmp = Files.createTempDirectory(dir, "_stage")
    if (format == "orc") df.write.mode("overwrite").orc(tmp.toString)
    else df.write.mode("overwrite").parquet(tmp.toString)
    val dataDir = dir.resolve("data")
    Files.createDirectories(dataDir)
    val parts = {
      val s = Files.list(tmp)
      try s.iterator().asScala.filter { p =>
        val nm = p.getFileName.toString
        nm.endsWith(".parquet") || nm.endsWith(".orc")
      }.toVector.sortBy(_.getFileName.toString)
      finally s.close()
    }
    val snapId = history(dir).map(_._2).foldLeft(0L)(math.max) + 1
    val ext = if (format == "orc") "orc" else "parq"
    val moved = parts.zipWithIndex.map { case (p, i) =>
      val name = f"${java.util.UUID.nameUUIDFromBytes(
        s"$location/$snapId/$i".getBytes)}%s-$i%04d.0.$ext"
      val dest = dataDir.resolve(name)
      Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
      dest
    }
    deleteRecursively(tmp)

    // per-file record counts from the file footers (metadata-only, no
    // extra scan) — each manifest entry must carry ITS file's rows for
    // the chain to stay spec-faithful when Spark emits multiple parts
    val fileRows = moved.map(p => p -> footerRowCount(p, format)).toMap
    val n = fileRows.values.sum

    import org.apache.avro.generic.GenericData
    val entries = moved.map { p =>
      val fileRec = new GenericData.Record(dataFileAvro)
      fileRec.put("file_path", s"$location/data/${p.getFileName}")
      fileRec.put("file_format", format.toUpperCase)
      fileRec.put("record_count", fileRows(p))
      fileRec.put("file_size_in_bytes", Files.size(p))
      val e = new GenericData.Record(manifestEntryAvro)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", snapId)
      e.put("data_file", fileRec)
      e
    }
    val manifestName = s"manifest-$snapId-m0.avro"
    val manifestLen = writeAvro(dir.resolve(s"metadata/$manifestName"),
      manifestEntryAvro, entries)

    val mf = new GenericData.Record(manifestFileAvro)
    mf.put("manifest_path", s"$location/metadata/$manifestName")
    mf.put("manifest_length", manifestLen)
    mf.put("partition_spec_id", 0)
    mf.put("added_snapshot_id", snapId)
    // carry the previous snapshot's manifests forward (append-only)
    val prevManifests: Seq[org.apache.avro.generic.GenericRecord] =
      if (meta.get("current-snapshot-id").asLong() >= 0) {
        val cur = meta.get("current-snapshot-id").asLong()
        meta.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong() == cur)
          .map(s => avroRecords(rebaseIn(dir, location,
            s.get("manifest-list").asText())))
          .getOrElse(Nil)
      } else Nil
    val listName = s"snap-$snapId-1-${java.util.UUID.nameUUIDFromBytes(
      s"$location/$snapId".getBytes)}.avro"
    writeAvro(dir.resolve(s"metadata/$listName"), manifestFileAvro,
      mf +: prevManifests)

    val parent = meta.get("current-snapshot-id").asLong()
    val snap = mapper.createObjectNode()
    snap.put("snapshot-id", snapId)
    if (parent >= 0) snap.put("parent-snapshot-id", parent)
    // deterministic commit clock: the fixture epoch + one second per
    // snapshot (goldens never pin created-table timestamps)
    snap.put("timestamp-ms", 1600000000000L + snapId * 1000L)
    snap.put("manifest-list", s"$location/metadata/$listName")
    val summary = snap.putObject("summary")
    summary.put("operation", "append")
    meta.get("snapshots").asInstanceOf[ArrayNode].add(snap)
    meta.put("current-snapshot-id", snapId)
    writeVersion(dir, v + 1, meta)
    n
  }

  private def rebaseIn(dir: Path, location: String, p: String): String = {
    val i = p.indexOf(location)
    if (i >= 0) dir.toString + p.substring(i + location.length)
    else dir.toString + "/" + p.dropWhile(_ == '/')
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      val cs = try s.iterator().asScala.toVector finally s.close()
      cs.foreach(deleteRecursively)
    }
    Files.deleteIfExists(p)
  }

  /** Read the table's current snapshot, tolerating an empty table
    * (schema-only DataFrame) and top-level schema evolution (added
    * columns null-fill over older data files).
    */
  def readTableOrEmpty(spark: SparkSession, dir: Path): DataFrame = {
    val schema = schemaOf(dir)
    val files = dataFiles(dir)
    if (files.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[
        org.apache.spark.sql.Row](), schema)
    val base = IcebergFiles.readTable(spark, dir.toString)
    val have = base.columns.map(_.toLowerCase).toSet
    import org.apache.spark.sql.functions.{col, lit}
    base.select(schema.fields.map { f =>
      if (have(f.name.toLowerCase)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }.toIndexedSeq: _*)
  }
}
