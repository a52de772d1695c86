package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.sources.IcebergLayout

/** Replays the iceberg golden files' DDL/DML against REAL Iceberg
  * HadoopTables layouts: CREATE writes a v1 metadata chain through
  * [[IcebergLayout]], INSERT commits data files + manifests + a new
  * snapshot, and the registered views read the chain back through
  * [[IcebergLayout.readTableOrEmpty]] — the library is exercised
  * end-to-end. This class only resolves Impala's catalog/location
  * rules (`fe/src/main/java/org/apache/impala/util/IcebergUtil.java`
  * getIcebergCatalog/getIcebergTableIdentifier) and parses the
  * statements, the way the reference's test runner drives a live
  * catalog service.
  */
class IcebergSim(spark: SparkSession, ddl: GoldenDdl) {

  private val wh = Files.createTempDirectory("graft-iceberg-sim")
  /** The runner's namenode + test database spellings — the harness
    * substitutes the same values into the goldens' $NAMENODE/$DATABASE.
    */
  val namenode = "hdfs://localhost:20500"
  val database = "iceds"

  private def registry = ImpalaMeta.icebergRegistry
  // views this sim registered (a fixture registration only adds a
  // registry entry — its temp view belongs to FunctionalTables)
  private val created = scala.collection.mutable.Set.empty[String]

  def reset(): Unit = {
    created.foreach(n => scala.util.Try(spark.catalog.dropTempView(n)))
    created.clear()
    registry.clear()
  }

  /** Register a reference-shipped fixture table (read-only metadata —
    * DESCRIBE HISTORY / SHOW PARTITIONS render from its real chain).
    */
  def registerFixture(name: String, dir: String): Unit = {
    val loc = scala.util.Try {
      val hint = new String(Files.readAllBytes(
        Paths.get(dir, "metadata/version-hint.text"))).trim
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(
          Paths.get(dir, s"metadata/v$hint.metadata.json")))
        .get("location").asText()
    }.getOrElse(dir)
    registry(name.toLowerCase) = new ImpalaMeta.IcebergTbl(
      dir, loc, external = true,
      scala.collection.mutable.LinkedHashMap.empty)
  }

  // ---- statement shapes ----

  private val createRe =
    ("""(?is)^\s*create\s+(external\s+)?table\s+(?:if\s+not\s+exists\s+)?""" +
      """([A-Za-z_]\w*)\s*""" +
      """(?:\(((?:[^()]|\([^()]*\))*)\)\s*)?""" +
      """(?:partition\s+by\s+spec\s*\(((?:[^()]|\([^()]*\))*)\)\s*)?""" +
      """stored\s+as\s+iceberg\s*""" +
      """(?:location\s+'([^']*)'\s*)?""" +
      """(?:tblproperties\s*\((.*)\))?\s*;?\s*$""").r
  private val dropRe =
    """(?is)^\s*drop\s+table\s+(?:if\s+exists\s+)?([A-Za-z_]\w*)\s*(?:purge\s*)?;?\s*$""".r
  private val addColsRe =
    """(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)\s+add\s+columns\s*\((.*)\)\s*;?\s*$""".r
  private val setPropsRe =
    """(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)\s+set\s+tblproperties\s*\((.*)\)\s*;?\s*$""".r
  private val setOwnerRe =
    """(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)\s+set\s+owner\s+(user|role)\s+([A-Za-z_]\w*)\s*;?\s*$""".r
  private val renameRe =
    """(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)\s+rename\s+to\s+([A-Za-z_]\w*)\s*;?\s*$""".r
  // INTO only: every replay appends a snapshot via IcebergLayout.append.
  // An INSERT OVERWRITE must fail loudly (a replace snapshot is not
  // implemented) instead of silently duplicating rows.
  private val insertRe =
    """(?is)^\s*insert\s+into\s+(?:table\s+)?([A-Za-z_]\w*)\s+((?:values|select|with)\b.*)$""".r
  private val insertOverwriteRe =
    """(?is)^\s*insert\s+overwrite\s+(?:table\s+)?([A-Za-z_]\w*)\b.*$""".r
  private val refreshRe =
    """(?is)^\s*(?:refresh|invalidate\s+metadata)\s+([A-Za-z_]\w*)\s*;?\s*$""".r

  private def parseProps(txt: String)
      : scala.collection.mutable.LinkedHashMap[String, String] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    """'([^']*)'\s*=\s*'([^']*)'""".r.findAllMatchIn(
      Option(txt).getOrElse("")).foreach(g => m(g.group(1)) = g.group(2))
    m
  }

  /** CHAR/VARCHAR land as plain strings in the layout schema (Iceberg
    * has no length-typed strings; the fixture values are pre-padded).
    */
  private def normalize(st: StructType): StructType =
    StructType(st.fields.map(f => StructField(f.name, f.dataType match {
      case _: CharType | _: VarcharType => StringType
      case other => other
    }, f.nullable)))

  private def dirOf(location: String): Path =
    wh.resolve(location.replaceAll("[^A-Za-z0-9]+", "_"))

  /** Impala's location resolution per catalog kind. Returns
    * Left(errorMessage) when the spelling is rejected.
    */
  private def resolveLocation(external: Boolean, name: String,
      loc: Option[String], props: Map[String, String])
      : Either[String, String] = {
    val catalog = props.getOrElse("iceberg.catalog", "hive.catalog")
    catalog match {
      case "hadoop.catalog" =>
        val base = props.getOrElse("iceberg.catalog_location",
          return Left("Table property 'iceberg.catalog_location' is " +
            "necessary for Iceberg table with 'hadoop.catalog'."))
        val path = props.get("iceberg.table_identifier")
          .map(_.replace('.', '/'))
          .getOrElse(s"$database/$name")
        Right(s"$namenode$base/$path")
      case "hadoop.tables" =>
        loc match {
          case Some(l) => Right(s"$namenode$l")
          case None if external =>
            Left("Location is necessary for external iceberg table.")
          case None =>
            Right(s"$namenode/test-warehouse/$database.db/$name")
        }
      case _ => // hive.catalog
        Right(loc.map(l => s"$namenode$l")
          .getOrElse(s"$namenode/test-warehouse/$database.db/$name"))
    }
  }

  private def register(name: String, dir: Path): Unit = {
    IcebergLayout.readTableOrEmpty(spark, dir)
      .createOrReplaceTempView(name)
    created += name
  }

  private def refreshShared(dir: Path): Unit =
    registry.foreach { case (n, t) =>
      if (t.dir == dir.toString) scala.util.Try(register(n, dir))
    }

  /** Execute one statement; true = handled here. */
  def exec(stmt: String): Boolean = stmt match {
    case createRe(ext, name0, colsTxt, specTxt, loc, propsTxt) =>
      val name = name0.toLowerCase
      val external = ext != null
      val props = parseProps(propsTxt)
      resolveLocation(external, name, Option(loc), props.toMap) match {
        case Left(err) => ddl.lastMessage = Some(err)
        case Right(location) =>
          val dir = dirOf(location)
          if (!IcebergLayout.exists(dir)) {
            // Impala tolerates `MAP <STRING, …>`; Spark's DDL parser
            // wants the bracket flush against the type keyword
            val schema = normalize(StructType.fromDDL(
              Option(colsTxt).getOrElse("").replaceAll("\\s+<", "<")))
            val spec = Option(specTxt)
              .map(IcebergLayout.parseSpec(_, schema)).getOrElse(Nil)
            Files.createDirectories(dir)
            IcebergLayout.create(dir, location, schema, spec, props.toMap)
          }
          registry(name) = new ImpalaMeta.IcebergTbl(
            dir.toString, location, external, props)
          register(name, dir)
          ddl.lastMessage = Some("Table has been created.")
      }
      true
    case dropRe(name0) if registry.contains(name0.toLowerCase) =>
      val name = name0.toLowerCase
      val t = registry.remove(name).get
      scala.util.Try(spark.catalog.dropTempView(name))
      if (!t.external) {
        // managed drop purges the table directory (synchronized
        // tables: external twins over the same location go stale)
        def rm(p: Path): Unit = {
          if (Files.isDirectory(p)) {
            val s = Files.list(p)
            val cs = try scala.jdk.CollectionConverters
              .IteratorHasAsScala(s.iterator()).asScala.toVector
            finally s.close()
            cs.foreach(rm)
          }
          Files.deleteIfExists(p): Unit
        }
        rm(Paths.get(t.dir))
      }
      ddl.lastMessage = Some("Table has been dropped.")
      true
    case addColsRe(name0, colsTxt) if registry.contains(name0.toLowerCase) =>
      val name = name0.toLowerCase
      val dir = Paths.get(registry(name).dir)
      val cur = IcebergLayout.schemaOf(dir)
      val added = normalize(StructType.fromDDL(colsTxt))
      IcebergLayout.setSchema(dir, StructType(cur.fields ++ added.fields))
      register(name, dir)
      ddl.lastMessage = Some("New column(s) have been added to the table.")
      true
    case setPropsRe(name0, propsTxt) if registry.contains(name0.toLowerCase) =>
      val t = registry(name0.toLowerCase)
      parseProps(propsTxt).foreach { case (k, v) => t.props(k) = v }
      IcebergLayout.setProperties(Paths.get(t.dir),
        parseProps(propsTxt).toMap)
      ddl.lastMessage = Some("Updated table.")
      true
    case setOwnerRe(name0, kind, owner) if registry.contains(name0.toLowerCase) =>
      val t = registry(name0.toLowerCase)
      t.owner = owner
      t.ownerType = kind.toUpperCase
      ddl.lastMessage = Some("Updated table.")
      true
    case renameRe(name0, newName0)
        if registry.contains(name0.toLowerCase) =>
      val (name, newName) = (name0.toLowerCase, newName0.toLowerCase)
      val t = registry.remove(name).get
      registry(newName) = t
      scala.util.Try(spark.catalog.dropTempView(name))
      register(newName, Paths.get(t.dir))
      ddl.lastMessage = Some("Renaming was successful.")
      true
    case insertOverwriteRe(name0) if registry.contains(name0.toLowerCase) =>
      throw new UnsupportedOperationException(
        "iceberg INSERT OVERWRITE (replace snapshot) is not replayed")
    case insertRe(name0, sourceTxt) if registry.contains(name0.toLowerCase) =>
      val name = name0.toLowerCase
      val dir = Paths.get(registry(name).dir)
      val schema = IcebergLayout.schemaOf(dir)
      val src = ImpalaDialect.sql(spark,
        if (sourceTxt.trim.toLowerCase.startsWith("values"))
          s"SELECT * FROM ($sourceTxt)"
        else sourceTxt)
      import org.apache.spark.sql.functions.col
      // positional rename first — generated source column names may
      // contain characters `col(name)` cannot resolve
      val tmp = src.toDF(src.columns.indices.map(i => s"__c$i"): _*)
      val out = tmp.select(tmp.columns.zip(schema.fields).map {
        case (c, f) => col(c).cast(f.dataType).as(f.name)
      }.toIndexedSeq: _*)
      val n = IcebergLayout.append(spark, dir, out)
      refreshShared(dir)
      ddl.lastInsertReport = Seq(s": $n")
      true
    case refreshRe(name0) if registry.contains(name0.toLowerCase) =>
      val t = registry(name0.toLowerCase)
      register(name0.toLowerCase, Paths.get(t.dir))
      true
    case _ => false
  }
}
