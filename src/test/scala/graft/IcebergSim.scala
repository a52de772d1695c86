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
  def registerFixture(name: String, dir: String,
      props: Map[String, String] = Map.empty): Unit = {
    val loc = scala.util.Try {
      // hadoop.catalog fixtures ship without version-hint.text — fall
      // back to the highest vN.metadata.json in the chain
      val hint = scala.util.Try(new String(Files.readAllBytes(
        Paths.get(dir, "metadata/version-hint.text"))).trim).getOrElse {
        val vRe = """v(\d+)\.metadata\.json""".r
        val listing = Files.list(Paths.get(dir, "metadata"))
        try scala.jdk.CollectionConverters
          .IteratorHasAsScala(listing.iterator()).asScala
          .flatMap(p => vRe.findFirstMatchIn(p.getFileName.toString)
            .map(_.group(1).toInt)).max.toString
        finally listing.close()
      }
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(Files.readAllBytes(
          Paths.get(dir, s"metadata/v$hint.metadata.json")))
        .get("location").asText()
    }.getOrElse(dir)
    val p = scala.collection.mutable.LinkedHashMap.empty[String, String]
    props.foreach { case (k, v) => p(k) = v }
    registry(name.toLowerCase) = new ImpalaMeta.IcebergTbl(
      dir, loc, external = true, p)
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
  private val ctasIcebergRe =
    ("""(?is)^\s*create\s+(?:external\s+)?table\s+[A-Za-z_]\w*\b""" +
      """.*?stored\s+as\s+iceberg\b.*\bas\s+select\b.*$""").r
  private val truncateRe =
    """(?is)^\s*truncate\s+(?:table\s+)?([A-Za-z_]\w*)\s*;?\s*$""".r
  private val alterOtherRe =
    """(?is)^\s*alter\s+table\s+([A-Za-z_]\w*)\s+(.*?)\s*;?\s*$""".r

  /** Impala's client-visible validation errors (iceberg-negative.test
    * pins the exact text, exception-class prefix included).
    */
  private def fail(msg: String): Nothing =
    throw new IllegalStateException(msg)

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
          return Left("AnalysisException: Table property " +
            "'iceberg.catalog_location' is necessary for Iceberg " +
            "table with 'hadoop.catalog'."))
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
    case ctasIcebergRe() =>
      fail("AnalysisException: CREATE TABLE AS SELECT does not " +
        "support the (ICEBERG) file format.")
    case createRe(ext, name0, colsTxt, specTxt, loc, propsTxt) =>
      val name = name0.toLowerCase
      val external = ext != null
      val props = parseProps(propsTxt)
      val catalog = props.getOrElse("iceberg.catalog", "hive.catalog")
      // CreateTableStmt/IcebergUtil validations, pinned by
      // iceberg-negative.test
      if (props.keys.exists(k => k.equalsIgnoreCase("transactional") ||
          k.equalsIgnoreCase("transactional_properties")))
        fail("Iceberg tables cannot have Hive ACID table properties.")
      if (props.contains("metadata_location"))
        fail("metadata_location cannot be set for Iceberg tables")
      if (catalog != "hadoop.catalog" &&
          props.contains("iceberg.catalog_location"))
        fail("iceberg.catalog_location cannot be set for Iceberg " +
          s"table stored in $catalog")
      if (catalog == "hadoop.catalog" && loc != null)
        fail("AnalysisException: Location cannot be set for Iceberg " +
          "table with 'hadoop.catalog'.")
      if (!external && Option(colsTxt).forall(_.trim.isEmpty))
        fail("AnalysisException: Table requires at least 1 column for " +
          "managed iceberg table.")
      Option(specTxt).foreach { st =>
        val colNames = Option(colsTxt).getOrElse("").split(",")
          .map(_.trim.split("\\s+").head.toLowerCase)
          .filter(_.nonEmpty).toSet
        st.split(",").map(_.trim).filter(_.nonEmpty).foreach { item =>
          val src = item.takeWhile(c => c.isLetterOrDigit || c == '_')
            .toLowerCase
          if (src.nonEmpty && !colNames(src))
            fail(s"AnalysisException: Cannot find source column: $src")
        }
      }
      resolveLocation(external, name, Option(loc), props.toMap) match {
        case Left(err) => ddl.lastMessage = Some(err)
          ddl.lastError = Some(err)
        case Right(location) =>
          val dir = dirOf(location)
          if (external && Option(colsTxt).forall(_.trim.isEmpty) &&
              !IcebergLayout.exists(dir)) {
            val ident = props.getOrElse("iceberg.table_identifier",
              s"$database.$name")
            fail("TableLoadingException: CAUSED BY: " +
              s"TableLoadingException: Table does not exist: $ident")
          }
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
        // external twins over the purged location go stale: their next
        // scan fails loading the metadata chain (HadoopTables.load —
        // `Table does not exist at location`)
        registry.foreach { case (n2, t2) =>
          if (t2.external &&
              Paths.get(t2.dir).startsWith(Paths.get(t.dir))) {
            val msg = s"Table does not exist at location: ${t2.location}"
            def raise(dt: org.apache.spark.sql.types.DataType) =
              org.apache.spark.sql.graft.Bridge.column(
                graft.functions.ImpalaRaiseOnRead(msg, dt))
            spark.range(1)
              .filter(raise(org.apache.spark.sql.types.BooleanType))
              .select(raise(org.apache.spark.sql.types.StringType).as("c"))
              .createOrReplaceTempView(n2)
          }
        }
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
    case setPropsRe(name0, propsTxt)
        if registry.contains(name0.toLowerCase) && {
          val restricted = Seq("iceberg.file_format", "iceberg.catalog",
            "iceberg.catalog_location", "iceberg.table_identifier",
            "metadata_location")
          parseProps(propsTxt).keys.exists(restricted.contains)
        } =>
      val k = Seq("iceberg.file_format", "iceberg.catalog",
        "iceberg.catalog_location", "iceberg.table_identifier",
        "metadata_location")
        .find(parseProps(propsTxt).keySet.contains).get
      fail(s"AnalysisException: Changing the '$k' table property is " +
        "not supported for Iceberg table.")
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
    case renameRe(name0, _)
        if registry.contains(name0.toLowerCase) && {
          val c = registry(name0.toLowerCase).props
            .getOrElse("iceberg.catalog", "hive.catalog")
          c == "hadoop.tables" || c == "hadoop.catalog"
        } =>
      val c = registry(name0.toLowerCase).props
        .getOrElse("iceberg.catalog", "hive.catalog")
      fail("UnsupportedOperationException: Cannot rename Iceberg " +
        s"tables that use '$c' as catalog.")
    case renameRe(name0, newName0)
        if registry.contains(name0.toLowerCase) =>
      val (name, newName) = (name0.toLowerCase, newName0.toLowerCase)
      val t = registry.remove(name).get
      registry(newName) = t
      scala.util.Try(spark.catalog.dropTempView(name))
      register(newName, Paths.get(t.dir))
      ddl.lastMessage = Some("Renaming was successful.")
      true
    case truncateRe(name0) if registry.contains(name0.toLowerCase) =>
      fail("AnalysisException: TRUNCATE TABLE not supported on " +
        s"iceberg table: $database.${name0.toLowerCase}")
    case insertOverwriteRe(name0) if registry.contains(name0.toLowerCase) =>
      fail("AnalysisException: INSERT OVERWRITE not supported for " +
        "Iceberg tables.")
    case insertRe(name0, _) if registry.contains(name0.toLowerCase) &&
        IcebergLayout.specOf(
          Paths.get(registry(name0.toLowerCase).dir)).nonEmpty =>
      fail("AnalysisException: Impala cannot write partitioned " +
        "Iceberg tables.")
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
    case alterOtherRe(name0, tail)
        if registry.contains(name0.toLowerCase) && {
          val t = tail.trim.toLowerCase
          Seq("set fileformat", "set row format", "set location",
            "add partition", "drop partition", "recover partitions",
            "drop column", "change column", "replace columns")
            .exists(t.startsWith)
        } =>
      val n = s"$database.${name0.toLowerCase}"
      val t = tail.trim.toLowerCase
      if (t.startsWith("set fileformat"))
        fail("AnalysisException: ALTER TABLE SET FILEFORMAT is not " +
          s"supported on Iceberg tables: $n")
      else if (t.startsWith("set row format"))
        fail("AnalysisException: ALTER TABLE SET ROWFORMAT is not " +
          s"supported on Iceberg tables: $n")
      else if (t.startsWith("set location"))
        fail("AnalysisException: ALTER TABLE SET LOCATION is not " +
          s"supported on Iceberg tables: $n")
      else if (t.startsWith("add partition"))
        fail("AnalysisException: ALTER TABLE ADD PARTITION is not " +
          s"supported for Iceberg tables: $n")
      else if (t.startsWith("drop partition"))
        fail("AnalysisException: ALTER TABLE DROP PARTITION is not " +
          s"supported for Iceberg tables: $n")
      else if (t.startsWith("recover partitions"))
        fail("AnalysisException: ALTER TABLE RECOVER PARTITIONS is " +
          s"not supported on Iceberg tables: $n")
      else if (t.startsWith("drop column"))
        fail("UnsupportedOperationException: Unsupported ALTER TABLE " +
          "operation for Iceberg tables: DROP_COLUMN")
      else if (t.startsWith("change column"))
        fail("UnsupportedOperationException: Unsupported ALTER TABLE " +
          "operation for Iceberg tables: ALTER_COLUMN")
      else
        fail("UnsupportedOperationException: Unsupported ALTER TABLE " +
          "operation for Iceberg tables: REPLACE_COLUMNS")
    case refreshRe(name0) if registry.contains(name0.toLowerCase) =>
      val t = registry(name0.toLowerCase)
      register(name0.toLowerCase, Paths.get(t.dir))
      true
    case _ => false
  }
}
