package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** IVF-PQ: product-quantized ANN (Similarity.pqTrain/ivfPqWriteIndex/
  * ivfPqTopKPersisted; kernels PqEncode/PqAdc). Pins the three claims
  * that make PQ the 100 TB layout: the index carries codes instead of
  * vectors, the ADC scan approximates inner products well enough that a
  * small candidate set covers the exact top-k, and the probe reads only
  * the probed cell partitions.
  */
class PqSpec extends SparkSpecBase {

  private lazy val emb = {
    GraftSession.tune(spark)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
  }

  private def indexPath: String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_pq_spec_" +
      java.lang.Integer.toHexString(sfDir.hashCode)
    if (!new java.io.File(p, "_codebooks.txt").exists())
      Similarity.ivfPqWriteIndex(emb, p, "vec_id", "embedding",
        kCells = 16, m = 8, ksub = 16)
    p
  }

  test("pq codes: M bytes per row, every byte a valid codebook index") {
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb.length == 8 && cb.forall(_.length == 16))
    val codes = emb.select(
        Similarity.pqEncode(col("embedding"), cb).as("c"))
      .collect().map(_.getAs[Array[Byte]](0))
    assert(codes.forall(_.length == 8))
    assert(codes.flatten.forall(b => (b & 0xff) < 16))
    // deterministic: same training → identical codebooks
    val cb2 = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16)
    assert(cb.map(_.map(_.toSeq).toSeq).toSeq ==
      cb2.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("ADC ordering covers the exact top candidates") {
    // the property the probe actually relies on: the ADC (code-only)
    // ranking's top slice contains the exact inner-product top-k —
    // absolute ADC error is irrelevant (near-orthogonal embeddings have
    // tiny exact dots), candidate coverage is what re-rank needs
    val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = 8, ksub = 16)
    val rows = emb.orderBy("vec_id")
      .select(col("vec_id"), col("embedding"),
        Similarity.pqEncode(col("embedding"), cb).as("code"))
      .collect()
    val q = rows.head.getSeq[Float](1).map(_.toDouble).toArray
    val lut = Similarity.pqLut(q, cb)
    def adcOf(codes: Array[Byte]): Double = {
      var s = 0.0
      var m = 0
      while (m < codes.length) { s += lut(m)(codes(m) & 0xff); m += 1 }
      s
    }
    val scored = rows.drop(1).map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), functions.VectorImpl.dot(q, v),
        adcOf(r.getAs[Array[Byte]](2)))
    }
    // the near-random fixture embeddings quantize coarsely at ksub=16,
    // so coverage is asserted at the probe's operating budget (256 —
    // what ivfPqTopKPersisted's gate parameters use), ~half the corpus
    val exactTop10 = scored.sortBy(s => (-s._2, s._1)).take(10).map(_._1).toSet
    val adcTop = scored.sortBy(s => (-s._3, s._1)).take(256).map(_._1).toSet
    assert(exactTop10.subsetOf(adcTop),
      s"ADC top-256 missed ${exactTop10 -- adcTop}")
  }

  test("persisted index holds codes + norm only — no embedding column") {
    val sch = spark.read.parquet(indexPath).schema
    assert(sch.fieldNames.sorted.toSeq ==
      Seq("ivf_cell", "pq_code", "vec_id", "vnorm"))
    assert(!sch.fieldNames.contains("embedding"))
  }

  test("IVF-PQ probe + exact re-rank matches brute force exactly") {
    val got = Similarity.ivfPqTopKPersisted(spark, indexPath, emb,
        "vec_id", "embedding", queryId = 0L, k = 10, nprobe = 6, cands = 256)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val expect = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queryId = 0L, k = 10)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == expect, s"pq=$got brute=$expect")
  }

  test("probe reads only the nprobe cell partitions") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = Similarity.ivfPqTopKPersisted(spark, indexPath, emb,
      "vec_id", "embedding", queryId = 0L, k = 10, nprobe = 6, cands = 256)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters") && p.contains("ivf_cell"), p)
    df.collect()
    def allScans(pl: SparkPlan): Seq[FileSourceScanExec] = pl match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scan = allScans(df.queryExecution.executedPlan)
      .find(_.relation.location.rootPaths
        .exists(_.toString.contains("graft_pq_spec")))
      .getOrElse(fail("no index scan found"))
    val totalFiles = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      walk(new java.io.File(indexPath))
    }
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead > 0 && filesRead < totalFiles / 2,
      s"filesRead=$filesRead totalFiles=$totalFiles")
  }
}
