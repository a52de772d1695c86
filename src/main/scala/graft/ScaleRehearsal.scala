package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup scaling rehearsal (dev tool, driver-independent): times the
  * minhash / simhash / ngram dedup pipelines on the sf documents table
  * at 1× and N× and prints one JSON line with the wall times and the
  * scaling exponent log(tN/t1)/log(N). Near-linear exponents (≲1.2)
  * back the "no quadratic blowup" claim with a measurement.
  *
  * The N× corpus is N content-disjoint replicas (every word suffixed
  * with the replica id, so shingle sets never collide across replicas):
  * the dup-pair structure replicates exactly — the workload is N× by
  * construction, so the exponent isolates the ENGINE's scaling.
  */
object ScaleRehearsal {

  def replicate(docs: DataFrame, n: Int): DataFrame = {
    val m = 10000000L
    (0 until n).map { k =>
      docs.select((col("doc_id") + lit(k * m)).as("doc_id"),
        regexp_replace(col("text"), "(\\S+)", s"$$1_$k").as("text"))
    }.reduce(_ unionAll _)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)

    val docs = GraftSession.table(spark, sfDir, "documents")
      .select("doc_id", "text")
    // materialize both inputs to parquet so timed runs scan files, not
    // the replication expression
    val base = java.nio.file.Files.createTempDirectory("graft_scale").toString
    docs.write.mode("overwrite").parquet(s"$base/x1")
    replicate(docs, mult).write.mode("overwrite").parquet(s"$base/x$mult")
    val x1 = spark.read.parquet(s"$base/x1")
    val xN = spark.read.parquet(s"$base/x$mult")
    x1.count(); xN.count() // warm IO cache

    def time(f: => Unit): Double = {
      val runs = (0 until 2).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val pipelines: Seq[(String, DataFrame => DataFrame)] = Seq(
      "minhash" -> (d => graft.operators.Dedup.minhashDupPairs(d, "doc_id", "text", threshold = 0.7)),
      "simhash" -> (d => graft.operators.Dedup.simhashDupPairs(d, "doc_id", "text", chunks = 4, maxHamming = 10)),
      "ngram" -> (d => graft.operators.Dedup.ngramJaccardPairs(d, "doc_id", "text")))

    val results = pipelines.map { case (name, p) =>
      noop(p(x1)) // codegen warm
      val t1 = time(noop(p(x1)))
      val tN = time(noop(p(xN)))
      val exp = math.log(tN / t1) / math.log(mult.toDouble)
      (name, t1, tN, exp)
    }
    val json = results.map { case (n, t1, tN, e) =>
      f""""$n":{"t1":$t1%.2f,"t$mult":$tN%.2f,"exponent":$e%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"dedup_scaling","mult":$mult,"rows_1x":${x1.count()},"pipelines":$json}""")

    // ---- ANN/IVF scaling (r17): index BUILD and steady-state PROBE at
    // 1× and N× corpus replicas (ids shifted, vectors identical — the
    // probed cells/buckets carry exactly N× the candidates, so the
    // exponent isolates the engine). Probe cost at 100 TB is the claim
    // that matters: partition pruning keeps it proportional to the
    // probed slice, not the corpus.
    val emb = GraftSession.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    def replicateEmb(n: Int): DataFrame = {
      val m = 10000000L
      (0 until n).map { k =>
        emb.select((col("vec_id") + lit(k * m)).as("vec_id"), col("embedding"))
      }.reduce(_ unionAll _)
    }
    emb.write.mode("overwrite").parquet(s"$base/e1")
    replicateEmb(mult).write.mode("overwrite").parquet(s"$base/e$mult")
    val e1 = spark.read.parquet(s"$base/e1")
    val eN = spark.read.parquet(s"$base/e$mult")
    e1.count(); eN.count()
    import graft.operators.Similarity
    val qVec = e1.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    def annCase(df: DataFrame, tag: String): (Double, Double) = {
      val path = s"$base/ann_$tag"
      val build = time {
        Similarity.signAndWriteCorpus(df, path, "vec_id", "embedding",
          m = 4, tables = 4)
      }
      noop(Similarity.annTopKPersisted(spark, path, "vec_id", "embedding",
        qVec, 0L, 10, 4, 64, 4, 7L)) // warm
      val probe = time(noop(Similarity.annTopKPersisted(spark, path,
        "vec_id", "embedding", qVec, 0L, 10, 4, 64, 4, 7L)))
      (build, probe)
    }
    def ivfCase(df: DataFrame, tag: String): (Double, Double) = {
      val path = s"$base/ivf_$tag"
      val build = time {
        Similarity.ivfWriteCorpus(df, path, "vec_id", "embedding", k = 16)
      }
      noop(Similarity.ivfTopKPersisted(spark, path, "vec_id", "embedding",
        qVec, 0L, 10, 4))
      val probe = time(noop(Similarity.ivfTopKPersisted(spark, path,
        "vec_id", "embedding", qVec, 0L, 10, 4)))
      (build, probe)
    }
    val (ab1, ap1) = annCase(e1, "x1")
    val (abN, apN) = annCase(eN, s"x$mult")
    val (ib1, ip1) = ivfCase(e1, "x1")
    val (ibN, ipN) = ivfCase(eN, s"x$mult")
    def ex(t1: Double, tN: Double): Double =
      math.log(tN / t1) / math.log(mult.toDouble)
    val annJson =
      f""""ann_build":{"t1":$ab1%.2f,"t$mult":$abN%.2f,"exponent":${ex(ab1, abN)}%.2f},""" +
      f""""ann_probe":{"t1":$ap1%.2f,"t$mult":$apN%.2f,"exponent":${ex(ap1, apN)}%.2f},""" +
      f""""ivf_build":{"t1":$ib1%.2f,"t$mult":$ibN%.2f,"exponent":${ex(ib1, ibN)}%.2f},""" +
      f""""ivf_probe":{"t1":$ip1%.2f,"t$mult":$ipN%.2f,"exponent":${ex(ip1, ipN)}%.2f}"""
    println(s"""{"metric":"ann_scaling","mult":$mult,"rows_1x":${e1.count()},"pipelines":{$annJson}}""")
    spark.stop()
  }
}
