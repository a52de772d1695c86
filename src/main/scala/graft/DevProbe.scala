package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement probe (not part of the driver contract).
  * Attributes wall time inside the slow bench queries.
  */
object DevProbe {
  var spark: SparkSession = _
  var sfDir: String = _

  def time(label: String, n: Int = 5)(f: => Unit): Unit = {
    f // warm
    System.gc()
    val ts = (0 until n).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[probe] $label%-44s min=${ts.min}%.3f med=${ts.sorted.apply(n / 2)}%.3f")
  }
  def timeDf(label: String, n: Int = 5)(f: => DataFrame): Unit =
    time(label, n)(f.write.format("noop").mode("overwrite").save())

  def main(args: Array[String]): Unit = {
    sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.tune(spark)
    def docs = GraftSession.table(spark, sfDir, "documents")
    def emb = GraftSession.table(spark, sfDir, "embeddings")
    GraftSession.table(spark, sfDir, "lineitem").count()
    docs.count(); emb.count()
    // warm the probe indexes
    Seq("q_sim_ann_probe").foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }

    import graft.operators.{Dedup, Similarity}

    // ---- ann probe pieces
    val key = java.lang.Integer.toHexString(s"$sfDir|m4|t4".hashCode)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_ann_probe_$key"
    time("probe: read.parquet() analysis only")(
      spark.read.parquet(path).schema)
    time("probe: qvec point read")(
      emb.filter(col("vec_id") === 0L).select(col("embedding")).head())
    val qVec = emb.filter(col("vec_id") === 0L).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    timeDf("probe: scan+cos+distinct+topk")(
      Similarity.annTopKPersisted(spark, path, "vec_id", "embedding",
        qVec, 0L, 10, 4, 64, 4, 7L))
    timeDf("q_sim_ann_probe full")(
      SparkEntry.queries("q_sim_ann_probe")(spark, sfDir))
    time("q_sim_ann_probe construct only")(
      SparkEntry.queries("q_sim_ann_probe")(spark, sfDir))
    time("emb table analysis only")(
      GraftSession.table(spark, sfDir, "embeddings").schema)
    locally {
      val pre = SparkEntry.queries("q_sim_ann_probe")(spark, sfDir)
      timeDf("q_sim_ann_probe exec only (prebuilt)")(pre)
    }
    time("construct: inner overload w/ qVec")(
      Similarity.annTopKPersisted(spark, path, "vec_id", "embedding",
        qVec, 0L, 10, 4, 64, 4, 7L))
    time("construct: typedlit(Seq[Float])")(
      org.apache.spark.sql.functions.typedlit(qVec.toSeq))
    time("construct: qvec head via source overload")(
      GraftSession.table(spark, sfDir, "embeddings")
        .filter(col("vec_id") === 0L).select(col("embedding"))
        .head().getSeq[Float](0).toArray)

    // ---- dedup pieces
    timeDf("docs noop (scan only)")(docs)
    timeDf("minhash: bucketTable")(
      Dedup.bucketTable(docs, "doc_id", "text"))
    timeDf("minhash: candidatePairs")(
      Dedup.candidatePairs(Dedup.bucketTable(docs, "doc_id", "text")))
    timeDf("minhash: full dupPairs")(
      Dedup.minhashDupPairs(docs, "doc_id", "text", threshold = 0.7))
    timeDf("q_dedup_minhash full")(
      SparkEntry.queries("q_dedup_minhash")(spark, sfDir))
    timeDf("hh branch (md5 norm)")(
      docs.select(col("doc_id").as("id"),
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
          .cast("binary")).as("hh")))
    timeDf("simhash: table")(
      Dedup.simhashTable(docs, "doc_id", "text"))
    timeDf("simhash: dupPairs")(
      Dedup.simhashDupPairs(docs, "doc_id", "text", 4, 10))
    timeDf("ngram: pairs")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text"))
    // ---- ngram internals
    def ndocs = docs.select(col("doc_id").as("id"),
      Dedup.shingleHashes(col("text"), 3).as("hs"))
    def inv = ndocs.select(col("id"),
      size(col("hs")).cast("long").as("sz"), explode(col("hs")).as("h"))
    timeDf("ngram: inv explode only")(inv)
    timeDf("ngram: groupBy(h).count")(
      inv.groupBy(col("h")).agg(count(lit(1))))
    timeDf("ngram: groupBy(h).collect_capped2")(
      inv.groupBy(col("h"))
        .agg(call_function("collect_capped2", col("id"), col("sz"), lit(50))
          .as("ids")))
    timeDf("ngram: + pairs explode")(
      inv.groupBy(col("h"))
        .agg(call_function("collect_capped2", col("id"), col("sz"), lit(50))
          .as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
        .select(explode(call_function("sorted_pairs2", col("ids"))).as("p")))
    // ---- unscaled-long q1
    import graft.queries.Q
    def li2 = GraftSession.table(spark, sfDir, "lineitem")
    def q1dec = li2
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(Q.dec2(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(Q.dec2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(Q.dec2(col("l_extendedprice")) * (lit(1) - Q.frac2(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        sum(Q.dec2(col("l_extendedprice")) * (lit(1) - Q.frac2(col("l_discount")))
          * (lit(1) + Q.frac2(col("l_tax")))).cast("double").as("sum_charge"),
        (sum(Q.dec2(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(Q.dec2(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
        (sum(Q.frac2(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
    def q1u = {
      val uQty = Q.u2(col("l_quantity"))
      val uPrice = Q.u2(col("l_extendedprice"))
      val uDisc = Q.uf2(col("l_discount"))
      val uTax = Q.uf2(col("l_tax"))
      val uR = uPrice * (lit(100L) - uDisc)
      val uC = uR * (lit(100L) + uTax)
      li2.filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Q.sumUnscaledDbl(uQty, 2).as("sum_qty"),
          Q.sumUnscaledDbl(uPrice, 2).as("sum_base_price"),
          Q.sumUnscaledDbl(uR, 4).as("sum_disc_price"),
          Q.sumUnscaledDbl(uC, 6).as("sum_charge"),
          (Q.sumUnscaledDbl(uQty, 2) / count(lit(1))).as("avg_qty"),
          (Q.sumUnscaledDbl(uPrice, 2) / count(lit(1))).as("avg_price"),
          (Q.sumUnscaledDbl(uDisc, 2) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }
    timeDf("q1 decimal sums")(q1dec)
    timeDf("q1 unscaled-long sums")(q1u)
    locally {
      val a = q1dec.collect()
      val b = q1u.collect()
      val same = a.zip(b).forall { case (ra, rb) =>
        (0 until ra.length).forall { i =>
          val va = ra.get(i); val vb = rb.get(i)
          (va == vb) || (va.isInstanceOf[Double] &&
            java.lang.Double.doubleToRawLongBits(va.asInstanceOf[Double]) ==
            java.lang.Double.doubleToRawLongBits(vb.asInstanceOf[Double]))
        }
      }
      println(s"[probe] q1 unscaled == decimal bitwise: $same rows=${a.length}")
      if (!same) {
        a.zip(b).foreach { case (ra, rb) =>
          if (ra.toString != rb.toString) println(s"[probe] DIFF\n  $ra\n  $rb") }
      }
    }
    spark.stop()
  }
}
