package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only measurement probe (not part of the driver contract).
  * Attributes wall time inside the slow bench queries. Rewritten per
  * optimization round for that round's suspects (r17 probes in git
  * history at tag `round 17`).
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
    println(f"[probe] $label%-52s min=${ts.min}%.3f med=${ts.sorted.apply(n / 2)}%.3f")
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
    val only: String => Boolean =
      if (args.nonEmpty) args(0).split(",").toSet else (_ => true)
    def docs = GraftSession.table(spark, sfDir, "documents")
    def li = GraftSession.table(spark, sfDir, "lineitem")
    def ord = GraftSession.table(spark, sfDir, "orders")
    li.count(); docs.count()
    SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()

    // ---- construct vs exec split for the round's heavy set
    if (only("split")) {
      Seq("tpch_q21", "tpch_q5", "tpch_q4", "tpch_q18", "tpch_q7",
          "tpch_q3", "tpch_q9", "q_dedup_simhash", "q_dedup_minhash",
          "q_dedup_ngram", "q_sim_ivf", "q_events_tumbling").foreach { q =>
        val fn = SparkEntry.queries(q)
        timeDf(s"$q full")(fn(spark, sfDir))
        time(s"$q construct only")(fn(spark, sfDir))
      }
    }

    // ---- q21: current vs single-pass window rewrite
    if (only("q21")) {
      import graft.queries.Q
      val fn = SparkEntry.queries("tpch_q21")
      timeDf("q21 current")(fn(spark, sfDir))
      def lateLines = li
        .join(ord.filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      def q21win = {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("l_orderkey"))
        val lone = lateLines
          .withColumn("__mn", min(col("l_suppkey")).over(w))
          .withColumn("__mx", max(col("l_suppkey")).over(w))
          .filter(col("__mn") === col("__mx"))
          .select(col("l_orderkey").as("l1_orderkey"),
            col("l_suppkey").as("l1_suppkey"))
        val l2 = li.select(col("l_orderkey").as("l2_orderkey"),
          col("l_suppkey").as("l2_suppkey"))
        lone
          .join(l2, col("l2_orderkey") === col("l1_orderkey") &&
            col("l2_suppkey") =!= col("l1_suppkey"), "left_semi")
          .join(GraftSession.table(spark, sfDir, "supplier"),
            col("l1_suppkey") === col("s_suppkey"))
          .join(GraftSession.table(spark, sfDir, "nation")
            .filter(col("n_name") === "NATION_13"),
            col("s_nationkey") === col("n_nationkey"), "left_semi")
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc_nulls_first("numwait"), asc_nulls_last("s_name"))
          .limit(100)
      }
      timeDf("q21 window rewrite")(q21win)
      locally {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        val b = q21win.collect().map(_.toString).toSeq
        println(s"[probe] q21 rewrite equal: ${a == b} (${a.length} rows)")
      }
    }

    // ---- simhash gate: epairs join vs hh-annotation (minhash shape)
    if (only("simhash")) {
      import graft.operators.Dedup
      val fn = SparkEntry.queries("q_dedup_simhash")
      timeDf("q_dedup_simhash current")(fn(spark, sfDir))
      def norm = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
        .cast("binary"))
      def hh = docs.select(col("doc_id").as("id"), norm.as("hh"))
      def alt = {
        val exactPairs = hh.groupBy(col("hh")).agg(count(lit(1)).as("g"))
          .agg(coalesce(sum(col("g") * (col("g") - 1) / 2), lit(0.0))
            .cast("long").as("n_exact_dup_pairs"))
        val pairs = Dedup.simhashDupPairs(docs, "doc_id", "text",
          chunks = 4, maxHamming = 10)
        val pairStats = pairs
          .join(hh.select(col("id").as("id1"), col("hh").as("hh1")), Seq("id1"))
          .join(hh.select(col("id").as("id2"), col("hh").as("hh2")), Seq("id2"))
          .agg(
            coalesce(sum(when(col("hamming") === 0 && col("hh1") === col("hh2"),
              1L).otherwise(0L)), lit(0L)).as("__f"),
            count(lit(1)).as("__n10"))
        docs.select(count(lit(1)).as("n_docs"))
          .crossJoin(exactPairs)
          .crossJoin(pairStats)
          .select(col("n_docs"), col("n_exact_dup_pairs"),
            (col("__f") === col("n_exact_dup_pairs")).as("exact_dups_at_h0"),
            (col("__n10") >= col("n_exact_dup_pairs")).as("near_ge_exact"))
      }
      timeDf("q_dedup_simhash hh-annotated")(alt)
      locally {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        val b = alt.collect().map(_.toString).toSeq
        println(s"[probe] simhash rewrite equal: ${a == b} $a $b")
      }
    }

    // ---- dedup kernel attribution: how many corpus passes matter
    if (only("dedup")) {
      import graft.operators.Dedup
      timeDf("docs scan only")(docs)
      timeDf("md5 norm pass")(docs.select(md5(regexp_replace(
        lower(trim(col("text"))), "\\s+", " ").cast("binary"))))
      timeDf("shingle_hashes pass")(docs.select(col("doc_id"),
        Dedup.shingleHashes(col("text"), 3).as("hs")))
      timeDf("simhash_text pass")(docs.select(col("doc_id"),
        call_function("simhash_text", col("text"))))
      timeDf("minhash sig pass")(docs.select(col("doc_id"),
        Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 3), 64)))
    }

    spark.stop()
  }
}
