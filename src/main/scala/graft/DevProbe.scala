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

    // ---- parquet size-estimate fix: stop broadcasting the fact table
    if (only("factor")) {
      val tpch = (1 to 22).map(i => s"tpch_q$i")
      def runAll(label: String): Unit = {
        val ts = tpch.map { q =>
          val fn = SparkEntry.queries(q)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          System.gc()
          val t0 = System.nanoTime()
          (0 until 3).foreach(_ => fn(spark, sfDir)
            .write.format("noop").mode("overwrite").save())
          q -> (System.nanoTime() - t0) / 3e9
        }
        println(s"[probe] $label total=${ts.map(_._2).sum}")
        ts.foreach { case (q, t) => println(f"[probe]   $q%-10s $t%.3f") }
      }
      runAll("tpch factor=1.0 (default)")
      spark.conf.set("spark.sql.sources.fileCompressionFactor", "4.0")
      runAll("tpch factor=4.0")
      spark.conf.unset("spark.sql.sources.fileCompressionFactor")
    }

    // ---- q4: inner join + distinct so the SMALL side broadcasts and
    // lineitem streams (a semi keeping orders rows can only broadcast
    // the lineitem side)
    if (only("q4i")) {
      val fn = SparkEntry.queries("tpch_q4")
      timeDf("q4 current (semi)")(fn(spark, sfDir))
      def q4inner = {
        val ordF = ord
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        li.select(col("l_orderkey"), col("l_shipdate"))
          .join(broadcast(ordF), col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select(col("o_orderkey"), col("o_orderpriority"))
          .distinct()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      }
      timeDf("q4 inner+distinct")(q4inner)
      locally {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        val b = q4inner.collect().map(_.toString).toSeq
        println(s"[probe] q4 inner rewrite equal: ${a == b} $a")
      }
      // hint-free: does the static planner / AQE find the broadcast?
      def q4innerNoHint = {
        val ordF = ord
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        li.select(col("l_orderkey"), col("l_shipdate"))
          .join(ordF, col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select(col("o_orderkey"), col("o_orderpriority"))
          .distinct()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      }
      timeDf("q4 inner+distinct NO hint")(q4innerNoHint)
    }

    // ---- q4: max-shipdate-per-order aggregation instead of semi join
    if (only("q4")) {
      import graft.queries.Q
      val fn = SparkEntry.queries("tpch_q4")
      timeDf("q4 current")(fn(spark, sfDir))
      def q4agg = {
        val liMax = li.groupBy(col("l_orderkey"))
          .agg(max(col("l_shipdate")).as("__mx"))
        ord
          .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
          .join(liMax, col("l_orderkey") === col("o_orderkey") &&
            col("__mx") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      }
      timeDf("q4 max-per-order agg")(q4agg)
      locally {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        val b = q4agg.collect().map(_.toString).toSeq
        println(s"[probe] q4 rewrite equal: ${a == b} $a")
      }
    }

    // ---- q18: single per-order qty aggregation reused for filter+output
    if (only("q18")) {
      import graft.queries.Q
      val fn = SparkEntry.queries("tpch_q18")
      timeDf("q18 current")(fn(spark, sfDir))
      def q18agg = {
        val liAgg = li.groupBy(col("l_orderkey").as("bo_orderkey"))
          .agg(Q.sumUnscaledDbl(Q.u2(col("l_quantity")), 2).as("sum_qty"))
          .filter(col("sum_qty") > 250.0)
        GraftSession.table(spark, sfDir, "customer")
          .join(ord, col("c_custkey") === col("o_custkey"))
          .join(liAgg, col("o_orderkey") === col("bo_orderkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_totalprice"), col("sum_qty"))
          .orderBy(desc_nulls_first("o_totalprice"), asc_nulls_last("o_orderkey"))
          .limit(100)
      }
      timeDf("q18 one-agg")(q18agg)
      locally {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        val b = q18agg.collect().map(_.toString).toSeq
        println(s"[probe] q18 rewrite equal: ${a == b} (${a.length} rows)")
      }
    }

    // ---- batch-2 A/B: kernel text stats vs the regex formulation,
    // merged minhash verify vs 4-join shape, 1-job ivf build
    if (only("batch2")) {
      import org.apache.spark.sql.Column
      // OLD q_text_stats (regex formulations, pre-r18 TA internals)
      def oldTokenCount(t: Column) = when(length(trim(t)) === 0, lit(0))
        .otherwise(size(split(trim(t), "\\s+")))
      def oldSubword(t: Column) = size(regexp_extract_all(t,
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      def oldHits(t: Column, words: Seq[String]) = size(regexp_extract_all(
        lower(t), lit(words.mkString("\\b(", "|", ")\\b")), lit(0)))
      def oldStopRatio(t: Column) = {
        val n = oldTokenCount(t)
        when(n === 0, lit(0.0)).otherwise(oldHits(t,
          graft.operators.TextAnalysis.enStopwords).cast("double") / n)
      }
      def oldMeanWlen(t: Column) = {
        val n = oldTokenCount(t)
        when(n === 0, lit(0.0))
          .otherwise(length(regexp_replace(t, "\\s+", "")).cast("double") / n)
      }
      def oldPunctRatio(t: Column) = when(length(t) === 0, lit(0.0))
        .otherwise(length(regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("double")
          / length(t))
      def oldQuality(t: Column) = {
        val lenOk = when(length(t).between(50, 10000), lit(0.25)).otherwise(lit(0.0))
        val stopOk = when(oldStopRatio(t) >= 0.05, lit(0.25)).otherwise(lit(0.0))
        val punctOk = when(oldPunctRatio(t) <= 0.2, lit(0.25)).otherwise(lit(0.0))
        val wordOk = when(oldMeanWlen(t).between(3.0, 12.0), lit(0.25)).otherwise(lit(0.0))
        lenOk + stopOk + punctOk + wordOk
      }
      def oldTextStats = docs.filter(col("doc_id") <= 500)
        .select(col("doc_id"),
          oldTokenCount(col("text")).as("n_tokens"),
          oldSubword(col("text")).as("n_subwords"),
          length(col("text")).as("n_chars_m"),
          oldHits(col("text"), graft.operators.TextAnalysis.enStopwords).as("stop_hits"),
          round(oldStopRatio(col("text")), 6).as("stop_ratio"),
          round(oldMeanWlen(col("text")), 6).as("mean_wlen"),
          oldQuality(col("text")).as("quality"))
        .orderBy(col("doc_id"))
      timeDf("q_text_stats OLD regex")(oldTextStats)
      timeDf("q_text_stats NEW kernel")(
        SparkEntry.queries("q_text_stats")(spark, sfDir))
      locally {
        val a = oldTextStats.collect().map(_.toString).toSeq
        val b = SparkEntry.queries("q_text_stats")(spark, sfDir)
          .collect().map(_.toString).toSeq
        println(s"[probe] text_stats equal: ${a == b} (${a.length} rows)")
      }
      def oldLangId(t: Column) = {
        val scores = graft.operators.TextAnalysis.langMarkers.map {
          case (lang, words) => lang -> oldHits(t, words)
        }
        val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
        scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
          when(best > 0 && sc === best, lit(lang)).otherwise(acc)
        }
      }
      def oldLang = docs
        .select(col("doc_id"), col("lang"), oldLangId(col("text")).as("lang_guess"))
        .groupBy(col("lang"), col("lang_guess"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("lang_guess"))
      timeDf("q_lang_id OLD regex")(oldLang)
      timeDf("q_lang_id NEW kernel")(
        SparkEntry.queries("q_lang_id")(spark, sfDir))
      locally {
        val a = oldLang.collect().map(_.toString).toSeq
        val b = SparkEntry.queries("q_lang_id")(spark, sfDir)
          .collect().map(_.toString).toSeq
        println(s"[probe] lang_id equal: ${a == b} (${a.length} rows)")
      }
      // OLD q_dedup_minhash gate: separate (id,hs) verify joins + (id,hh)
      // containment joins (4 joins, 4 corpus scans) + docs.count scan
      def oldMinhash = {
        import graft.operators.Dedup
        val norm = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
          .cast("binary"))
        val hh = docs.select(col("doc_id").as("id"), norm.as("hh"))
        val exactPairs = hh.groupBy(col("hh")).agg(count(lit(1)).as("g"))
          .agg(coalesce(sum(col("g") * (col("g") - 1) / 2), lit(0.0))
            .cast("long").as("n_exact_dup_pairs"))
        val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text", threshold = 0.7)
        val pairStats = pairs
          .join(hh.select(col("id").as("id1"), col("hh").as("hh1")), Seq("id1"))
          .join(hh.select(col("id").as("id2"), col("hh").as("hh2")), Seq("id2"))
          .agg(
            coalesce(sum(when(col("jaccard") === 1.0 &&
              col("hh1") === col("hh2"), 1L).otherwise(0L)), lit(0L)).as("__f"),
            count(lit(1)).as("__n"))
        docs.select(count(lit(1)).as("n_docs"))
          .crossJoin(exactPairs)
          .crossJoin(pairStats)
          .select(col("n_docs"), col("n_exact_dup_pairs"),
            (col("__f") === col("n_exact_dup_pairs")).as("exact_dups_at_j100"),
            (col("__n") >= col("n_exact_dup_pairs")).as("near_ge_exact"))
      }
      timeDf("q_dedup_minhash OLD 4-join")(oldMinhash)
      timeDf("q_dedup_minhash NEW merged-verify")(
        SparkEntry.queries("q_dedup_minhash")(spark, sfDir))
      locally {
        val a = oldMinhash.collect().map(_.toString).toSeq
        val b = SparkEntry.queries("q_dedup_minhash")(spark, sfDir)
          .collect().map(_.toString).toSeq
        println(s"[probe] minhash gate equal: ${a == b} $a $b")
      }
      timeDf("q_sim_ivf NEW 1-job build")(
        SparkEntry.queries("q_sim_ivf")(spark, sfDir))
    }

    // ---- shuffled-hash-join confs (guide §3.1/§9): default vs
    // preferSortMergeJoin=false + AQE SMJ->SHJ conversion
    if (only("shj")) {
      val tpch = (1 to 22).map(i => s"tpch_q$i")
      def runAll(label: String): Unit = {
        val ts = tpch.map { q =>
          val fn = SparkEntry.queries(q)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          System.gc()
          val t0 = System.nanoTime()
          (0 until 5).foreach(_ => fn(spark, sfDir)
            .write.format("noop").mode("overwrite").save())
          q -> (System.nanoTime() - t0) / 5e9
        }
        println(f"[probe] $label total=${ts.map(_._2).sum}%.3f")
        ts.foreach { case (q, t) => println(f"[probe]   $q%-10s $t%.3f") }
      }
      runAll("tpch SMJ default")
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      runAll("tpch SHJ allowed")
      spark.conf.unset("spark.sql.join.preferSortMergeJoin")
      spark.conf.unset(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
      // ordering control: a run this warm with the DEFAULT confs tells
      // whether pass 2's gain was the conf or accumulated JIT warmth
      runAll("tpch SMJ default (3rd pass)")
      spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
      spark.conf.set(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m")
      runAll("tpch SHJ allowed (4th pass)")
      spark.conf.unset("spark.sql.join.preferSortMergeJoin")
      spark.conf.unset(
        "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold")
    }

    // ---- q13 pre-agg + q_events_session single-window: old vs new
    if (only("q13sess")) {
      val cust = GraftSession.table(spark, sfDir, "customer")
      def q13old = cust
        .join(ord.filter(col("o_orderpriority") =!= "5-LOW"),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc_nulls_first("custdist"), desc_nulls_first("c_count"))
      timeDf("q13 OLD join-then-agg")(q13old)
      timeDf("q13 NEW pre-agg")(SparkEntry.queries("tpch_q13")(spark, sfDir))
      locally {
        val a = q13old.collect().map(_.toString).toSeq
        val b = SparkEntry.queries("tpch_q13")(spark, sfDir)
          .collect().map(_.toString).toSeq
        println(s"[probe] q13 rewrite equal: ${a == b} (${a.length} rows)")
      }
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(asc_nulls_last("ts"), asc_nulls_last("event_id"))
      val runSum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      def sessOld = GraftSession.table(spark, sfDir, "events")
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_us").isNull ||
            unix_micros(col("ts")) - col("prev_us") > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(runSum))
        .groupBy(col("user_id"))
        .agg(max(col("sess_id")).as("n_sessions"),
          count(lit(1)).as("n_events"),
          graft.queries.Q.sumUnscaledDbl(
            graft.queries.Q.u2(col("value")), 2).as("value_total"))
        .orderBy(col("user_id"))
      timeDf("q_events_session OLD two-window")(sessOld)
      timeDf("q_events_session NEW lag-only")(
        SparkEntry.queries("q_events_session")(spark, sfDir))
      locally {
        val a = sessOld.collect().map(_.toString).toSeq
        val b = SparkEntry.queries("q_events_session")(spark, sfDir)
          .collect().map(_.toString).toSeq
        println(s"[probe] session rewrite equal: ${a == b} (${a.length} rows)")
      }
    }

    // ---- ngram: parallelize the single-task shingle stage?
    if (only("ngram")) {
      import graft.operators.Dedup
      def agg3(p: org.apache.spark.sql.DataFrame) = p.agg(
        count(lit(1)).as("n_pairs_examined"),
        coalesce(round(max(col("jaccard")), 4), lit(0.0)).as("max_jaccard"),
        coalesce(sum(when(col("jaccard") >= 0.3, 1L).otherwise(0L)), lit(0L))
          .as("n_pairs_j30"))
      timeDf("ngram current (1-task scan)")(
        agg3(Dedup.ngramJaccardPairs(docs, "doc_id", "text")))
      timeDf("ngram repartition(32, doc_id) first")(
        agg3(Dedup.ngramJaccardPairs(
          docs.repartition(32, col("doc_id")), "doc_id", "text")))
      timeDf("minhash bucketTable repartitioned")(
        Dedup.bucketTable(docs.repartition(32, col("doc_id")), "doc_id", "text"))
      timeDf("minhash bucketTable current")(
        Dedup.bucketTable(docs, "doc_id", "text"))
      locally {
        val a = agg3(Dedup.ngramJaccardPairs(docs, "doc_id", "text"))
          .collect().map(_.toString).toSeq
        val b = agg3(Dedup.ngramJaccardPairs(
          docs.repartition(32, col("doc_id")), "doc_id", "text"))
          .collect().map(_.toString).toSeq
        println(s"[probe] ngram repartition equal: ${a == b} $a")
      }
      // full minhash gate with the LSH kernel stage parallelized
      import graft.operators.Dedup
      def minhashGate(src: org.apache.spark.sql.DataFrame,
          kernelSrc: org.apache.spark.sql.DataFrame) = {
        val norm = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
          .cast("binary"))
        val hh = src.select(col("doc_id").as("id"), norm.as("hh"))
        val exactPairs = hh.groupBy(col("hh")).agg(count(lit(1)).as("g"))
          .agg(coalesce(sum(col("g")), lit(0L)).as("n_docs"),
            coalesce(sum(col("g") * (col("g") - 1) / 2), lit(0.0))
              .cast("long").as("n_exact_dup_pairs"))
        val hashedHH = src.select(col("doc_id").as("id"),
          Dedup.shingleHashes(col("text")).as("hs"), norm.as("hh"))
        val cands = Dedup.candidatePairs(
          Dedup.bucketTable(kernelSrc, "doc_id", "text"))
        val pairs = cands
          .join(hashedHH.select(col("id").as("id1"), col("hs").as("hs1"),
            col("hh").as("hh1")), Seq("id1"))
          .join(hashedHH.select(col("id").as("id2"), col("hs").as("hs2"),
            col("hh").as("hh2")), Seq("id2"))
          .select(col("id1"), col("id2"),
            (size(array_intersect(col("hs1"), col("hs2"))).cast("double") /
              size(array_union(col("hs1"), col("hs2")))).as("jaccard"),
            col("hh1"), col("hh2"))
          .filter(col("jaccard") >= 0.7)
        val pairStats = pairs.agg(
          coalesce(sum(when(col("jaccard") === 1.0 &&
            col("hh1") === col("hh2"), 1L).otherwise(0L)), lit(0L)).as("__f"),
          count(lit(1)).as("__n"))
        exactPairs.crossJoin(pairStats)
          .select(col("n_docs"), col("n_exact_dup_pairs"),
            (col("__f") === col("n_exact_dup_pairs")).as("exact_dups_at_j100"),
            (col("__n") >= col("n_exact_dup_pairs")).as("near_ge_exact"))
      }
      timeDf("minhash gate current")(minhashGate(docs, docs))
      timeDf("minhash gate kernel-repartitioned")(
        minhashGate(docs, docs.repartition(32, col("doc_id"))))
    }

    // ---- q11: derive the scalar grand_total FROM the per-partkey
    // groups (sum of group hi/lo long partial sums, reassembled with the
    // exact sumUnscaledDbl expression) so both branches share the same
    // partial-agg Exchange (ReuseExchange) instead of evaluating the
    // lineitem⋈supplier⋈nation subtree twice.
    if (only("q11")) {
      import org.apache.spark.sql.Column
      import org.apache.spark.sql.graft.Bridge
      import org.apache.spark.sql.catalyst.expressions.{EvalMode, IntegralDivide, Literal, Remainder}
      import org.apache.spark.sql.types.DecimalType
      val fn = SparkEntry.queries("tpch_q11")
      timeDf("q11 current (2 fact passes)")(fn(spark, sfDir))
      def q11shared = {
        val natLi = li
          .join(GraftSession.table(spark, sfDir, "supplier"),
            col("l_suppkey") === col("s_suppkey"))
          .join(GraftSession.table(spark, sfDir, "nation")
            .filter(col("n_name") === "NATION_13"),
            col("s_nationkey") === col("n_nationkey"))
        val ue = Bridge.expression(graft.queries.Q.u2(col("l_extendedprice")))
        val hi = Bridge.column(IntegralDivide(ue, Literal(1000000L), EvalMode.LEGACY))
        val lo = Bridge.column(Remainder(ue, Literal(1000000L), EvalMode.LEGACY))
        def assemble(h: Column, l: Column): Column =
          ((h.cast(DecimalType(38, 0)) * lit(1000000L) + l) /
            lit(100L).cast(DecimalType(7, 0))).cast("double")
        val groups = natLi.groupBy(col("l_partkey"))
          .agg(sum(hi).as("__hi"), sum(lo).as("__lo"))
        val total = groups.agg(
          assemble(sum(col("__hi")), sum(col("__lo"))).as("grand_total"))
        groups
          .select(col("l_partkey"),
            assemble(col("__hi"), col("__lo")).as("value"))
          .crossJoin(broadcast(total))
          .filter(col("value") > col("grand_total") * 0.001)
          .select(col("l_partkey"), col("value"))
          .orderBy(desc_nulls_first("value"), asc_nulls_last("l_partkey"))
      }
      timeDf("q11 shared-exchange")(q11shared)
      locally {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        val b = q11shared.collect().map(_.toString).toSeq
        println(s"[probe] q11 rewrite equal: ${a == b} (${a.length} rows)")
        println("[probe] q11 shared plan:")
        println(q11shared.queryExecution.executedPlan.toString.take(4000))
      }
    }

    // ---- q21: replace the EXISTS semi join's 600k-row lineitem
    // broadcast build with a per-order min/max suppkey pre-aggregation
    // (EXISTS(suppkey <> s) ⟺ min_supp <> s ∨ max_supp <> s)
    if (only("q21x")) {
      val fn = SparkEntry.queries("tpch_q21")
      timeDf("q21 current (semi over full li)")(fn(spark, sfDir))
      def q21agg = {
        val ordF = ord.filter(col("o_orderstatus") === "F")
        val late = li.join(ordF, col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey"))
        val l1 = late
          .withColumn("__mn", min(col("l_suppkey")).over(w))
          .withColumn("__mx", max(col("l_suppkey")).over(w))
          .filter(col("__mn") === col("__mx"))
          .select(col("l_orderkey").as("l1_orderkey"),
            col("l_suppkey").as("l1_suppkey"))
        val perOrder = li.groupBy(col("l_orderkey").as("lo_orderkey"))
          .agg(min(col("l_suppkey")).as("__amn"),
            max(col("l_suppkey")).as("__amx"))
        l1
          .join(perOrder, col("l1_orderkey") === col("lo_orderkey"))
          .filter(col("__amn") =!= col("l1_suppkey") ||
            col("__amx") =!= col("l1_suppkey"))
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
      timeDf("q21 min/max pre-agg")(q21agg)
      locally {
        val a = fn(spark, sfDir).collect().map(_.toString).toSeq
        val b = q21agg.collect().map(_.toString).toSeq
        println(s"[probe] q21 pre-agg equal: ${a == b} (${a.length} rows)")
      }
    }

    // ---- shuffle/IO codec (guide §2.3: lz4 default vs zstd — measure
    // both), 4 alternating passes as the ordering control
    if (only("codec")) {
      val qs = Seq("tpch_q1", "tpch_q3", "tpch_q5", "tpch_q9", "tpch_q18",
        "tpch_q21", "q_dedup_minhash", "q_dedup_ngram", "q_dedup_simhash")
      def runAll(label: String): Unit = {
        val ts = qs.map { q =>
          val fn = SparkEntry.queries(q)
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          System.gc()
          val t0 = System.nanoTime()
          (0 until 3).foreach(_ => fn(spark, sfDir)
            .write.format("noop").mode("overwrite").save())
          q -> (System.nanoTime() - t0) / 3e9
        }
        println(f"[probe] $label total=${ts.map(_._2).sum}%.3f")
        ts.foreach { case (q, t) => println(f"[probe]   $q%-16s $t%.3f") }
      }
      // spark.io.compression.codec is NOT runtime-settable on an active
      // session's shuffles in local mode? It is a core conf read per
      // shuffle block writer via SparkConf — must be set before the
      // SparkContext starts. Restart the session per codec instead.
      def withCodec(codec: String)(body: => Unit): Unit = {
        spark.stop()
        spark = SparkSession.builder()
          .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.ui.enabled", "false")
          .config("spark.io.compression.codec", codec)
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        GraftSession.tune(spark)
        GraftSession.table(spark, sfDir, "lineitem").count()
        GraftSession.table(spark, sfDir, "documents").count()
        body
      }
      withCodec("lz4")(runAll("codec lz4 pass1"))
      withCodec("zstd")(runAll("codec zstd pass2"))
      withCodec("lz4")(runAll("codec lz4 pass3"))
      withCodec("zstd")(runAll("codec zstd pass4"))
      // leave the session on the default codec for any later section
      withCodec("lz4")(())
    }

    // ---- ngram stage decomposition + narrow-type variant (§2.3)
    if (only("ngram2")) {
      import graft.operators.Dedup
      val docsDf = docs
      def docsHs = docsDf.select(col("doc_id").as("id"),
        Dedup.shingleHashes(col("text"), 3).as("hs"))
      def inv = docsHs.select(col("id"),
        size(col("hs")).cast("long").as("sz"), explode(col("hs")).as("h"))
      timeDf("ngram: docs+shingles")(docsHs)
      timeDf("ngram: + explode (inv)")(inv)
      timeDf("ngram: + groupBy(h) collect_capped2")(
        inv.groupBy(col("h"))
          .agg(call_function("collect_capped2", col("id"), col("sz"),
            lit(50)).as("ids"))
          .filter(col("ids").isNotNull && size(col("ids")) >= 2))
      timeDf("ngram: + pair explode")(
        inv.groupBy(col("h"))
          .agg(call_function("collect_capped2", col("id"), col("sz"),
            lit(50)).as("ids"))
          .filter(col("ids").isNotNull && size(col("ids")) >= 2)
          .select(explode(call_function("sorted_pairs2", col("ids"))).as("p")))
      timeDf("ngram: + pair groupBy count (full pairs)")(
        Dedup.ngramJaccardPairs(docsDf, "doc_id", "text"))
      def agg3(p: org.apache.spark.sql.DataFrame) = p.agg(
        count(lit(1)).as("n_pairs_examined"),
        coalesce(round(max(col("jaccard")), 4), lit(0.0)).as("max_jaccard"),
        coalesce(sum(when(col("jaccard") >= 0.3, 1L).otherwise(0L)), lit(0L))
          .as("n_pairs_j30"))
      timeDf("ngram: full query")(agg3(Dedup.ngramJaccardPairs(docsDf, "doc_id", "text")))
      // repartition(h) variant: same exchange count (replaces the
      // groupBy's own shuffle) but the posting-list buffers build on 32
      // post-shuffle tasks instead of the single scan task
      def pairsR = inv.repartition(col("h")).groupBy(col("h"))
        .agg(call_function("collect_capped2", col("id"), col("sz"),
          lit(50)).as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
        .select(explode(call_function("sorted_pairs2", col("ids"))).as("p"))
        .groupBy(col("p.id1").as("id1"), col("p.b1").as("sz1"),
          col("p.id2").as("id2"), col("p.b2").as("sz2"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .select(col("id1"), col("id2"),
          (col("shared").cast("double") /
            (col("sz1") + col("sz2") - col("shared"))).as("jaccard"))
      timeDf("ngram: repartition(h) variant full")(agg3(pairsR))
      locally {
        val a = agg3(Dedup.ngramJaccardPairs(docsDf, "doc_id", "text"))
          .collect().map(_.toString).toSeq
        val b = agg3(pairsR).collect().map(_.toString).toSeq
        println(s"[probe] ngram repart(h) equal: ${a == b} $a $b")
        println("[probe] repart(h) plan:")
        println(agg3(pairsR).queryExecution.executedPlan.toString.take(2500))
      }
      // how many pair rows?
      println("[probe] inv rows: " + inv.count())
      println("[probe] pair rows: " + inv.groupBy(col("h"))
        .agg(call_function("collect_capped2", col("id"), col("sz"),
          lit(50)).as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
        .select(explode(call_function("sorted_pairs2", col("ids"))).as("p"))
        .count())
    }

    // ---- single-pass verify: explode pairs to (side,id), join the
    // per-id corpus relation ONCE, regroup — vs the 2-join shape that
    // evaluates the corpus subtree twice
    if (only("verify1")) {
      import graft.operators.Dedup
      val fnM = SparkEntry.queries("q_dedup_minhash")
      timeDf("minhash current (2 corpus-verify scans)")(fnM(spark, sfDir))
      def norm = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")
        .cast("binary"))
      def minhash1 = {
        val hh = docs.select(col("doc_id").as("id"), norm.as("hh"))
        val exactPairs = hh.groupBy(col("hh")).agg(count(lit(1)).as("g"))
          .agg(coalesce(sum(col("g")), lit(0L)).as("n_docs"),
            coalesce(sum(col("g") * (col("g") - 1) / 2), lit(0.0))
              .cast("long").as("n_exact_dup_pairs"))
        val hashedHH = docs.select(col("doc_id").as("id"),
          Dedup.shingleHashes(col("text")).as("hs"), norm.as("hh"))
        val cands = Dedup.candidatePairs(
          Dedup.bucketTable(docs, "doc_id", "text"))
        val sides = cands.select(explode(array(
          struct(lit(1).as("side"), col("id1").as("id"), col("id2").as("oid")),
          struct(lit(2).as("side"), col("id2").as("id"), col("id1").as("oid"))))
          .as("e")).select(col("e.side"), col("e.id"), col("e.oid"))
        val joined = sides.join(hashedHH, Seq("id"))
        val pairs = joined
          .groupBy(
            when(col("side") === 1, col("id")).otherwise(col("oid")).as("id1"),
            when(col("side") === 1, col("oid")).otherwise(col("id")).as("id2"))
          .agg(
            first(when(col("side") === 1, col("hs")), ignoreNulls = true).as("hs1"),
            first(when(col("side") === 2, col("hs")), ignoreNulls = true).as("hs2"),
            first(when(col("side") === 1, col("hh")), ignoreNulls = true).as("hh1"),
            first(when(col("side") === 2, col("hh")), ignoreNulls = true).as("hh2"))
          .select(col("id1"), col("id2"),
            (size(array_intersect(col("hs1"), col("hs2"))).cast("double") /
              size(array_union(col("hs1"), col("hs2")))).as("jaccard"),
            col("hh1"), col("hh2"))
          .filter(col("jaccard") >= 0.7)
        val pairStats = pairs.agg(
          coalesce(sum(when(col("jaccard") === 1.0 &&
            col("hh1") === col("hh2"), 1L).otherwise(0L)), lit(0L)).as("__f"),
          count(lit(1)).as("__n"))
        exactPairs.crossJoin(pairStats)
          .select(col("n_docs"), col("n_exact_dup_pairs"),
            (col("__f") === col("n_exact_dup_pairs")).as("exact_dups_at_j100"),
            (col("__n") >= col("n_exact_dup_pairs")).as("near_ge_exact"))
      }
      timeDf("minhash single-pass verify")(minhash1)
      locally {
        val a = fnM(spark, sfDir).collect().map(_.toString).toSeq
        val b = minhash1.collect().map(_.toString).toSeq
        println(s"[probe] minhash verify1 equal: ${a == b} $a $b")
      }
      val fnS = SparkEntry.queries("q_dedup_simhash")
      timeDf("simhash current (2 hh-verify scans)")(fnS(spark, sfDir))
      def simhash1 = {
        val hh = docs.select(col("doc_id").as("id"), norm.as("hh"))
        val exactPairs = hh.groupBy(col("hh")).agg(count(lit(1)).as("g"))
          .agg(coalesce(sum(col("g")), lit(0L)).as("n_docs"),
            coalesce(sum(col("g") * (col("g") - 1) / 2), lit(0.0))
              .cast("long").as("n_exact_dup_pairs"))
        val pairs = Dedup.simhashDupPairs(docs, "doc_id", "text",
          chunks = 4, maxHamming = 10)
        val sides = pairs.select(col("hamming"), explode(array(
          struct(lit(1).as("side"), col("id1").as("id"), col("id2").as("oid")),
          struct(lit(2).as("side"), col("id2").as("id"), col("id1").as("oid"))))
          .as("e")).select(col("hamming"), col("e.side"), col("e.id"), col("e.oid"))
        val joined = sides.join(hh, Seq("id"))
        val annotated = joined
          .groupBy(
            when(col("side") === 1, col("id")).otherwise(col("oid")).as("id1"),
            when(col("side") === 1, col("oid")).otherwise(col("id")).as("id2"))
          .agg(
            first(col("hamming")).as("hamming"),
            first(when(col("side") === 1, col("hh")), ignoreNulls = true).as("hh1"),
            first(when(col("side") === 2, col("hh")), ignoreNulls = true).as("hh2"))
        val pairStats = annotated.agg(
          coalesce(sum(when(col("hamming") === 0 && col("hh1") === col("hh2"),
            1L).otherwise(0L)), lit(0L)).as("__f"),
          count(lit(1)).as("__n10"))
        exactPairs.crossJoin(pairStats)
          .select(col("n_docs"), col("n_exact_dup_pairs"),
            (col("__f") === col("n_exact_dup_pairs")).as("exact_dups_at_h0"),
            (col("__n10") >= col("n_exact_dup_pairs")).as("near_ge_exact"))
      }
      timeDf("simhash single-pass verify")(simhash1)
      locally {
        val a = fnS(spark, sfDir).collect().map(_.toString).toSeq
        val b = simhash1.collect().map(_.toString).toSeq
        println(s"[probe] simhash verify1 equal: ${a == b} $a $b")
      }
    }

    // ---- md5-normalization decomposition: is the regex the cost?
    if (only("md5")) {
      timeDf("lower+trim only")(docs.select(lower(trim(col("text")))))
      timeDf("regexp_replace(\\s+) only")(docs.select(
        regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      timeDf("md5(text) no norm")(docs.select(md5(col("text").cast("binary"))))
      timeDf("full md5 norm")(docs.select(md5(regexp_replace(
        lower(trim(col("text"))), "\\s+", " ").cast("binary"))))
    }

    // ---- text-analysis regex stack decomposition
    if (only("text")) {
      import graft.operators.{TextAnalysis => TA}
      val d5 = docs.filter(col("doc_id") <= 500)
      timeDf("ts: scan 500")(d5.select(col("doc_id"), col("text")))
      timeDf("ts: tokenCount")(d5.select(TA.tokenCount(col("text"))))
      timeDf("ts: subwordCount")(d5.select(TA.subwordCount(col("text"))))
      timeDf("ts: stopwordHits")(d5.select(TA.stopwordHits(col("text"))))
      timeDf("ts: meanWordLen")(d5.select(TA.meanWordLen(col("text"))))
      timeDf("ts: qualityScore")(d5.select(TA.qualityScore(col("text"))))
      timeDf("q_text_stats full")(SparkEntry.queries("q_text_stats")(spark, sfDir))
      timeDf("q_lang_id full")(SparkEntry.queries("q_lang_id")(spark, sfDir))
      timeDf("lang: langId only")(docs.select(TA.langId(col("text"))))
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
