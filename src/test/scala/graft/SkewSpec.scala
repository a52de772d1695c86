package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted join / two-phase agg must be result-identical to their
  * unsalted equivalents — salting only changes the partitioning.
  */
class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val skewed = (1 to 10000).map { i =>
    // 80% of rows share key 1 (the hot key)
    (if (i % 5 == 0) i % 50 else 1, i.toLong)
  }.toDF("k", "v")

  private lazy val dim = (0 until 50).map(k => (k, s"name_$k")).toDF("dk", "name")

  test("saltedJoin == plain join (inner)") {
    val plain = skewed.join(dim, $"k" === $"dk").groupBy($"name")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", $"v", r = 8)
      .groupBy($"name")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin spreads the hot key across salt partitions") {
    val salted = Skew.saltLeft(skewed.filter($"k" === 1), $"v", 8)
    val counts = salted.groupBy($"__salt").count().collect().map(_.getLong(1))
    assert(counts.length == 8) // all 8 salts occupied
    val total = counts.sum.toDouble
    assert(counts.forall(c => c < total * 0.25), counts.toSeq) // no salt holds >25%
  }

  test("twoPhaseAgg == direct aggregation") {
    val direct = skewed.groupBy($"k".as("key"))
      .agg(sum($"v").as("total"), max($"v").as("mx"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val twoPhase = Skew.twoPhaseAgg(skewed, $"k", $"v", 8,
      Seq((sum(_), $"v", "total"), (max(_), $"v", "mx")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(twoPhase == direct)
  }
}
