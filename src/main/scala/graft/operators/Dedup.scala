package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (the point at 100 TB):
  *  - signatures are computed *per row* with higher-order column
  *    expressions — no shuffle, no UDF serialization, no driver state;
  *  - candidate generation shuffles only (band, bucket, id) tuples —
  *    tiny compared to the corpus — and never materializes the O(n²)
  *    pair space;
  *  - frequent-shingle suppression (maxDocFreq) caps the inverted-index
  *    blowup that kills naive pairwise joins on common n-grams;
  *  - verification joins only the candidate pairs back to signatures.
  */
object Dedup {

  /** Mersenne prime 2^31-1: (a*x+b) stays < 2^62, so the arithmetic is
    * overflow-free under ANSI mode.
    */
  private val P = 2147483647L

  /** Deterministic hash-family coefficients (public splitmix64 mixing). */
  private def coeffs(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val as = Array.fill(k)(math.floorMod(next(), P - 1) + 1) // a in [1, P-1]
    val bs = Array.fill(k)(math.floorMod(next(), P))         // b in [0, P-1]
    (as, bs)
  }

  /** Word n-gram shingles of `text` (whole text when shorter than n). */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(lower(trim(text)), "\\s+")
    when(size(words) < n, array(concat_ws(" ", words)))
      .otherwise(transform(
        sequence(lit(0), size(words) - n),
        i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** Distinct shingle hashes folded into [0, P). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), s => pmod(xxhash64(s), lit(P))))

  /** k-permutation MinHash signature of a shingle-hash array:
    * sig[i] = min over x of (a_i * x + b_i) mod P.
    */
  def minhashSignature(hashes: Column, k: Int = 64, seed: Long = 42L): Column = {
    val (as, bs) = coeffs(k, seed)
    val aLit = typedlit(as.toSeq)
    val bLit = typedlit(bs.toSeq)
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(hashes, x =>
        pmod(element_at(aLit, i + 1) * x + element_at(bLit, i + 1), lit(P)))))
  }

  /** LSH banding: hash each of `bands` contiguous signature slices.
    * Two docs sharing any band bucket are candidates; for Jaccard s,
    * P(candidate) = 1-(1-s^rows)^bands (the standard S-curve).
    */
  def lshBandBuckets(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(slice(sig, b * rows + 1, lit(rows)), b))

  /** (id, band, bucket) tuples — the only thing that shuffles. */
  def bucketTable(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, shingleN: Int = 3): DataFrame = {
    val rows = k / bands
    df.select(col(idCol).as("id"),
        minhashSignature(shingleHashes(col(textCol), shingleN), k).as("sig"))
      .select(col("id"), posexplode(lshBandBuckets(col("sig"), bands, rows))
        .as(Seq("band", "bucket")))
  }

  /** Candidate pairs (id1 < id2) from shared LSH buckets. */
  def candidatePairs(buckets: DataFrame): DataFrame = {
    val l = buckets.select(col("band"), col("bucket"), col("id").as("id1"))
    val r = buckets.select(col("band"), col("bucket"), col("id").as("id2"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Verified near-dup pairs with exact Jaccard over shingle sets. */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val hashed = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleN).as("hs"))
    val cands = candidatePairs(bucketTable(df, idCol, textCol, k, bands, shingleN))
    cands
      .join(hashed.select(col("id").as("id1"), col("hs").as("hs1")), Seq("id1"))
      .join(hashed.select(col("id").as("id2"), col("hs").as("hs2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (size(array_intersect(col("hs1"), col("hs2"))).cast("double") /
          size(array_union(col("hs1"), col("hs2")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash with banding into `chunks` slices for near-dup candidates
    * (hamming distance d < chunks ⇒ at least one identical chunk).
    */
  def simhashTable(df: DataFrame, idCol: String, textCol: String,
      chunks: Int = 4): DataFrame = {
    val bitsExpr =
      "transform(aggregate(transform(split(lower(trim(__text)), '\\\\s+'), " +
        "w -> xxhash64(w)), array_repeat(CAST(0 AS BIGINT), 64), " +
        "(acc, h) -> zip_with(acc, sequence(0, 63), " +
        "(x, i) -> x + IF(((h >> i) & 1) = 1, 1, -1))), v -> IF(v >= 0, 1, 0))"
    val chunkLen = 64 / chunks
    df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .withColumn("bits", expr(bitsExpr))
      .select(col("id"), col("bits"),
        transform(sequence(lit(0), lit(chunks - 1)), c =>
          xxhash64(slice(col("bits"), c * chunkLen + 1, lit(chunkLen)), c))
          .as("chunks"))
      .drop("__text")
  }

  /** Near-dup pairs by SimHash: candidates share a chunk, verified by
    * Hamming distance ≤ maxHamming.
    */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      chunks: Int = 4, maxHamming: Int = 3): DataFrame = {
    val t = simhashTable(df, idCol, textCol, chunks)
    val b = t.select(col("id"), col("bits"),
      posexplode(col("chunks")).as(Seq("chunk_idx", "chunk_hash")))
    val l = b.select(col("chunk_idx"), col("chunk_hash"),
      col("id").as("id1"), col("bits").as("bits1"))
    val r = b.select(col("chunk_idx"), col("chunk_hash"),
      col("id").as("id2"), col("bits").as("bits2"))
    l.join(r, Seq("chunk_idx", "chunk_hash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        aggregate(zip_with(col("bits1"), col("bits2"),
          (x, y) => when(x === y, 0).otherwise(1)),
          lit(0), (acc, v) => acc + v).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact-duplicate groups on a normalization of text. */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")
        .cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))
      .filter(col("n_copies") > 1)

  /** n-gram Jaccard all-pairs via inverted index with frequent-shingle
    * suppression (maxDocFreq caps the quadratic blowup on common n-grams).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, maxDocFreq: Int = 50,
      minShared: Int = 2): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleN).as("hs"))
    val sizes = docs.select(col("id"), size(col("hs")).as("sz"))
    val inv = docs.select(col("id"), explode(col("hs")).as("h"))
    val rare = inv.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq && col("df") >= 2)
    val filtered = inv.join(rare.select("h"), Seq("h"))
    val shared = filtered.select(col("h"), col("id").as("id1"))
      .join(filtered.select(col("h"), col("id").as("id2")), Seq("h"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    shared
      .join(sizes.select(col("id").as("id1"), col("sz").as("sz1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("sz").as("sz2")), Seq("id2"))
      .select(col("id1"), col("id2"),
        (col("shared").cast("double") /
          (col("sz1") + col("sz2") - col("shared"))).as("jaccard"))
  }
}
