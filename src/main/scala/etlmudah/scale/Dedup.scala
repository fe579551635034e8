package etlmudah.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import etlmudah.text.TextStats

/** Deduplication at training-data scale: exact, MinHash+LSH banded
  * near-dup, SimHash, n-gram Jaccard.
  *
  * Scale design (the 100 TB contract):
  *  - NEVER an all-pairs cross join. Candidates come only from LSH band
  *    buckets (MinHash) or 16-bit SimHash chunks — the self-join key is
  *    (band index, band hash), so cost is sum of |bucket|^2 over buckets,
  *    which banding keeps tiny for non-duplicate corpora. Degenerate
  *    buckets are capped (`maxBucketSize`) before the pair join.
  *  - Signatures are computed explode -> partial-aggregate, NOT as per-row
  *    nested higher-order functions. Spark's array lambdas are
  *    CodegenFallback (interpreted) and CollapseProject inlines upstream
  *    expressions into lambda bodies, re-evaluating tokenization once per
  *    lambda iteration — measured 100x slowdowns. The explode shape keeps
  *    every operator inside whole-stage codegen, combines map-side
  *    (partial min/sum before any exchange), and shuffles only
  *    (id, seed, hash) longs — a few KB per document regardless of text
  *    size.
  *  - Candidate pair joins carry IDs only; shingle payloads re-join for
  *    the exact-Jaccard refine, bounded by candidate count, not corpus.
  */
object Dedup {

  /** Exact dedup: keep one deterministic winner per normalized-text
    * fingerprint (lowest id wins). One shuffle on the fingerprint. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col("__fp")).orderBy(col(idCol).asc)
    df.withColumn("__fp", TextStats.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** Per-document LSH band hashes via distributed MinHash:
    * explode (id, shingle) -> k seeded hashes each -> partial min per
    * (id, seed) -> band hash over each r-seed slice. Returns
    * (id, band, bhash). Documents with zero shingles drop out (nothing
    * to match on). */
  def minhashBands(shingled: DataFrame, idCol: String, shCol: String,
                   k: Int, bands: Int): DataFrame = {
    val rowsPerBand = k / bands
    require(bands * rowsPerBand == k, "k must be divisible by bands")
    val hashed = shingled
      .select(col(idCol).as("id"), explode(col(shCol)).as("shingle"))
      .select(col("id"),
        posexplode(transform(sequence(lit(0), lit(k - 1)),
          i => xxhash64(i, col("shingle")))).as(Seq("seed", "h")))
    val sig = hashed.groupBy(col("id"), col("seed")).agg(min(col("h")).as("mh"))
    sig.groupBy(col("id"),
        (col("seed") / lit(rowsPerBand)).cast("int").as("band"))
      .agg(xxhash64(concat_ws(",",
        transform(sort_array(collect_list(struct(col("seed"), col("mh")))),
          s => s.getField("mh").cast("string")))).as("bhash"))
  }

  /** Candidate pairs from MinHash LSH + exact n-gram Jaccard refine.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= minJaccard,
    * ordered desc. k=128, bands=32 (r=4) targets the ~0.7+ band with
    * near-total recall. */
  def nearDupPairs(df: DataFrame, textCol: String, idCol: String,
                   shingleN: Int = 3, k: Int = 128, bands: Int = 32,
                   minJaccard: Double = 0.7,
                   maxBucketSize: Int = 1000): DataFrame = {
    val shingled = df.select(col(idCol).as("id"),
      TextStats.shingles(col(textCol), shingleN).as("sh"))
    val buckets = minhashBands(shingled, "id", "sh", k, bands)

    // Degenerate-bucket guard before the quadratic-in-bucket-size join.
    val sized = buckets.withColumn("bsz",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bhash"))))
      .filter(col("bsz") <= maxBucketSize)

    val cands = sized.select(col("band"), col("bhash"), col("id").as("id_a"))
      .join(sized.select(col("band"), col("bhash"), col("id").as("id_b")),
        Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()   // a pair may collide in several bands; ids only -> cheap

    cands
      .join(shingled.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(shingled.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a").asc, col("id_b").asc)
  }

  /** 64-bit SimHash per document, computed explode-side (codegen-friendly):
    * one vote row per (doc, bit) summed from token hashes, then packed.
    * Returns (id, sh64). Empty-token docs drop out. */
  def simhashAll(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = df
      .select(col(idCol).as("id"), explode(TextStats.tokens(col(textCol))).as("t"))
      .select(col("id"), xxhash64(col("t")).as("th"))
    val votes = tok.select(col("id"), posexplode(expr(
      "transform(sequence(0, 63), b -> " +
        "CASE WHEN (th >> CAST(b AS INT)) & 1L = 1L THEN 1L ELSE -1L END)"))
      .as(Seq("bit", "vote")))
    votes.groupBy("id", "bit").agg(sum("vote").as("v"))
      .groupBy("id")
      .agg(expr("sum(CASE WHEN v > 0 THEN shiftleft(1L, 63 - CAST(bit AS INT)) " +
        "ELSE 0L END)").as("sh64"))
  }

  def hammingDist(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64-bit hash into 4 x 16-bit chunks;
    * any pair within Hamming distance 3 must agree on at least one chunk
    * (pigeonhole), so the candidate join is exact-match on
    * (chunk index, chunk value) — never all-pairs. */
  def simhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      maxHamming: Int = 3): DataFrame = {
    val withHash = simhashAll(df, textCol, idCol)
    val chunked = withHash.select(col("id"), col("sh64"),
      posexplode(array((0 until 4).map(i =>
        shiftrightunsigned(col("sh64"), 16 * i).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "cval")))
    val l = chunked.select(col("chunk"), col("cval"),
      col("id").as("id_a"), col("sh64").as("h_a"))
    val r = chunked.select(col("chunk"), col("cval"),
      col("id").as("id_b"), col("sh64").as("h_b"))
    l.join(r, Seq("chunk", "cval"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hammingDist(col("h_a"), col("h_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("hamming").asc, col("id_a").asc, col("id_b").asc)
  }
}
