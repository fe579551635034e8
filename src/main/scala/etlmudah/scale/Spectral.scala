package etlmudah.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT-INTEGER distributed PCA — the embedding-decorrelation tier a
  * training-data pipeline runs before whitening, drift analysis, or
  * dimensionality decisions (which Matryoshka prefix is safe —
  * [[Similarity.matryoshkaRecall]] — is ultimately a spectrum
  * question).
  *
  * The design splits the work by size, the LR-trainer discipline
  * ([[etlmudah.text.TextStats]] q198): the CORPUS-sized work (the
  * second-moment fold) is one [[etlmudah.expr.GramSumsAgg]] pass —
  * partial aggregation, one 33 KB buffer per partition over the
  * exchange, rows never shuffle; the DIMENSION-sized work (power
  * iteration on the d x d covariance) runs on the driver over a
  * provably bounded collect (d*d + d + 1 longs), exactly as the
  * trainer collects <= 16 weight rows per step. Everything stays on
  * an integer lattice with truncating division, so the whole chain —
  * quantize, Gram, center, rescale, iterate, project — replays bit
  * for bit in SQL (the unrolled-CTE oracle discipline PageRank and
  * the LR loop established).
  *
  * Centering uses the exact identity cov_ij = n*G_ij - s_i*s_j (all
  * BIGINT), so no floating-point mean ever exists. Each matrix-vector
  * step rescales: the covariance once to |c| <= ~2^21 (c // gdiv,
  * gdiv = max(1, max|c| // 2^20)), the iterate each round to
  * |v| <= 2^15 ((w * 32768) // max(1, max|w|)) — keeping every
  * product far from Long overflow at ANY corpus size (|w| <= d *
  * 2^21 * 2^15 = 2^42) while preserving the eigen-direction, which is
  * scale-free. Division is Java `/` == DuckDB `//` (both truncate
  * toward zero). */
object Spectral {

  /** One-pass exact Gram + column sums + count over `vecCol` as a
    * single-row frame `g: array<bigint>` of d*d + d + 1 (see
    * [[etlmudah.expr.GramSumsAgg]] for the layout). */
  def gramSums(embeddings: DataFrame, vecCol: String, dims: Int,
               scale: Int = 1024): DataFrame =
    embeddings.agg(call_function("graft_gram",
      col(vecCol), lit(dims), lit(scale)).as("g"))

  /** Driver-side lattice power iteration over the packed Gram buffer.
    * Returns (v, rayNum, rayDen): the final iterate (|v| <= 2^15),
    * and the exact Rayleigh-quotient pair v'C'v / v'v over the
    * RESCALED covariance C' — lambda ~ rayNum/rayDen, both BIGINT so
    * the oracle compares integers, not floats. */
  private[etlmudah] def powerIterate(packed: Array[Long], dims: Int,
                                  iters: Int): (Array[Long], Long, Long) = {
    val n = packed(dims * dims + dims)
    // exact centered covariance: cov_ij = n*G_ij - s_i*s_j
    val cov = new Array[Long](dims * dims)
    var i = 0
    while (i < dims) {
      var j = 0
      while (j < dims) {
        cov(i * dims + j) = n * packed(i * dims + j) -
          packed(dims * dims + i) * packed(dims * dims + j)
        j += 1
      }
      i += 1
    }
    var maxc = 1L
    cov.foreach(c => if (math.abs(c) > maxc) maxc = math.abs(c))
    val gdiv = math.max(1L, maxc / (1L << 20))
    val cg = cov.map(_ / gdiv)

    var v = Array.fill(dims)(1L)
    var w = new Array[Long](dims)
    var it = 0
    while (it < iters) {
      i = 0
      while (i < dims) {
        var acc = 0L
        var j = 0
        while (j < dims) { acc += cg(i * dims + j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      var maxw = 1L
      w.foreach(x => if (math.abs(x) > maxw) maxw = math.abs(x))
      v = w.map(x => (x * 32768L) / maxw)
      it += 1
    }
    // Rayleigh pair over the final iterate: num = v'C'v, den = v'v
    var num = 0L
    var den = 0L
    i = 0
    while (i < dims) {
      var acc = 0L
      var j = 0
      while (j < dims) { acc += cg(i * dims + j) * v(j); j += 1 }
      num += v(i) * acc
      den += v(i) * v(i)
      i += 1
    }
    (v, num, den)
  }

  /** Top principal component of `embeddings(vecCol)`: 64 rows of
    * (idx, v) — the lattice eigen-iterate after `iters` steps — plus
    * the exact Rayleigh pair as constant columns. One corpus pass
    * (the Gram fold), one bounded driver collect, zero shuffles of
    * vector rows. */
  def pcaTopComponent(embeddings: DataFrame, vecCol: String, dims: Int,
                      scale: Int = 1024, iters: Int = 3): DataFrame = {
    val spark = embeddings.sparkSession
    val packed = gramSums(embeddings, vecCol, dims, scale)
      .collect()(0).getSeq[Long](0).toArray   // bounded: d*d + d + 1
    val (v, num, den) = powerIterate(packed, dims, iters)
    import spark.implicits._
    v.zipWithIndex.map { case (x, i) => (i.toLong, x, num, den) }
      .toSeq.toDF("idx", "v", "ray_num", "ray_den")
      .orderBy(col("idx"))
  }

  /** Quantized lattice projection of every vector onto the top
    * component — p = sum_i q_i * v_i, exact BIGINT — and the topK rows
    * by |p| (the "most extreme along the principal axis" scan used to
    * eyeball what the component MEANS). The component vector is
    * dimension-sized, so it rides the plan as a literal array: the
    * projection is pure codegen'd expression work, no join at all. */
  def pcaProjectionTopK(embeddings: DataFrame, idCol: String,
                        vecCol: String, dims: Int, scale: Int = 1024,
                        iters: Int = 3, topK: Int = 10): DataFrame = {
    val packed = gramSums(embeddings, vecCol, dims, scale)
      .collect()(0).getSeq[Long](0).toArray
    val (v, _, _) = powerIterate(packed, dims, iters)
    val vLit = array(v.map(lit): _*)
    val quant = transform(col(vecCol),
      x => round(x.cast("double") * scale).cast("long"))
    embeddings
      .select(col(idCol),
        aggregate(zip_with(quant, vLit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("proj"))
      .orderBy(abs(col("proj")).desc, col(idCol).asc)
      .limit(topK)
  }
}
