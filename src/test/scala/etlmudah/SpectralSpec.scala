package etlmudah.scale

import graft.SparkSpec
import etlmudah.Tables
import etlmudah.expr.GramSumsAgg
import org.apache.spark.sql.functions._

class SpectralSpec extends SparkSpec {

  private val dims = 4

  private def serialPacked(vecs: Seq[Seq[Double]], scale: Int): Array[Long] = {
    val out = new Array[Long](dims * dims + dims + 1)
    vecs.foreach { v =>
      val q = v.map(GramSumsAgg.quantize(_, scale))
      for (i <- 0 until dims; j <- 0 until dims)
        out(i * dims + j) += q(i) * q(j)
      for (i <- 0 until dims) out(dims * dims + i) += q(i)
      out(dims * dims + dims) += 1L
    }
    out
  }

  test("graft_gram: distributed fold equals the serial one; partitioning cannot matter") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vecs = Seq.fill(200)(Seq.fill(dims)(rng.nextDouble() - 0.5))
    val df = vecs.map(v => Tuple1(v.map(_.toFloat).toArray)).toDF("vec")
    def fold(d: org.apache.spark.sql.DataFrame) =
      Spectral.gramSums(d, "vec", dims, 1024).collect()(0).getSeq[Long](0)
    val dist = fold(df.repartition(7))
    val one = fold(df.coalesce(1))
    // serial side quantizes float->double like the aggregate does
    val want = serialPacked(vecs.map(_.map(_.toFloat.toDouble)), 1024).toSeq
    assert(dist == want)
    assert(one == dist)
  }

  test("quantize: JVM lattice matches SQL round(x*scale) incl. halves and negatives") {
    import spark.implicits._
    val xs = Seq(0.0, 0.5 / 1024, -0.5 / 1024, 2.5 / 1024, -2.5 / 1024,
      0.3371, -0.57736539840698242, 0.51938825845718384)
    val rows = xs.toDF("x")
      .select(col("x"), round(col("x") * 1024).cast("long").as("q"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == GramSumsAgg.quantize(r.getDouble(0), 1024),
        s"x=${r.getDouble(0)}")
    }
    // the tie cases must actually be ties on the lattice
    assert(GramSumsAgg.quantize(0.5 / 1024, 1024) == 1L)
    assert(GramSumsAgg.quantize(-0.5 / 1024, 1024) == -1L)
  }

  test("powerIterate: recovers the dominant eigen-direction of a planted covariance") {
    // a corpus whose covariance is dominated by direction (3,1,0,0):
    // x = t*(3,1,0,0)/sqrt(10) + small noise
    val rng = new scala.util.Random(11)
    val vecs = Seq.fill(400) {
      val t = rng.nextGaussian() * 0.3
      Seq(3 * t / math.sqrt(10) + rng.nextGaussian() * 0.01,
        t / math.sqrt(10) + rng.nextGaussian() * 0.01,
        rng.nextGaussian() * 0.01, rng.nextGaussian() * 0.01)
    }
    val packed = serialPacked(vecs, 1024)
    val (v, num, den) = Spectral.powerIterate(packed, dims, iters = 5)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    val cos = (3 * v(0) + v(1)) / (math.sqrt(10) * norm)
    assert(math.abs(cos) > 0.999, s"v=${v.toSeq} cos=$cos")
    assert(den > 0 && num > 0, "planted positive spectrum")
  }

  test("pcaTopComponent: deterministic under repartitioning (the lattice guarantee)") {
    val emb = Tables.embeddings(spark, sf0001)
    val a = Spectral.pcaTopComponent(emb, "embedding", 64).collect()
    val b = Spectral.pcaTopComponent(emb.repartition(13), "embedding", 64)
      .collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    // the iterate is max-normalized: some component must sit at +-2^15
    assert(a.map(r => math.abs(r.getLong(1))).max == 32768L)
  }

  test("pcaProjectionTopK: JVM replay of the full chain on testdata") {
    val emb = Tables.embeddings(spark, sf0001)
    val got = Spectral.pcaProjectionTopK(emb, "vec_id", "embedding", 64,
      topK = 10).collect().map(r => (r.getLong(0), r.getLong(1)))
    // replay: quantize, Gram, iterate, project — all in plain Scala
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    val packed = {
      val out = new Array[Long](64 * 64 + 64 + 1)
      rows.foreach { case (_, v) =>
        val q = v.map(GramSumsAgg.quantize(_, 1024))
        for (i <- 0 until 64; j <- 0 until 64) out(i * 64 + j) += q(i) * q(j)
        for (i <- 0 until 64) out(64 * 64 + i) += q(i)
        out(64 * 64 + 64) += 1L
      }
      out
    }
    val (v, _, _) = Spectral.powerIterate(packed, 64, 3)
    val want = rows.map { case (id, x) =>
      val q = x.map(GramSumsAgg.quantize(_, 1024))
      (id, q.zip(v).map { case (a, b) => a * b }.sum)
    }.sortBy { case (id, p) => (-math.abs(p), id) }.take(10).toSeq
    assert(got.toSeq == want)
  }

  test("plan shapes: gram folds map-side; the projection carries no join") {
    val emb = Tables.embeddings(spark, sf0001)
    val gramPlan = Spectral.gramSums(emb, "embedding", 64)
      .queryExecution.executedPlan.toString
    assert(gramPlan.contains("partial_graft_gram"), gramPlan.take(600))
    val projPlan = Spectral.pcaProjectionTopK(emb, "vec_id", "embedding", 64)
      .queryExecution.executedPlan.toString
    assert(!projPlan.contains("Join"),
      "the component must ride as a literal, not a join\n" + projPlan.take(600))
    assert(projPlan.contains("TakeOrderedAndProject"), projPlan.take(600))
  }
}
