package etlmudah.scale

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkTestSession

/** ScalaCheck properties for the portable PQ encode: exact agreement
  * with a local replay of pick + lattice + argmin over random vector
  * sets and random (m, codes) configurations — the q177 oracle's
  * semantics, re-derived in plain Scala instead of SQL, exercised at
  * parameter points the registered query never visits (including
  * corpora SMALLER than the codebook). */
object PqProps extends Properties("PqEncodePortable") {

  private lazy val spark = SparkTestSession.spark

  // tiny dims keep the DP... the explode volume small; values land in
  // [-1, 1) like real embeddings
  private val dims = 8
  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(dims, Gen.chooseNum(-1000, 999).map(_ / 1000.0f))
      .map(_.toArray)
  private val corpusGen: Gen[List[Array[Float]]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, vecGen))
  private val mGen: Gen[Int] = Gen.oneOf(2, 4)
  private val codesGen: Gen[Int] = Gen.oneOf(2, 4, 16)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def q(x: Float): Long = math.floor(x.toDouble * 1e6).toLong

  /** Local replay: md5-rank pick (under-filled when the corpus is
    * smaller than `codes`), per-subspace integer argmin, lowest-code
    * ties. */
  private def serial(vecs: Seq[(Long, Array[Float])], m: Int,
                     codes: Int): Map[(Long, Long), (Long, Long)] = {
    val d = dims / m
    val lat = vecs.map { case (id, v) => id -> v.map(q) }.toMap
    val pickIds = vecs.map(_._1).sortBy(id => (md5hex(id.toString), id))
      .take(codes)
    (for {
      (id, _) <- vecs
      sub <- 0 until m
    } yield {
      val sv = lat(id).slice(sub * d, sub * d + d)
      val best = pickIds.zipWithIndex.map { case (cid, code) =>
        val cv = lat(cid).slice(sub * d, sub * d + d)
        (cv.zip(sv).map { case (a, b) => (a - b) * (a - b) }.sum,
          code.toLong)
      }.min
      (id, sub.toLong) -> (best._2, best._1)
    }).toMap
  }

  private def run(vecs: Seq[(Long, Array[Float])], m: Int,
                  codes: Int): Map[(Long, Long), (Long, Long)] = {
    import spark.implicits._
    val df = vecs.toDF("vec_id", "embedding")
    Similarity.pqEncodePortable(df, "vec_id", "embedding",
        m = m, codes = codes, dims = dims)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  property("matches the local pick+lattice+argmin replay on random configs") =
    forAll(corpusGen, mGen, codesGen) { (raw, m, codes) =>
      val vecs = raw.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      run(vecs, m, codes) == serial(vecs, m, codes)
    }
}
