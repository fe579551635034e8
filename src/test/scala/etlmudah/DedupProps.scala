package etlmudah.scale

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck properties for boilerplate stripping: token conservation,
  * the identity threshold, and serial-replay agreement over random
  * small-vocabulary corpora (small vocab forces real gram collisions
  * across docs, so the drop set is routinely non-empty). */
object DedupProps extends Properties("StripBoilerplate") {

  private lazy val spark = SparkTestSession.spark
  private val n = 3

  private val docGen: Gen[String] =
    Gen.chooseNum(0, 9).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] = Gen.listOfN(8, docGen)

  /** Serial oracle: same semantics, computed with plain Scala sets. */
  private def serial(texts: Seq[String], minDf: Int): Seq[(String, Long, Long)] = {
    // mirror Spark's split(trim(text), "\\s+"): an empty/whitespace doc
    // yields one empty token, not zero tokens
    def toks(t: String) = t.trim.split("\\s+").toSeq
    val grams = texts.map(t => toks(t).sliding(n).filter(_.length == n)
      .map(_.mkString(" ")).toSeq)
    val df = grams.map(_.toSet).flatMap(_.toSeq)
      .groupBy(identity).map { case (g, occ) => g -> occ.size }
    val drop = df.filter(_._2 >= minDf).keySet
    texts.zip(grams).map { case (t, gs) =>
      val tk = toks(t)
      val covered = gs.zipWithIndex.collect {
        case (g, i) if drop(g) => i until (i + n)
      }.flatten.toSet
      val kept = tk.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      (kept.mkString(" "), tk.length.toLong, (tk.length - kept.length).toLong)
    }
  }

  private def run(texts: Seq[String], minDf: Int): Seq[(String, Long, Long)] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Dedup.stripBoilerplate(df, "text", "doc_id", shingleN = n,
        minDf = minDf.toLong)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .sortBy(_._1).map(_._2).toSeq
  }

  property("matches the serial replay on random corpora") =
    forAll(corpusGen, Gen.chooseNum(1, 4)) { (texts, minDf) =>
      texts.isEmpty || run(texts, minDf) == serial(texts, minDf)
    }

  property("minDf above corpus size is the identity") =
    forAll(corpusGen) { texts =>
      texts.isEmpty || run(texts, texts.length + 1).forall(_._3 == 0L)
    }
}

/** ScalaCheck properties for winnowing fingerprint selection: exact
  * serial-replay agreement (including the rightmost-min tie-break and
  * the short-doc whole-doc window) over random small-vocabulary
  * corpora and window sizes. */
object WinnowProps extends Properties("WinnowFingerprints") {

  private lazy val spark = SparkTestSession.spark
  private val k = 3

  private val docGen: Gen[String] =
    Gen.chooseNum(0, 14).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] = Gen.listOfN(6, docGen)

  /** Serial oracle: the SIGMOD'03 robust rule with plain collections,
    * at either lane width (8 = 32-bit, 16 = 64-bit). */
  private def serial(texts: Seq[String], w: Int,
                     laneHex: Int): Set[(Long, Int, String)] =
    texts.zipWithIndex.flatMap { case (t, id) =>
      val toks = t.trim.split("\\s+").toSeq
      val grams = toks.sliding(k).filter(_.length == k).zipWithIndex
        .map { case (g, p) =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(g.mkString(" ").getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(laneHex)
          (p, hex)
        }.toVector
      val windows =
        if (grams.isEmpty) Vector.empty
        else if (grams.size < w) Vector(grams)
        else grams.sliding(w).toVector
      windows.map(_.minBy(g => (g._2, -g._1)))
        .map { case (p, h) => (id.toLong, p, h) }.toSet
    }.toSet

  property("matches the serial replay on random corpora, window sizes, and lane widths") =
    forAll(corpusGen, Gen.chooseNum(2, 5), Gen.oneOf(8, 16)) {
      (texts, w, laneHex) =>
        import spark.implicits._
        texts.isEmpty || {
          val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text")
          val got = Dedup.winnowFingerprints(df, "text", "doc_id", k, w,
              laneHex = laneHex)
            .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
            .toSet
          got == serial(texts, w, laneHex)
        }
    }
}


/** ScalaCheck properties for the fuzzy edit-similarity refine: exact
  * agreement with a local gate+DP replay over random small-vocabulary
  * corpora (small vocab forces real shingle sharing, so the candidate
  * gate routinely passes pairs that the DP then splits on). */
object EditSimilarityProps extends Properties("EditSimilarityPairs") {

  private lazy val spark = SparkTestSession.spark

  private val docGen: Gen[String] =
    Gen.chooseNum(0, 9).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
  private val corpusGen: Gen[List[String]] = Gen.listOfN(7, docGen)

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Local oracle: string-shingle gate (whole-token-string fallback for
    * docs under 3 tokens, the operator's contract) + textbook DP. */
  private def serial(texts: Seq[String], gate: Double,
                     minSim: Double): Set[(Long, Long, Double, Double)] = {
    def toks(t: String) = t.trim.split("\\s+").toSeq
    def sh(t: String): Set[String] = {
      val tk = toks(t)
      if (tk.length < 3) Set(tk.mkString(" "))
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val idx = texts.zipWithIndex
    (for {
      (ta, ia) <- idx
      (tb, ib) <- idx if ia < ib
      inter = (sh(ta) intersect sh(tb)).size
      uni = (sh(ta) union sh(tb)).size
      if inter.toDouble / uni >= gate
      m = math.max(ta.length, tb.length)
      sim = if (m == 0) 1.0 else round6(1.0 - lev(ta, tb).toDouble / m)
      if sim >= minSim
    } yield (ia.toLong, ib.toLong,
      round6(inter.toDouble / uni), sim)).toSet
  }

  private def run(texts: Seq[String], gate: Double,
                  minSim: Double): Set[(Long, Long, Double, Double)] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Dedup.editSimilarityPairs(df, "text", "doc_id",
        jaccardGate = gate, minEditSim = minSim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSet
  }

  property("matches the local gate+DP replay on random corpora and thresholds") =
    forAll(corpusGen, Gen.oneOf(0.3, 0.5, 0.8)) { (texts, minSim) =>
      texts.isEmpty || run(texts, 0.3, minSim) == serial(texts, 0.3, minSim)
    }
}

/** Serial-replay property for contrastive triplet mining: the Spark
  * selection (symmetrize, best positive + best hard negative per
  * anchor, (sim desc, partner asc) tie-break, both-legs requirement)
  * must equal a plain-Scala replay on random pair tables whose sims
  * come from a coarse grid (forcing real ties). */
object TripletProps extends Properties("Triplets") {

  private lazy val spark = SparkTestSession.spark
  private val simGrid = Seq(0.1, 0.3, 0.5, 0.8, 0.9, 1.0)

  private val pairsGen: Gen[List[(Long, Long, Double)]] = for {
    n <- Gen.chooseNum(0, 12)
    ps <- Gen.listOfN(n, for {
      a <- Gen.chooseNum(0L, 6L)
      b <- Gen.chooseNum(0L, 6L) if a != b
      sim <- Gen.oneOf(simGrid)
    } yield (math.min(a, b), math.max(a, b), sim))
  } yield ps.distinct.groupBy(t => (t._1, t._2))
    .map(_._2.head).toList // one sim per unordered pair

  private def serial(pairs: Seq[(Long, Long, Double)], posMin: Double)
      : Seq[(Long, Long, Double, Long, Double)] = {
    val sym = pairs.flatMap { case (a, b, s) => Seq((a, b, s), (b, a, s)) }
    def best(rows: Seq[(Long, Long, Double)]) =
      rows.groupBy(_._1).map { case (anchor, g) =>
        anchor -> g.map(t => (t._3, t._2)).sortBy(t => (-t._1, t._2)).head
      }
    val pos = best(sym.filter(_._3 >= posMin))
    val neg = best(sym.filter(_._3 < posMin))
    pos.keySet.intersect(neg.keySet).toSeq.sorted.map { a =>
      val (ps, pid) = pos(a); val (ns, nid) = neg(a)
      (a, pid, ps, nid, ns)
    }
  }

  property("matches the serial replay on random pair tables") =
    forAll(pairsGen) { pairs =>
      import spark.implicits._
      val df = pairs.toDF("id_a", "id_b", "jaccard")
      val got = Dedup.tripletsFromPairs(df, posMin = 0.8)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getDouble(4))).toSeq
      got == serial(pairs, 0.8)
    }
}
