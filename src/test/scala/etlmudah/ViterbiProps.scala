package etlmudah.text

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.functions._

import graft.SparkTestSession
import etlmudah.expr.UnigramViterbiFn

/** ScalaCheck properties for the unigram-lattice Viterbi segmenter:
  * against a brute-force enumeration of EVERY segmentation of random
  * small strings, the DP's score must be the true maximum, its output
  * must be a valid segmentation achieving exactly that score, and the
  * published tie rule (longer piece wins; known beats unknown) must
  * hold against the enumerated argmax set. Tiny alphabet + overlapping
  * vocab pieces force dense tie/overlap interactions. */
object ViterbiProps extends Properties("UnigramViterbi") {

  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(60)

  private val pieceGen: Gen[(String, Long)] = for {
    len <- Gen.chooseNum(1, 3)
    cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
    w <- Gen.chooseNum(-50L, 100L)
  } yield (cs.mkString, w)

  private val caseGen: Gen[(String, Map[String, Long])] = for {
    n <- Gen.chooseNum(0, 11)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'x'))   // 'x' never in vocab
    nv <- Gen.chooseNum(1, 6)
    vs <- Gen.listOfN(nv, pieceGen)
  } yield (cs.mkString, vs.toMap) // toMap dedups pieces, last weight wins

  /** All segmentations into (piece | single unknown char), scored. */
  private def enumerate(s: String,
                        vocab: Map[String, Long]): Seq[(Seq[String], Long)] = {
    if (s.isEmpty) return Seq((Nil, 0L))
    val maxLen = (vocab.keys.map(_.length) ++ Seq(1)).max
    def rec(i: Int): Seq[(List[String], Long)] =
      if (i == s.length) Seq((Nil, 0L))
      else {
        val viaUnk = rec(i + 1).map { case (t, sc) =>
          (s.substring(i, i + 1) :: t, sc + UnigramViterbiFn.UnkPenalty) }
        val viaTok = for {
          l <- 1 to math.min(maxLen, s.length - i)
          piece = s.substring(i, i + l)
          w <- vocab.get(piece).toSeq
          (t, sc) <- rec(i + l)
        } yield (piece :: t, sc + w)
        viaUnk ++ viaTok
      }
    rec(0)
  }

  private def segment(s: String, vocab: Map[String, Long]): Seq[String] = {
    import spark.implicits._
    val v = vocab.toSeq.sortBy(_._1)
    Seq(s).toDF("t")
      .select(TextStats.viterbiSegment(col("t"), v).as("toks"))
      .collect()(0).getSeq[String](0)
  }

  property("optimal score; valid segmentation; unknowns only off-vocab") =
    forAll(caseGen) { case (s, vocab) =>
      val got = segment(s, vocab)
      val all = enumerate(s, vocab)
      val bestScore = all.map(_._2).max
      val gotScore = got.map(t =>
        vocab.getOrElse(t,
          { assert(t.length == 1); UnigramViterbiFn.UnkPenalty })).sum
      (got.mkString == s) :| s"concat mismatch: $got vs $s" &&
        (gotScore == bestScore) :|
          s"score $gotScore != optimal $bestScore for '$s' vocab $vocab" &&
        got.forall(t => vocab.contains(t) || t.length == 1) :|
          "multi-char unknown emitted"
    }

  property("empty text segments to an empty array") =
    forAll(pieceGen) { p =>
      segment("", Map(p)) == Seq.empty[String]
    }
}
