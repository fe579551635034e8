package etlmudah.text

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck property for BATCHED BPE training: exact agreement with
  * the serial one-merge-per-recount replay over random small-vocabulary
  * corpora (tiny alphabet forces dense pair interactions — shared
  * symbols, ties, merged-symbol collisions — the exact cases the batch
  * walk's conflict-stop and tie-trim must handle). */
object BpeProps extends Properties("BpeMerges") {

  private lazy val spark = SparkTestSession.spark

  // each case drives a multi-round Spark loop; 25 diverse corpora beat
  // 100 near-duplicates at a quarter the wall time
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(25)

  private val wordGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val corpusGen: Gen[List[String]] =
    Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, wordGen))

  /** Serial oracle: recount-argmax-apply, one merge at a time — the
    * reference semantics the batch must reproduce exactly. */
  private def serial(counts: Map[String, Long], nMerges: Int,
                     minPairFreq: Long): Seq[(Int, String, String, String, Long)] = {
    var vocab = counts.toSeq.map { case (w, c) =>
      (w.toCharArray.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var rank = 0
    var go = true
    while (go && rank < nMerges) {
      val freqs = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => freqs((a, b)) = freqs.getOrElse((a, b), 0L) + c
          case _ =>
        }
      }
      if (freqs.isEmpty) go = false
      else {
        val ((l, r), f) = freqs.minBy { case ((a, b), c) => (-c, a, b) }
        if (f < minPairFreq) go = false
        else {
          out += ((rank, l, r, l + r, f))
          vocab = vocab.map { case (syms, c) =>
            val acc = scala.collection.mutable.ArrayBuffer.empty[String]
            syms.foreach { s =>
              if (acc.nonEmpty && acc.last == l && s == r)
                acc(acc.length - 1) = l + r
              else acc += s
            }
            (acc.toVector, c)
          }
          rank += 1
        }
      }
    }
    out.toSeq
  }

  property("batched merges equal the serial replay on random corpora") =
    forAll(corpusGen, Gen.chooseNum(1, 5), Gen.oneOf(1, 2, 4, 16)) {
      (words, nMerges, maxBatch) =>
        import spark.implicits._
        val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
        val got = TextStats.bpeMerges(df, "text", nMerges = nMerges,
            minPairFreq = 2L, maxBatch = maxBatch)
          .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
            r.getString(3), r.getLong(4))).toSeq
        val counts = words.groupBy(identity)
          .map { case (w, g) => w -> g.size.toLong }
        got == serial(counts, nMerges, 2L)
    }

  private[text] def serialReplay(counts: Map[String, Long], nMerges: Int,
                                 minPairFreq: Long) =
    serial(counts, nMerges, minPairFreq)
}

/** Deep-training property in its OWN object so its case count can be
  * small: each case drives a ~20-round Spark loop, and 5 diverse deep
  * corpora gate the incremental pair frame as hard as 25 shallow ones
  * gate the batch walk. */
object BpeDeepProps extends Properties("BpeMergesDeep") {

  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  // deep training: long random words over a wider alphabet sustain
  // 64 merges, so the INCREMENTAL pair frame survives many rounds of
  // deltas (a single stale or phantom pair row would flip some argmax
  // and diverge from the serial recount long before rank 64); the
  // 8-letter alphabet keeps top pairs symbol-diverse so the disjoint
  // batch walk accepts large batches — both loop regimes covered
  private val deepWordGen: Gen[String] =
    Gen.chooseNum(6, 14).flatMap(len =>
      Gen.listOfN(len,
        Gen.oneOf('a', 'b', 'c', 'd', 'e', 'f', 'g', 'h')).map(_.mkString))
  private val deepCorpusGen: Gen[List[String]] =
    Gen.chooseNum(40, 80).flatMap(n => Gen.listOfN(n, deepWordGen))

  property("incremental pair frame equals serial recount at nMerges=64") =
    forAll(deepCorpusGen) { words =>
      import spark.implicits._
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = TextStats.bpeMerges(df, "text", nMerges = 64,
          minPairFreq = 2L, maxBatch = 16)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      val counts = words.groupBy(identity)
        .map { case (w, g) => w -> g.size.toLong }
      got == BpeProps.serialReplay(counts, 64, 2L)
    }
}
