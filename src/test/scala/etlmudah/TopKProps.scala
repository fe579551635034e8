package etlmudah.analytics

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck properties for the `graft_topk` bounded heap: the
  * distributed aggregate must equal the serial DEFINITION — sort the
  * whole multiset by (score DESC, tag ASC), take k — for arbitrary
  * inputs, arbitrary k, and arbitrary partitioning. Heavy duplicate
  * mass (scores from a 5-value pool, tags from a 6-value pool) forces
  * routine ties and repeated (score, tag) pairs, the cases where a
  * heap with a broken total order diverges. The tag pool mixes a
  * supplementary-plane tag (U+1F600, UTF-16 surrogate pair) with a
  * private-use BMP tag (U+E000): String.compareTo (UTF-16 code-unit
  * order) sorts U+1F600 BEFORE U+E000 while code-point/UTF-8 order —
  * the Spark SQL and DuckDB string order the oracle uses — sorts it
  * AFTER, so a heap comparing with compareTo fails this suite. */
object TopKProps extends Properties("GraftTopK") {

  private lazy val spark = SparkTestSession.spark

  private val rowGen: Gen[(String, Double, String)] = for {
    g <- Gen.oneOf("g1", "g2")
    s <- Gen.oneOf(0.0, 1.5, -2.25, 3.0, 1.5)
    t <- Gen.oneOf("a", "b", "c", "aa", "", "b",
      "😀", "", "x😀", "x")
  } yield (g, s, t)

  /** Code-point (= UTF-8 byte) order — Spark/DuckDB string ORDER BY. */
  private def cpLess(a: String, b: String): Boolean = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < ab.length && i < bb.length) {
      val c = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    ab.length < bb.length
  }

  private def serial(rows: Seq[(String, Double, String)], k: Int)
      : Set[(String, Long, Double, String)] =
    rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.map(r => (r._2, r._3))
        .sortWith { (a, b) =>
          val c = java.lang.Double.compare(b._1, a._1)
          c < 0 || (c == 0 && cpLess(a._2, b._2))
        }
        .take(k).zipWithIndex
        .map { case ((s, t), i) => (g, (i + 1).toLong, s, t) }
    }.toSet

  property("equals sort-take-k for any rows, k, partitioning") =
    forAll(Gen.listOf(rowGen), Gen.chooseNum(1, 7),
      Gen.chooseNum(1, 5)) { (rows, k, parts) =>
      import spark.implicits._
      val got =
        if (rows.isEmpty) Set.empty[(String, Long, Double, String)]
        else Analytics.topNPerGroupAgg(
            rows.toDF("g", "s", "t").repartition(parts),
            Seq("g"), col("s"), col("t"), k)
          .collect().map(r => (r.getString(0), r.getLong(1),
            r.getDouble(2), r.getString(3))).toSet
      got == serial(rows, k)
    }
}
