package etlmudah.analytics

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** Serial-replay properties for the round-11 statistics tier: each
  * distributed operator must equal a straightforward serial
  * implementation of its DOCUMENTED definition on random inputs at
  * random partitionings — the q284/TopKProps discipline. Inputs are
  * drawn from small value pools so ties (the deterministic-order
  * seams) occur routinely. */
object Round11Props extends Properties("Round11Stats") {

  private lazy val spark = SparkTestSession.spark

  // ---- Kaplan–Meier ----------------------------------------------

  private val kmRow: Gen[(Long, Int)] = for {
    d <- Gen.chooseNum(0L, 6L)
    e <- Gen.oneOf(0, 1)
  } yield (d, e)

  private def serialKm(rows: Seq[(Long, Int)])
      : Seq[(Long, Long, Long, Double)] = {
    val byT = rows.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = rows.size.toLong
    var cumQ = 0L          // nano-nat lattice cumulative
    var dead = false
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Double)]
    for ((t, rs) <- byT) {
      val d = rs.count(_._2 == 1).toLong
      val all = rs.size.toLong
      if (d > 0) {
        if (atRisk == d) dead = true
        else cumQ += math.floor(
          math.log((atRisk - d).toDouble / atRisk) * 1e9).toLong
        val s =
          if (dead) 0.0
          else BigDecimal(math.exp(cumQ.toDouble / 1e9))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        out += ((t, atRisk, d, s))
      } else if (!dead) {
        // censored-only duration: no output row, no survival change
      }
      atRisk -= all
    }
    out.toSeq
  }

  property("kaplanMeier == serial product-limit at any partitioning") =
    forAll(Gen.nonEmptyListOf(kmRow), Gen.chooseNum(1, 5)) {
      (rows, parts) =>
        import spark.implicits._
        val got = Analytics.kaplanMeier(
            rows.toDF("dur", "ev").repartition(parts), "dur", "ev")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            r.getLong(2), r.getDouble(3))).toSeq
        got == serialKm(rows)
    }

  // ---- Gini -------------------------------------------------------

  private def serialGini(vals: Seq[(Long, Double)]): Double = {
    val sorted = vals.map { case (id, v) =>
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP), id)
    }.sortBy(x => (x._1, x._2))
    val n = sorted.size
    val sx = sorted.map(_._1).sum
    val six = sorted.zipWithIndex.map { case ((x, _), i) =>
      x * (i + 1) }.sum
    BigDecimal((2 * six - (n + 1) * sx).toDouble /
      (n.toDouble * sx.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  property("giniCoefficient == serial rank formula (duplicate-heavy values)") =
    forAll(Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 30L)
      v <- Gen.oneOf(1.0, 2.5, 2.5, 10.0, 100.0)
    } yield (id, v)), Gen.chooseNum(1, 4)) { (raw, parts) =>
      // unique ids (the operator's contract: a per-entity aggregate)
      val vals = raw.groupBy(_._1).map(_._2.head).toSeq
      vals.map(_._2).sum > 0 ==> {
        import spark.implicits._
        val got = Analytics.giniCoefficient(
            vals.toDF("id", "v").repartition(parts), "id", col("v"))
          .collect()(0).getAs[Double]("gini")
        got == serialGini(vals)
      }
    }

  // ---- TWAP -------------------------------------------------------

  property("twap == serial LOCF integral; zero-span keys omitted") =
    forAll(Gen.nonEmptyListOf(for {
      k <- Gen.oneOf(1L, 2L)
      t <- Gen.chooseNum(0L, 50L)
      v <- Gen.oneOf(0.5, 1.0, 3.25)
    } yield (k, t, v)), Gen.chooseNum(1, 4)) { (raw, parts) =>
      // unique (key, ts): the operator's tie rule orders by value,
      // which the serial replay would have to mirror — keep the
      // property on the unambiguous grain (ties covered in EventsSpec)
      val rows = raw.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      import spark.implicits._
      val df = rows.map { case (k, t, v) =>
        (k, new java.sql.Timestamp(t * 1000L), v) }
        .toDF("k", "ts", "v").repartition(parts)
      val got = Events.twap(df, "k", col("ts"), col("v"))
        .collect().map(r => r.getLong(0) -> r.getAs[Double]("twap"))
        .toMap
      val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val s = rs.sortBy(_._2)
        if (s.size < 2) None
        else {
          val span = (s.last._2 - s.head._2) * 1000000L
          val area = s.sliding(2).map { case Seq(a, b) =>
            BigDecimal(a._3).setScale(6) *
              BigDecimal((b._2 - a._2) * 1000000L)
          }.sum
          Some(k -> BigDecimal(area.toDouble / span.toDouble)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      got == want
    }
}
