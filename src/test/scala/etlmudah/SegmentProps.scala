package etlmudah.expr

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.SparkTestSession

/** ScalaCheck properties for the segment bucketing (SURVEY §5.3):
  * totality and monotonicity over the half-open boundaries of
  * constants.py:26-48. */
object SegmentProps extends Properties("PriceSegment") {

  private lazy val spark = SparkTestSession.spark
  private val labels = Seq("Budget (< 25k)", "Economy (25k - 50k)",
    "Mid-Range (50k - 100k)", "Premium (100k - 200k)", "Luxury (> 200k)")

  private def segs(prices: Seq[Double]): Seq[String] = {
    import spark.implicits._
    prices.toDF("p")
      .select(Exprs.priceSegment(col("p"), 25000, 50000, 100000, 200000).as("s"))
      .collect().map(_.getString(0)).toSeq
  }

  private val priceGen = Gen.oneOf(
    Gen.choose(-1e5, 1e7),
    Gen.oneOf(0.0, 24999.999, 25000.0, 50000.0, 100000.0, 200000.0))

  property("totality: every price maps to exactly one known label") =
    forAll(Gen.listOfN(20, priceGen)) { ps =>
      ps.isEmpty || segs(ps).forall(labels.contains)
    }

  property("monotone: higher price never maps to a lower segment") =
    forAll(Gen.listOfN(10, priceGen)) { ps =>
      val sorted = ps.sorted
      val idx = segs(sorted).map(labels.indexOf)
      idx.zip(idx.drop(1)).forall { case (a, b) => a <= b }
    }
}
