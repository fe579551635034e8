package etlmudah.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExprsSpec extends SparkSpec {

  private val labels = Set("Budget (< 25k)", "Economy (25k - 50k)",
    "Mid-Range (50k - 100k)", "Premium (100k - 200k)", "Luxury (> 200k)")

  private def segsOf(prices: Seq[Double]): Seq[String] = {
    import spark.implicits._
    prices.toDF("p")
      .select(Exprs.priceSegment(col("p"), 25000, 50000, 100000, 200000).as("s"))
      .collect().map(_.getString(0)).toSeq
  }

  test("priceSegment: half-open boundaries (constants.py:26-48 semantics)") {
    val out = segsOf(Seq(0, 24999.99, 25000, 50000, 100000, 200000, 1e9))
    assert(out == Seq("Budget (< 25k)", "Budget (< 25k)", "Economy (25k - 50k)",
      "Mid-Range (50k - 100k)", "Premium (100k - 200k)", "Luxury (> 200k)",
      "Luxury (> 200k)"))
  }

  test("priceSegment: totality — 500 seeded random doubles all map to one of 5 labels") {
    val rnd = new scala.util.Random(42)
    val prices = Seq.fill(500)(rnd.nextDouble() * 1.1e7 - 1e6)
    assert(segsOf(prices).forall(labels.contains))
  }

  test("carPriceSegment: reference-exact labels at the boundaries") {
    import spark.implicits._
    val out = Seq(1000.0, 25000.0, 60000.0, 150000.0, 500000.0).toDF("p")
      .select(Exprs.carPriceSegment(col("p")).as("s"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("Budget (< RM25k)", "Entry Level (RM25k-50k)",
      "Mid-Range (RM50k-100k)", "Premium (RM100k-200k)", "Luxury (> RM200k)"))
  }

  test("motoPriceSegment: moto thresholds preset") {
    import spark.implicits._
    val out = Seq(3000.0, 15000.0, 99999.0).toDF("p")
      .select(Exprs.motoPriceSegment(col("p")).as("s"))
      .collect().map(_.getString(0))
    assert(out.toSeq == Seq("Budget (< RM5k)", "Mid-Range (RM10k-20k)",
      "Luxury (> RM40k)"))
  }

  test("standardize: alias mapped, unknown passes through, null stays null") {
    import spark.implicits._
    val df = Seq(Some("kl"), Some("penang"), Some("unknown city"), None).toDF("loc")
    val out = df.select(Exprs.standardize(col("loc"),
      Map("kl" -> "Kuala Lumpur", "penang" -> "Pulau Pinang")).as("std"))
      .collect().map(r => Option(r.getString(0)))
    assert(out.toSeq == Seq(Some("Kuala Lumpur"), Some("Pulau Pinang"),
      Some("unknown city"), None))
  }

  test("cleanNumeric: null on malformed, value on clean (errors='coerce')") {
    import spark.implicits._
    val df = Seq("12.5", "abc", "", "0", "-3.25", "1e3").toDF("x")
    val out = df.select(Exprs.cleanNumeric(col("x")).as("v")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(12.5), None, None, Some(0.0), Some(-3.25), Some(1000.0)))
  }

  test("validYear: exactly 4 digits") {
    import spark.implicits._
    val df = Seq("2020", "202", "20200", "20a0", " 2020", "").toDF("y")
    val out = df.select(Exprs.validYear(col("y")).as("ok")).collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, false, false, false, false, false))
  }

  test("clipUpper: caps above, passes below, preserves null") {
    import spark.implicits._
    val df = Seq(Some(250000.0), Some(199999.0), None).toDF("m")
    val out = df.select(Exprs.clipUpper(col("m"), 200000).as("c")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out.toSeq == Seq(Some(200000.0), Some(199999.0), None))
  }
}
