package etlmudah.ml

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._

class PricePipelineSpec extends SparkSpec {

  private lazy val trained = PricePipeline.train(
    Tables.part(spark, sf0001),
    catCols = Seq("p_brand", "p_type"),
    numCols = Seq("p_size"),
    labelCol = "p_retailprice")

  test("train: split sizes, R-squared bounds (M3/M5)") {
    assert(trained.nTrain + trained.nTest == 200)
    assert(trained.nTrain > 140 && trained.nTrain < 180)   // ~80/20 seeded
    assert(trained.r2Train <= 1.0 && trained.r2Test <= 1.0)
    assert(trained.r2Train > 0.0)   // RF memorizes most of a 160-row train set
  }

  test("importances: one per feature, sum to 1, sorted desc (M7)") {
    implicit val s = spark
    val imps = PricePipeline.importances(trained).collect()
    assert(imps.map(_.getString(0)).toSet ==
      Set("p_size", "p_brand_idx", "p_type_idx"))
    assert(math.abs(imps.map(_.getDouble(1)).sum - 1.0) < 1e-9)
    val vals = imps.map(_.getDouble(1))
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b })
  }

  test("predictOne: prediction within label range, +/-15 pct band (M6)") {
    import spark.implicits._
    val point = Seq(("Brand#13", "PROMO", 20)).toDF("p_brand", "p_type", "p_size")
    val r = PricePipeline.predictOne(trained, point).collect().head
    val (pred, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    val Array(mn, mx) = Tables.part(spark, sf0001)
      .agg(min("p_retailprice"), max("p_retailprice")).collect()
      .map(r0 => Array(r0.getDouble(0), r0.getDouble(1))).head
    assert(pred >= mn && pred <= mx)
    assert(math.abs(lo - pred * 0.85) < 1e-9 && math.abs(hi - pred * 1.15) < 1e-9)
  }

  test("min-sample guard rejects tiny frames (M8)") {
    val tiny = Tables.part(spark, sf0001).limit(10)
    val e = intercept[IllegalArgumentException] {
      PricePipeline.train(tiny, Seq("p_brand"), Seq("p_size"), "p_retailprice")
    }
    assert(e.getMessage.contains("100"))
  }

  test("determinism: same seed, same test R-squared (M3/M4 seeding)") {
    val again = PricePipeline.train(
      Tables.part(spark, sf0001),
      catCols = Seq("p_brand", "p_type"),
      numCols = Seq("p_size"),
      labelCol = "p_retailprice")
    assert(again.r2Test == trained.r2Test)
  }
}
