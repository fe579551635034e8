package etlmudah.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ListingsSpec extends SparkSpec {

  private val fullJson =
    """{"id": 101, "attributes": {"subject": "Perodua Myvi 1.3",
      |"make": "Perodua", "model": "Myvi", "year": "2018",
      |"mileage": {"gte": "40000", "lte": "50000"},
      |"transmission": "Automatic", "fuel_type": "Petrol",
      |"car_type": "Hatchback", "location": "kl",
      |"seller_name": "Ali", "ad_url": "https://x/101",
      |"region_id": "7", "image_count": 5, "price": 32000.0,
      |"list_time": 1700000000}}""".stripMargin.replace("\n", " ")

  private val sparseJson = """{"id": 102, "attributes": {"price": 5000.0}}"""

  test("flattenListing: full payload maps to all 17 columns") {
    import spark.implicits._
    val flat = Seq(fullJson).toDF("raw")
      .select(Listings.flattenListing(col("raw")): _*)
    val r = flat.collect().head
    assert(r.getAs[Long]("listing_id") == 101L)
    assert(r.getAs[String]("title") == "Perodua Myvi 1.3")
    assert(r.getAs[String]("mileage_min") == "40000")
    assert(r.getAs[Int]("image_count") == 5)
    assert(flat.columns.length == 16)
  }

  test("flattenListing: missing attributes get the reference defaults") {
    import spark.implicits._
    val r = Seq(sparseJson).toDF("raw")
      .select(Listings.flattenListing(col("raw")): _*).collect().head
    assert(r.getAs[String]("make") == "")
    assert(r.getAs[String]("mileage_min") == "0")
    assert(r.getAs[Int]("image_count") == 0)
    assert(r.getAs[Double]("price") == 5000.0)
  }

  test("flattenMotoListing: moto field names map to the 12-column shape") {
    import spark.implicits._
    val motoJson =
      """{"id": 201, "attributes": {"subject": "Yamaha Y15ZR",
        |"price": 7800.0, "motorcycle_make_name": "Yamaha",
        |"motorcycle_model_name": "Y15ZR", "manufactured_year": "2021",
        |"region_name": "Selangor", "name": "Abu", "date": "2024-01-02",
        |"image_count": 3, "adview_url": "https://x/201",
        |"region_id": "12"}}""".stripMargin.replace("\n", " ")
    val flat = Seq(motoJson).toDF("raw")
      .select(Listings.flattenMotoListing(col("raw")): _*)
    val r = flat.collect().head
    assert(flat.columns.length == 12)
    assert(r.getAs[Long]("listing_id") == 201L)
    assert(r.getAs[String]("make") == "Yamaha")
    assert(r.getAs[String]("year") == "2021")
    assert(r.getAs[String]("location") == "Selangor")
    assert(r.getAs[String]("seller_name") == "Abu")
    assert(r.getAs[String]("listing_date") == "2024-01-02")
    assert(r.getAs[String]("ad_url") == "https://x/201")
  }

  test("flattenMotoListing: missing attributes get the reference defaults") {
    import spark.implicits._
    val sparse = """{"id": 202, "attributes": {"subject": "RS150"}}"""
    val r = Seq(sparse).toDF("raw")
      .select(Listings.flattenMotoListing(col("raw")): _*).collect().head
    assert(r.getAs[Double]("price") == 0.0)
    assert(r.getAs[String]("make") == "")
    assert(r.getAs[String]("listing_date") == "")
    assert(r.getAs[Int]("image_count") == 0)
  }

  test("cleanListings: dirty rows drop, derived columns computed") {
    import spark.implicits._
    val dirtyYear = """{"id": 103, "attributes": {"year": "20x8", "price": 9000.0}}"""
    val freePrice = """{"id": 104, "attributes": {"year": "2019", "price": 0.0}}"""
    val flat = Seq(fullJson, sparseJson, dirtyYear, freePrice).toDF("raw")
      .select(Listings.flattenListing(col("raw")): _*)
    val clean = Listings.cleanListings(flat, nowYear = 2026)
    val rows = clean.collect()
    assert(rows.map(_.getAs[Long]("listing_id")).toSeq == Seq(101L))
    assert(rows.head.getAs[Int]("age") == 8)
    assert(rows.head.getAs[Double]("mileage_avg") == 45000.0)
  }
}
