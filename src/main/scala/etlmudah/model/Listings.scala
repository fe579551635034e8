package etlmudah.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's listing data model (SURVEY §1.1/§1.2, §7.2 module 1).
  *
  * - `apiSchema`: the raw nested API payload — `id` + `attributes{...}`
  *   with a nested `mileage{gte,lte}` struct (dags/dag.py:112-135).
  * - `carListingSchema`: the flat 17-column store row
  *   (dag.py:296-318 DDL). `year`/`mileage_*`/`region_id` are strings
  *   AT REST (dirty-data semantics §1.4) and cast at read.
  * - `flattenListing`: S5 — `from_json` + nested projection with the
  *   reference's `.get(key, default)` null handling as `coalesce`.
  */
object Listings {

  val mileageSchema: StructType = StructType(Seq(
    StructField("gte", StringType),
    StructField("lte", StringType)))

  val attributesSchema: StructType = StructType(Seq(
    StructField("subject", StringType),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("year", StringType),
    StructField("mileage", mileageSchema),
    StructField("transmission", StringType),
    StructField("fuel_type", StringType),
    StructField("car_type", StringType),
    StructField("location", StringType),
    StructField("seller_name", StringType),
    StructField("ad_url", StringType),
    StructField("region_id", StringType),
    StructField("image_count", IntegerType),
    StructField("price", DoubleType),
    StructField("list_time", LongType)))

  val apiSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("attributes", attributesSchema)))

  final case class CarListing(
      listing_id: Long, title: String, make: String, model: String,
      year: String, price: Double, mileage_min: String, mileage_max: String,
      transmission: String, fuel_type: String, car_type: String,
      location: String, seller_name: String, ad_url: String,
      region_id: String, image_count: Int)

  /** S5: one raw JSON payload column -> the 17 flat columns with the
    * reference's defaults ('' for strings, 0 for counts, '0' for mileage
    * bounds — dag.py:119-134). Codegen'd: from_json once, field reads
    * after. */
  def flattenListing(rawJson: Column): Seq[Column] = {
    val p = from_json(rawJson, apiSchema)
    def str(c: Column): Column = coalesce(c, lit(""))
    Seq(
      p.getField("id").as("listing_id"),
      str(p.getField("attributes").getField("subject")).as("title"),
      str(p.getField("attributes").getField("make")).as("make"),
      str(p.getField("attributes").getField("model")).as("model"),
      str(p.getField("attributes").getField("year")).as("year"),
      coalesce(p.getField("attributes").getField("price"), lit(0.0)).as("price"),
      coalesce(p.getField("attributes").getField("mileage").getField("gte"),
        lit("0")).as("mileage_min"),
      coalesce(p.getField("attributes").getField("mileage").getField("lte"),
        lit("0")).as("mileage_max"),
      str(p.getField("attributes").getField("transmission")).as("transmission"),
      str(p.getField("attributes").getField("fuel_type")).as("fuel_type"),
      str(p.getField("attributes").getField("car_type")).as("car_type"),
      str(p.getField("attributes").getField("location")).as("location"),
      str(p.getField("attributes").getField("seller_name")).as("seller_name"),
      str(p.getField("attributes").getField("ad_url")).as("ad_url"),
      str(p.getField("attributes").getField("region_id")).as("region_id"),
      coalesce(p.getField("attributes").getField("image_count"), lit(0))
        .as("image_count"))
  }

  /** The motorcycle variant's nested attributes — same envelope, its own
    * field names (dags/motor_dag.py:81-98): make/model/year live under
    * `motorcycle_make_name`/`motorcycle_model_name`/`manufactured_year`,
    * location is `region_name`, the seller is `name`, the URL is
    * `adview_url`, and it carries a `date` the car shape lacks. */
  val motoAttributesSchema: StructType = StructType(Seq(
    StructField("subject", StringType),
    StructField("price", DoubleType),
    StructField("motorcycle_make_name", StringType),
    StructField("motorcycle_model_name", StringType),
    StructField("manufactured_year", StringType),
    StructField("region_name", StringType),
    StructField("name", StringType),
    StructField("date", StringType),
    StructField("image_count", IntegerType),
    StructField("adview_url", StringType),
    StructField("region_id", StringType)))

  val motoApiSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("attributes", motoAttributesSchema)))

  /** S5 (moto variant): one raw JSON payload column -> the 12 flat
    * columns with the reference's defaults ('' strings, 0 price/counts —
    * motor_dag.py:81-98). */
  def flattenMotoListing(rawJson: Column): Seq[Column] = {
    val p = from_json(rawJson, motoApiSchema)
    val a = p.getField("attributes")
    def str(c: Column): Column = coalesce(c, lit(""))
    Seq(
      p.getField("id").as("listing_id"),
      str(a.getField("subject")).as("title"),
      coalesce(a.getField("price"), lit(0.0)).as("price"),
      str(a.getField("motorcycle_make_name")).as("make"),
      str(a.getField("motorcycle_model_name")).as("model"),
      str(a.getField("manufactured_year")).as("year"),
      str(a.getField("region_name")).as("location"),
      str(a.getField("name")).as("seller_name"),
      str(a.getField("date")).as("listing_date"),
      coalesce(a.getField("image_count"), lit(0)).as("image_count"),
      str(a.getField("adview_url")).as("ad_url"),
      str(a.getField("region_id")).as("region_id"))
  }

  /** The read-side cleaning pipeline (data_loader.py:58-66 semantics):
    * regex-valid year, coerce-to-null numerics, sentinel price gate,
    * derived age and mileage_avg with an injected frozen now-year. */
  def cleanListings(flat: DataFrame, nowYear: Int,
                    priceCap: Double = 1000000.0): DataFrame = {
    import etlmudah.expr.Exprs
    flat
      // malformed payloads flatten to a defaults row with NULL id
      // (PERMISSIVE from_json) — never let them reach a keyed upsert
      .filter(col("listing_id").isNotNull)
      .filter(col("price") > 0 && col("price") < priceCap)
      .filter(Exprs.validYear(col("year")))
      .withColumn("year_i", Exprs.cleanNumeric(col("year")).cast("int"))
      .withColumn("mileage_min_d", Exprs.cleanNumeric(col("mileage_min")))
      .withColumn("mileage_max_d", Exprs.cleanNumeric(col("mileage_max")))
      .withColumn("age", lit(nowYear) - col("year_i"))
      .withColumn("mileage_avg",
        (col("mileage_min_d") + col("mileage_max_d")) / 2.0)
  }
}
