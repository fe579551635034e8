package etlmudah.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import etlmudah.expr.Exprs

/** Geo dimension (SURVEY S13/J2/J3): the reference enriches per-state
  * aggregates with coordinates from a static name -> lat/lon dimension
  * (streamlit/utils/constants.py:2-24, MALAYSIA_STATES) and joins
  * aggregates to polygons by state name (regional_analysis.py:76-95).
  *
  * Coordinates are public geographic facts (state capitals, ~2 decimal
  * places as in the reference's use). The dimension is 16 rows — always
  * broadcast; the enrichment join never moves the fact side.
  */
object GeoDim {

  /** (state, lat, lon) for Malaysian states + federal territories. */
  val malaysiaStates: Seq[(String, Double, Double)] = Seq(
    ("Johor", 1.49, 103.74), ("Kedah", 6.12, 100.37),
    ("Kelantan", 6.13, 102.24), ("Melaka", 2.19, 102.25),
    ("Negeri Sembilan", 2.73, 101.94), ("Pahang", 3.81, 103.33),
    ("Perak", 4.60, 101.09), ("Perlis", 6.44, 100.20),
    ("Pulau Pinang", 5.41, 100.33), ("Sabah", 5.98, 116.07),
    ("Sarawak", 1.55, 110.34), ("Selangor", 3.07, 101.52),
    ("Terengganu", 5.33, 103.14), ("Kuala Lumpur", 3.14, 101.69),
    ("Labuan", 5.28, 115.24), ("Putrajaya", 2.93, 101.69))

  /** The reference's location-alias map (regional_analysis.py:20-30
    * semantics): colloquial/short names -> canonical state names. */
  val locationAliases: Map[String, String] = Map(
    "kl" -> "Kuala Lumpur", "penang" -> "Pulau Pinang",
    "malacca" -> "Melaka", "n. sembilan" -> "Negeri Sembilan")

  def statesDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    malaysiaStates.toDF("state", "lat", "lon")
  }

  /** J2/J3: standardize the location column, then broadcast-join the
    * coordinate dimension. Left join: unknown locations keep null
    * coordinates rather than dropping rows (the choropleth just skips
    * them, regional_analysis.py:76-95). */
  def enrichWithCoords(df: DataFrame, locationCol: String): DataFrame = {
    val spark = df.sparkSession
    df.withColumn("state", Exprs.standardize(col(locationCol), locationAliases))
      .join(broadcast(statesDim(spark)), Seq("state"), "left")
  }
}
