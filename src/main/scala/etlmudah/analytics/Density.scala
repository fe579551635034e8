package etlmudah.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A15 — KDE / distribution curve (ff.create_distplot's Gaussian KDE,
  * streamlit/pages/price_analysis.py:244-249), evaluated at a fixed grid.
  *
  * density(g) = avg over rows of K((g - x)/h) / h, Gaussian kernel.
  * Implemented as explode(grid) x one pass over the data -> single hash
  * aggregate per grid point: cost is |rows| x |grid| kernel evaluations,
  * map-side combined — no per-point rescans, no driver collection. Grid
  * size is user-bounded (a plot never needs more than a few hundred
  * points), so output is tiny at any data scale.
  */
object Density {

  def kdeAtGrid(df: DataFrame, value: Column, bandwidth: Double,
                grid: Seq[Double]): DataFrame = {
    val invSqrt2Pi = 1.0 / math.sqrt(2.0 * math.Pi)
    val g = explode(array(grid.map(lit): _*)).as("grid_point")
    df.select(value.as("x"))
      .select(col("x"), g)
      .groupBy(col("grid_point"))
      .agg(avg(
        exp(lit(-0.5) * pow((col("grid_point") - col("x")) / bandwidth, 2))
          * invSqrt2Pi / bandwidth).as("density"))
      .orderBy(col("grid_point"))
  }
}
