package etlmudah.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar expression library re-expressing the reference's row-wise Python
  * helpers as native Catalyst column expressions (no UDFs — everything here
  * stays inside whole-stage codegen).
  *
  * Reference provenance:
  *  - priceSegment: `streamlit/utils/constants.py:26-48`
  *    (`create_price_segment` / `create_motorcycle_price_segment`) —
  *    a 5-way threshold bucketing applied via `df[col].apply(...)`.
  *  - standardizeLocation: `streamlit/pages/regional_analysis.py:15-32` —
  *    alias → canonical-name dict lookup with identity fallback.
  *  - cleanNumeric: `streamlit/utils/data_loader.py:60,64-65` —
  *    `pd.to_numeric(errors='coerce')` null-on-failure cast.
  *  - validYear: `streamlit/utils/data_loader.py:28,49` — SQL regex
  *    `year ~ '^[0-9]{4}$'`.
  */
object Exprs {

  /** 5-way half-open price bucketing (CaseWhen, codegen'd).
    * Thresholds are parameters; the reference ships two variants
    * (cars 25k/50k/100k/200k, motorcycles 5k/10k/20k/40k). Labels follow
    * the reference's shape ("Budget (< RM25k)" etc.) but are generic here.
    */
  def priceSegment(price: Column, t1: Double, t2: Double, t3: Double, t4: Double,
                   labels: Option[Seq[String]] = None): Column = {
    def fmt(d: Double): String =
      if (d >= 1000 && d % 1000 == 0) s"${(d / 1000).toLong}k" else d.toString
    val ls = labels.getOrElse(Seq(
      s"Budget (< ${fmt(t1)})", s"Economy (${fmt(t1)} - ${fmt(t2)})",
      s"Mid-Range (${fmt(t2)} - ${fmt(t3)})", s"Premium (${fmt(t3)} - ${fmt(t4)})",
      s"Luxury (> ${fmt(t4)})"))
    require(ls.length == 5, "priceSegment needs exactly 5 labels")
    when(price < t1, lit(ls(0)))
      .when(price < t2, lit(ls(1)))
      .when(price < t3, lit(ls(2)))
      .when(price < t4, lit(ls(3)))
      .otherwise(lit(ls(4)))
  }

  /** The reference's exact car-segment preset (constants.py:26-36):
    * thresholds 25k/50k/100k/200k with the RM-prefixed labels, so
    * value-level comparisons against reference-derived outputs match. */
  def carPriceSegment(price: Column): Column =
    priceSegment(price, 25000, 50000, 100000, 200000, Some(Seq(
      "Budget (< RM25k)", "Entry Level (RM25k-50k)", "Mid-Range (RM50k-100k)",
      "Premium (RM100k-200k)", "Luxury (> RM200k)")))

  /** Motorcycle preset (constants.py:38-48): 5k/10k/20k/40k. */
  def motoPriceSegment(price: Column): Column =
    priceSegment(price, 5000, 10000, 20000, 40000, Some(Seq(
      "Budget (< RM5k)", "Entry Level (RM5k-10k)", "Mid-Range (RM10k-20k)",
      "Premium (RM20k-40k)", "Luxury (> RM40k)")))

  /** Alias → canonical mapping with identity fallback: a literal map lookup
    * (broadcast-free; the map is folded into the plan as a constant).
    * For large dimension tables use a broadcast join instead.
    */
  def standardize(col: Column, aliases: Map[String, String]): Column = {
    // try_element_at (not element_at): under Spark 4's default ANSI mode
    // element_at throws MAP_KEY_DOES_NOT_EXIST for absent keys, but the
    // identity-fallback is this function's main case (dict.get(loc, loc)).
    val kvs = aliases.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }
    coalesce(try_element_at(map(kvs: _*), col), col)
  }

  /** Null-on-malformed numeric coercion (pandas `errors='coerce'`). */
  def cleanNumeric(c: Column): Column = c.try_cast("double")

  /** The reference's load-bearing dirty-year predicate. */
  def validYear(c: Column): Column = c.rlike("^[0-9]{4}$")

  /** Clip-to-upper (pandas `.clip(upper=x)`). Null-preserving: `least`
    * alone would turn a null into the cap (least skips nulls), but pandas
    * clip keeps NaN as NaN. */
  def clipUpper(c: Column, upper: Double): Column =
    when(c.isNull, lit(null).cast("double")).otherwise(least(c, lit(upper)))

  /** Percent share helper: 100*x/total rounded. */
  def pct(x: Column, total: Column, scale: Int = 2): Column =
    round(x * 100.0 / total, scale)

  /** C11: URL -> HTML anchor (price_prediction.py:188-190). */
  def anchorTag(url: Column, label: Column): Column =
    concat(lit("<a href=\""), url, lit("\">"), label, lit("</a>"))

  /** C9: currency-style presentation string (price_analysis.py:326-327,
    * "RM 1,234.56"). format_number gives the thousands grouping. */
  def currency(amount: Column, symbol: String = "RM "): Column =
    concat(lit(symbol), format_number(amount, 2))
}
