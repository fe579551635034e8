package etlmudah.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable fixed-memory sketches with PORTABLE layouts — summaries a
  * 100 TB scan can afford (one small grid per partition over the
  * shuffle, never the keys) whose every counter a SQL oracle replays
  * exactly. Companion to the approx dials in
  * [[etlmudah.analytics.Analytics]] (approx_count_distinct /
  * approx_percentile, whose internals are engine-private): here the
  * sketch itself is part of the verified contract.
  *
  * Reference surface: the frequency-table / top-K analytics tier
  * (`analysis.py` value_counts, `dashboard.py` top-N charts) at the
  * scale where exact per-key aggregation state is the bottleneck. */
object Sketches {

  /** The SQL-side twin of the aggregate's internal bucket hash: hex
    * lane `d` of md5(key), taken mod `width`. Must stay in lockstep
    * with [[etlmudah.expr.CountMinSketchAgg.lane]] (pinned by
    * SketchesSpec). `conv` parses 8 hex chars into a non-negative
    * 32-bit value, so the Long cast and mod are exact. */
  def cmsBucket(key: Column, d: Int, width: Int): Column =
    conv(substring(md5(key.cast("string").cast("binary")),
      8 * d + 1, 8), 16, 10).cast("long") % width

  /** One count-min grid over `df(keyCol)` as a single-row frame
    * `sketch: array<bigint>` of depth*width (row-major). Partial
    * aggregation applies (TypedImperativeAggregate): each task folds
    * its partition locally and the exchange carries one grid per
    * partition. */
  def cmsSketch(df: DataFrame, keyCol: String,
                depth: Int = 4, width: Int = 256): DataFrame =
    df.agg(call_function("graft_cms",
      col(keyCol).cast("string"), lit(depth), lit(width)).as("sketch"))

  /** Point estimate for `key` against a `sketch` column: min over the
    * depth rows of the key's counter — the count-min estimate, an
    * overestimate by construction (>= the true count, always). */
  def cmsEstimate(sketch: Column, key: Column,
                  depth: Int, width: Int): Column =
    least((0 until depth).map(d =>
      element_at(sketch, (lit(d * width) +
        cmsBucket(key, d, width) + lit(1)).cast("int"))): _*)

  /** HEAVY-HITTER report: the exact top-`topN` keys of `df(keyCol)`
    * side by side with their count-min estimates from a depth x width
    * grid — `n_est >= n_exact` for every key (the CMS guarantee), and
    * `overcount = n_est - n_exact` measures the collision pressure of
    * the chosen width against this key distribution (the dial a 100 TB
    * deployment tunes: width up, error down, memory up).
    *
    * Scale shape: the sketch is ONE aggregate over the corpus (grid
    * per partition over the exchange); the exact top-N is one
    * map-side-combined groupBy; the single-row grid then broadcasts
    * onto the N winners. At true scale the exact side would be the
    * sketch's candidate set instead — the report exists to certify the
    * grid against ground truth where ground truth is still computable. */
  def cmsHeavyHitters(df: DataFrame, keyCol: String,
                      depth: Int = 4, width: Int = 256,
                      topN: Int = 10): DataFrame = {
    val exact = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc)
      .limit(topN)
    exact.crossJoin(broadcast(cmsSketch(df, keyCol, depth, width)))
      .select(col("key"), col("n_exact"),
        cmsEstimate(col("sketch"), col("key"), depth, width).as("n_est"))
      .withColumn("overcount", col("n_est") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc)
  }
}
