package etlmudah.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table profiling — the first query anyone runs against an unfamiliar
  * dataset, and the health check every scheduled pipeline ships: per
  * column, how many rows, how many nulls, how many distinct values,
  * and the value range.
  */
object Profile {

  /** Per-column profile in ONE aggregate pass over the table: null
    * count, exact distinct count, and typed min/max (numerics as
    * double, strings as-is, timestamps formatted) — returned as one
    * row per column, (col_name, n_rows, n_null, n_distinct, min_num,
    * max_num, min_str, max_str), ordered by column name.
    *
    * Plan shape: TWO single-row aggregate scans, cross-joined — the
    * plain measures (count/min/max, plain codegen'd hash aggregate) in
    * one, the exact distinct counts in the other (Expand + partial
    * aggregate, the textbook multi-distinct plan). Mixing them into ONE
    * agg would drag every plain measure through the distinct rewrite's
    * Expand — measured 3.5x slower on this very query — and a 7x row
    * multiplication carrying all columns is also the worse 100 TB
    * shape than a second clean scan. The per-column unpivot happens on
    * the ONE combined result row (explode of a literal-sized struct
    * array, driver-free). At 100 TB the dial is
    * `approx_count_distinct` (HLL, no Expand, single scan), the same
    * swap `Analytics.statsByApprox` documents. */
  def profileTable(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val tsFmt = "yyyy-MM-dd HH:mm:ss"
    val plainAggs = fields.flatMap { f =>
      val c = col(f.name)
      val (mnN, mxN, mnS, mxS) = f.dataType match {
        case _: NumericType =>
          (min(c).cast("double"), max(c).cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case TimestampType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            date_format(min(c), tsFmt), date_format(max(c), tsFmt))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            min(c).cast("string"), max(c).cast("string"))
      }
      Seq(count(c).as(s"__nn_${f.name}"),
        mnN.as(s"__mnn_${f.name}"), mxN.as(s"__mxn_${f.name}"),
        mnS.as(s"__mns_${f.name}"), mxS.as(s"__mxs_${f.name}"))
    }
    val distinctAggs = fields.map(f =>
      countDistinct(col(f.name)).as(s"__nd_${f.name}"))
    val row = df.agg(count(lit(1)).as("__n"), plainAggs: _*)
      .crossJoin(df.agg(distinctAggs.head, distinctAggs.tail: _*))
    val perCol = fields.map { f =>
      struct(lit(f.name).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_${f.name}")).as("n_null"),
        col(s"__nd_${f.name}").as("n_distinct"),
        col(s"__mnn_${f.name}").as("min_num"),
        col(s"__mxn_${f.name}").as("max_num"),
        col(s"__mns_${f.name}").as("min_str"),
        col(s"__mxs_${f.name}").as("max_str"))
    }
    row.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
      .orderBy(col("col_name"))
  }

  /** Population Stability Index drift report between two snapshots of
    * the same table — the standard "did the new crawl/extract shift the
    * distribution" gate before a corpus version is accepted. Bins
    * `valueCol` at fixed width, compares per-bin shares, and reports
    * each bin's PSI term (p_next - p_base) * ln(p_next / p_base); the
    * caller reads total PSI as the sum (rule of thumb: < 0.1 stable,
    * > 0.25 investigate).
    *
    * Empty-side bins are clamped at `eps` (the standard PSI guard) so a
    * bin present in only one snapshot contributes a large-but-finite
    * term instead of an infinity.
    *
    * Scale: one union scan → map-side-combined bin aggregate; the share
    * normalization windows over the AGGREGATED |bins| frame (the q06
    * share-of-total shape), never base data. */
  def driftPsi(base: DataFrame, next: DataFrame, valueCol: String,
               binWidth: Double, eps: Double = 1e-6): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, side: String) = df.select(
      floor(col(valueCol) / lit(binWidth)).cast("long").as("bin"),
      lit(side).as("__side"))
    val counts = binned(base, "base").unionByName(binned(next, "next"))
      .groupBy(col("bin")).agg(
        sum(when(col("__side") === "base", 1L).otherwise(0L)).as("n_base"),
        sum(when(col("__side") === "next", 1L).otherwise(0L)).as("n_next"))
    psiFromCounts(counts, eps)
  }

  /** PSI share/term math over a pre-binned (bin, n_base, n_next) frame
    * — the shared core of [[driftPsi]] and the streaming drift monitor
    * sink, so stream == batch holds by construction. */
  private[etlmudah] def psiFromCounts(counts: DataFrame,
                                      eps: Double): DataFrame = {
    // ANSI guard: an entirely-empty side (total 0) clamps to eps
    // instead of dividing by zero
    val w = Window.partitionBy()
    def share(c: String) = {
      val tot = sum(col(c)).over(w)
      greatest(when(tot > 0, col(c) / tot).otherwise(lit(0.0)), lit(eps))
    }
    val pB = share("n_base")
    val pN = share("n_next")
    counts.select(col("bin"), col("n_base"), col("n_next"),
        round(pB, 6).as("p_base"), round(pN, 6).as("p_next"),
        round((pN - pB) * log(pN / pB), 6).as("psi_term"))
      .orderBy(col("bin"))
  }

  /** Binned counts of `valueCol` — the histogram half of [[driftPsi]],
    * reused by the streaming sink for its per-batch partials. */
  private[etlmudah] def binCounts(df: DataFrame, valueCol: String,
                                  binWidth: Double): DataFrame =
    df.select(floor(col(valueCol) / lit(binWidth)).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))

  /** Schema-evolution diff between two versions of a table: per column,
    * added / removed / retyped / unchanged, with both type strings —
    * the metadata third of the snapshot-gate trio (q95 row-level diff,
    * q142 distribution drift, this structure drift). The gate every
    * scheduled extract runs before appending to a partitioned table,
    * where a silent upstream retype corrupts or blocks the write.
    *
    * Schemas are driver-side metadata, so this is a pure catalog
    * computation — no job runs against either table's data. */
  def schemaDiff(base: DataFrame, next: DataFrame): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val b = base.schema.map(f => f.name -> f.dataType.simpleString).toMap
    val n = next.schema.map(f => f.name -> f.dataType.simpleString).toMap
    (b.keySet ++ n.keySet).toSeq.sorted.map { c =>
      val status = (b.contains(c), n.contains(c)) match {
        case (true, true) => if (b(c) == n(c)) "unchanged" else "retyped"
        case (true, false) => "removed"
        case (false, true) => "added"
        case _ => throw new IllegalStateException("unreachable")
      }
      (c, status, b.getOrElse(c, null), n.getOrElse(c, null))
    }.toDF("col_name", "status", "base_type", "next_type")
  }
}
