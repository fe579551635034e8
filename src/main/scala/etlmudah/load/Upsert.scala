package etlmudah.load

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / MERGE semantics on plain DataFrames (SURVEY.md S8/J1).
  *
  * Mirrors the reference's staged COPY + `ON CONFLICT (listing_id) DO
  * UPDATE` merge (dags/dag.py:250-266, dags/motor_dag.py:230-243):
  * matched keys take the incoming row's mutable columns, unmatched keys
  * insert, and re-applying the same batch is a no-op (idempotent).
  *
  * Implementation: `unionByName` + one `row_number` window partitioned by
  * the key, ordered by explicit version columns descending — "last writer
  * wins", made deterministic by requiring a total order (the reference's
  * `SELECT DISTINCT ON` without ORDER BY is nondeterministic; SURVEY §7.5.3).
  *
  * Scale: exactly one shuffle on the key — the same cost as any
  * shuffled-hash join on the merge key; no broadcast of the batch needed,
  * no driver involvement. At 100 TB this is the minimal-movement plan for
  * a keyed merge without a transactional table format.
  */
object Upsert {

  /** Merge `batch` into `base`. `orderCols` must totally order rows within
    * a key (highest first = winner), e.g. `Seq(col("batch_ts").desc,
    * col("src").desc)`. Both frames must share the key + order columns.
    */
  def upsert(base: DataFrame, batch: DataFrame, keys: Seq[String],
             orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    base.unionByName(batch)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Partial-column merge — the reference's actual ON CONFLICT shape
    * (dags/dag.py:259-265): matched keys take the incoming row's values
    * for `updateCols` ONLY and keep the base row's values for every
    * other column (`created_at` survives re-ingestion; `price`,
    * `updated_at` refresh). Unmatched keys insert the whole batch row.
    * The whole-row overload above is last-writer-wins; this one is the
    * column-safe variant — a batch that defaults a non-listed column
    * can no longer clobber base values.
    *
    * `orderCols` totally orders rows WITHIN the batch (highest first
    * wins) so multi-row batches stay deterministic; the base is assumed
    * key-unique (it is the output of a previous merge).
    *
    * Scale: one keyed window over the batch + one null-safe equi-join on
    * the key — two shuffles of the batch, one of the base; no broadcast
    * assumption, no driver involvement. */
  def upsert(base: DataFrame, batch: DataFrame, keys: Seq[String],
             orderCols: Seq[Column], updateCols: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    require(updateCols.forall(cols.contains), "updateCols must exist in base")
    require(keys.forall(k => !updateCols.contains(k)), "keys are not updatable")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCols: _*)
    val winner = batch
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .drop("__rn")
    val b = base.select(cols.map(c => col(c).as(s"__b_$c")) :+
      lit(true).as("__in_b"): _*)
    val n = winner.select(cols.map(c => col(c).as(s"__n_$c")) :+
      lit(true).as("__in_n"): _*)
    val joinCond = keys.map(k => col(s"__b_$k") <=> col(s"__n_$k")).reduce(_ && _)
    val inB = coalesce(col("__in_b"), lit(false))
    val inN = coalesce(col("__in_n"), lit(false))
    b.join(n, joinCond, "full_outer")
      .select(cols.map { c =>
        val pick =
          if (keys.contains(c)) coalesce(col(s"__b_$c"), col(s"__n_$c"))
          else if (updateCols.contains(c))
            when(inN, col(s"__n_$c")).otherwise(col(s"__b_$c"))
          else when(inB, col(s"__b_$c")).otherwise(col(s"__n_$c"))
        pick.as(c)
      }: _*)
  }

  /** Decomposition views of the same merge (useful for audit):
    * rows in `batch` whose key is new to `base` (the INSERT half). */
  def inserts(base: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    batch.join(base, keys, "left_anti")

  /** Rows in `batch` whose key already exists in `base` (the UPDATE half). */
  def updates(base: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    batch.join(base.select(keys.map(col): _*), keys, "left_semi")

  /** SCD2 history build: collapse an event/change log into
    * slowly-changing-dimension validity intervals per key. Rows where
    * the tracked attributes equal the previous row's values (per key,
    * time-ordered) are dropped as no-ops; survivors get
    * `valid_from` = their timestamp, `valid_to` = the next change's
    * timestamp (null while current), and `is_current`.
    *
    * Shape: ONE shuffle on the key serves both windows (lag for change
    * detection, lead for interval close) — Spark reuses the exchange
    * and sort for window functions over the same (partition, order)
    * spec, so the second window is free. This is the standard
    * warehouse-dimension load re-expressed declaratively; at any scale
    * the cost is the keyed sort, exactly like `upsert`. */
  def scd2History(df: DataFrame, keyCol: String, tsCol: String,
                  attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    df.select(col(keyCol) +: col(tsCol) +: attrCols.map(col): _*)
      .withColumn("__chg", changed || lag(col(tsCol), 1).over(w).isNull)
      .filter(col("__chg"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__chg", tsCol)
  }

  /** Snapshot CDC diff — the audit companion to `upsert`: classify
    * every key across two snapshots of the same table as `inserted`
    * (key only in `next`), `deleted` (only in `base`), `updated` (in
    * both, some `compareCols` value differs, null-safely), or
    * `unchanged`. This is how a pipeline without a transactional table
    * format derives a change feed from periodic full extracts.
    *
    * One null-safe full-outer join on the key — both sides shuffle
    * once, co-partitioned, no broadcast assumption; the comparison is a
    * codegen'd per-row projection. Both snapshots must be key-unique
    * (they are table snapshots). Returns the key columns + `change`. */
  def snapshotDiff(base: DataFrame, next: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val b = base.select((keys ++ compareCols).map(c => col(c).as(s"__b_$c"))
      :+ lit(true).as("__in_b"): _*)
    val n = next.select((keys ++ compareCols).map(c => col(c).as(s"__n_$c"))
      :+ lit(true).as("__in_n"): _*)
    val joinCond = keys.map(k => col(s"__b_$k") <=> col(s"__n_$k")).reduce(_ && _)
    val inB = coalesce(col("__in_b"), lit(false))
    val inN = coalesce(col("__in_n"), lit(false))
    val same = compareCols.map(c => col(s"__b_$c") <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    val change = when(inB && !inN, "deleted")
      .when(!inB && inN, "inserted")
      .when(same, "unchanged")
      .otherwise("updated")
    b.join(n, joinCond, "full_outer")
      .select(keys.map(k => coalesce(col(s"__b_$k"), col(s"__n_$k")).as(k))
        :+ change.as("change"): _*)
  }

  /** Build the per-key aggregate STATE table [[mergeAggState]]
    * maintains: (keys..., n, sum_v, min_v, max_v). `value` should
    * already sit on an exact lattice (cast to DECIMAL) so sums are
    * order-independent and the merge algebra replays exactly. */
  def aggState(rows: DataFrame, keys: Seq[String], value: Column)
      : DataFrame =
    rows.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"), sum(value).as("sum_v"),
      min(value).as("min_v"), max(value).as("max_v"))

  /** INCREMENTAL VIEW MAINTENANCE of a per-key aggregate: fold a delta
    * batch of inserts (`op = 1`) and retractions (`op = -1`) into an
    * [[aggState]] table WITHOUT rescanning the base — the classic
    * self-maintainability split (Gupta & Mumick, "Maintenance of
    * materialized views", IEEE DE Bull. 1995):
    *
    *  - `n` and `sum_v` are self-maintainable under BOTH inserts and
    *    retractions (group algebra: add signed counts/sums);
    *  - `min_v`/`max_v` are self-maintainable under inserts only.
    *    A retraction at or past the stored boundary (deleted value
    *    <= min_v or >= max_v) may have removed the extreme itself —
    *    the state cannot answer, so the group reports
    *    `needs_rescan = true` with null min/max instead of silently
    *    keeping a possibly-stale boundary. Callers rescan exactly
    *    those groups from the base table (at 100 TB: a partition-
    *    pruned point rescan of the dirty keys, not a full recompute).
    *
    * Groups whose count reaches zero DROP from the state (fully
    * retracted); a delta on an absent group inserts it. Retracting
    * below zero is a caller contract violation — those rows drop with
    * the n <= 0 filter rather than materializing negative counts.
    *
    * One map-side-combined delta aggregate + one full-outer join on
    * the key: the delta is touched once, the state once — the merge
    * cost is O(|delta| + |state|) regardless of base size, which is
    * the entire point of IVM. */
  def mergeAggState(state: DataFrame, delta: DataFrame, keys: Seq[String],
                    value: Column, op: Column): DataFrame = {
    val dAgg = delta.groupBy(keys.map(col): _*).agg(
      sum(op.cast("long")).as("__dn"),
      sum(op.cast("long") * value).as("__dsum"),
      min(when(op > 0, value)).as("__ins_min"),
      max(when(op > 0, value)).as("__ins_max"),
      min(when(op < 0, value)).as("__del_min"),
      max(when(op < 0, value)).as("__del_max"))
    val st = state.select(keys.map(c => col(c).as(s"__s_$c")) ++
      Seq(col("n"), col("sum_v"), col("min_v"), col("max_v")): _*)
    val joinCond = keys.map(k => col(s"__s_$k") <=> col(k))
      .reduce(_ && _)
    val n2 = coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L))
    val sum2 = when(col("sum_v").isNull, col("__dsum"))
      .when(col("__dsum").isNull, col("sum_v"))
      .otherwise(col("sum_v") + col("__dsum"))
    // boundary hit: some retracted value reaches the stored extreme —
    // the true min/max may be gone, only a base rescan can tell. A
    // group ABSENT from the state whose delta retracts anything
    // (transient insert+delete) is dirty too: its insert extremes
    // alone cannot say which values survived
    val dirty = col("__del_min").isNotNull &&
      (col("min_v").isNull ||
        col("__del_min") <= col("min_v") ||
        col("__del_max") >= col("max_v"))
    val min2 = when(dirty, lit(null))
      .when(col("min_v").isNull, col("__ins_min"))
      .when(col("__ins_min").isNull, col("min_v"))
      .otherwise(least(col("min_v"), col("__ins_min")))
    val max2 = when(dirty, lit(null))
      .when(col("max_v").isNull, col("__ins_max"))
      .when(col("__ins_max").isNull, col("max_v"))
      .otherwise(greatest(col("max_v"), col("__ins_max")))
    st.join(dAgg, joinCond, "full_outer")
      .select(keys.map(k => coalesce(col(s"__s_$k"), col(k)).as(k)) ++
        Seq(n2.as("n"), sum2.as("sum_v"), min2.as("min_v"),
          max2.as("max_v"), dirty.as("needs_rescan")): _*)
      .filter(col("n") > 0)
  }
}
