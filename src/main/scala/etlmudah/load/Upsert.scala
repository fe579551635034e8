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
}
