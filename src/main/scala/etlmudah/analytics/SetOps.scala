package etlmudah.analytics

import org.apache.spark.sql.DataFrame

/** Set operations (SURVEY §2.5 note): the reference only unions lists
  * during ingest (dag.py:105), but the upsert (S8/J1) decomposes into
  * them, so the engine exposes the full suite. All are thin, name-based
  * (positional union is a classic silent-corruption bug), and plan to
  * Spark's native set operators — union is shuffle-free; intersect/
  * except plan as aggregates/joins on all columns. */
object SetOps {
  /** Name-resolving union; missing columns are an error, not nulls. */
  def unionAll(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)

  def unionDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)

  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)
}
