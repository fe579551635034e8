package etlmudah.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import etlmudah.expr.Exprs

/** Ingest-side cleaning and semi-structured flattening (SURVEY.md S5, C4,
  * C6, C10, C13, F6-F8).
  *
  * Re-expresses the reference's `process_listing` JSON flatten
  * (dags/dag.py:112-135: nested `attributes{...}` dict + `.get(k, default)`
  * null handling) and `process_vehicle_data` cleaning
  * (streamlit/utils/data_loader.py:58-66: `pd.to_numeric(errors='coerce')`,
  * derived `age`/`mileage_avg`) as pure column expressions — everything
  * stays inside whole-stage codegen; no UDFs, no driver loops.
  */
object Ingest {

  /** C13: extract a JSON field and coerce to int, null on malformed —
    * `get_json_object` + `try_cast` (ANSI-safe). */
  def jsonInt(c: Column, path: String): Column =
    get_json_object(c, path).try_cast("int")

  /** S5-shaped flatten of the harness `events` table: parse the `props`
    * JSON payload, project typed fields with defaults (C10 `coalesce`),
    * keep rows whose type passes the F6-style regex gate.
    */
  def flattenEvents(events: DataFrame): DataFrame =
    events
      .filter(col("event_type").rlike("^[a-z]+$"))
      .select(
        col("event_id"),
        col("event_type"),
        jsonInt(col("props"), "$.k").as("k"),
        Exprs.clipUpper(col("value"), 100.0).as("value_clip"))
      .filter(col("k").isNotNull)

  /** The reference's derived-column cleaning, generalized: null-on-error
    * numeric coercion + frozen "now" arithmetic (C5/C6). `nowYear` is
    * injected (never `current_date()`) so oracle runs are reproducible —
    * SURVEY §7.5.4. */
  def withAge(df: DataFrame, yearCol: String, nowYear: Int): DataFrame =
    df.withColumn("age",
      lit(nowYear) - Exprs.cleanNumeric(col(yearCol)).cast("int"))
}
