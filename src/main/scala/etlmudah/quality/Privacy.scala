package etlmudah.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification risk audit for a table about to leave the
  * pipeline — the privacy gate a training-data / analytics export runs
  * after PII redaction (the q59/q72 scan tier tells you what to mask;
  * this tier tells you whether the REMAINING quasi-identifiers still
  * single people out).
  *
  * Reference surface: the reference publishes cleaned listings with
  * location + demographic columns intact (`transform.py`'s output
  * schema); this is the audit that decides whether such an export is
  * k-anonymous, using the standard model (Sweeney 2002: every
  * quasi-identifier combination must be shared by ≥ k rows) plus the
  * l-diversity refinement (Machanavajjhala et al. 2007: each class
  * must also carry ≥ l distinct sensitive values, or the class leaks
  * the attribute even without re-identification).
  */
object Privacy {

  /** k-anonymity / l-diversity report: one row per observed
    * equivalence-CLASS SIZE over the quasi-identifier columns, with
    * how many classes and rows sit at that size and the worst
    * (minimum) sensitive-value diversity among them — the full risk
    * histogram, from which any (k, l) policy reads off its violating
    * mass directly (rows at class_size < k are re-identifiable;
    * classes at min_l < l leak the attribute).
    *
    * Scale: ONE map-side-combined groupBy on the QI columns (the
    * class frame — at most |rows|, typically far smaller), then a
    * second tiny aggregate on the |distinct sizes| grain. The
    * per-class distinct-sensitive count is exact; nothing collects.
    * Null QI values form their own class (SQL GROUP BY semantics —
    * matching the risk model: an all-null row is still a published
    * row). */
  def kAnonymityReport(df: DataFrame, qiCols: Seq[String],
                       sensitiveCol: String): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_div"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"),
        min(col("l_div")).as("min_l"))
      .select(col("class_size"), col("n_classes"),
        (col("class_size") * col("n_classes")).as("n_rows"),
        col("min_l"))
      .orderBy(col("class_size"))
}
