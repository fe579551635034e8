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

  /** t-CLOSENESS report (Li–Li–Venkatasubramanian 2007, the refinement
    * past l-diversity: a class can be diverse yet still leak if its
    * sensitive MIX differs sharply from the table's): per
    * quasi-identifier class, the total-variation distance between the
    * class's sensitive-value distribution and the global one —
    * tv = ½ Σ_s |p_class(s) − p_global(s)| ∈ [0, 1]; a (k, t) policy
    * reads its violators off `tv_distance > t` directly.
    *
    * Exactness: the distance is computed on the INTEGER lattice —
    * Σ_s |cnt_cs·N − cnt_s·n_c| as exact DECIMAL (classes missing a
    * sensitive value contribute their full cnt_s·n_c term via the
    * class × sensitive-domain grid), with ONE closing double division
    * by 2·n_c·N — never a sum of per-term float ratios, whose
    * accumulation order would smear the last ulp.
    *
    * Scale: one (QI, sensitive) aggregate collapses the table; the
    * sensitive-domain margin and the grand total broadcast; the grid
    * is |classes| × |sensitive domain| rows (the sensitive domain of
    * a privacy audit is small by construction — it is an attribute
    * column, not a key). */
  def tClosenessReport(df: DataFrame, qiCols: Seq[String],
                       sensitiveCol: String): DataFrame = {
    val qi = qiCols.map(col)
    val cs = df.groupBy((qiCols :+ sensitiveCol).map(col): _*)
      .agg(count(lit(1)).as("__cs"))
    val classes = cs.groupBy(qi: _*).agg(sum(col("__cs")).as("class_size"))
    val margin = df.groupBy(col(sensitiveCol)).agg(count(lit(1)).as("__s"))
    val tot = df.agg(count(lit(1)).as("__n"))
    classes.crossJoin(broadcast(margin))
      .join(cs, qiCols :+ sensitiveCol, "left")
      .na.fill(0L, Seq("__cs"))
      .crossJoin(broadcast(tot))
      .groupBy((qi :+ col("class_size") :+ col("__n")): _*)
      .agg(sum(abs(
        col("__cs").cast("decimal(19,0)") * col("__n") -
          col("__s").cast("decimal(19,0)") * col("class_size")))
        .as("__num"))
      .select(qi :+ col("class_size") :+
        round(col("__num").cast("double") /
          (lit(2.0) * col("class_size") * col("__n")), 6)
          .as("tv_distance"): _*)
      .orderBy(qi: _*)
  }
}
