package etlmudah.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the activity stream: cohort
  * retention and funnel conversion — the two reports every product/
  * ingestion dashboard derives from an append-only event log
  * (complementing the hourly rollups of q20/q39 and the session
  * windows of q42).
  *
  * Both operators reduce the event log to a bounded frame FIRST (one
  * distinct or filtered keyed aggregate) and do all ratio math on the
  * aggregated rows, so the expensive exchanges move keys and days, not
  * raw events.
  */
object Events {

  /** Daily cohort retention: users are assigned to the cohort of their
    * first active day; cell (cohort_day, day_offset) counts how many of
    * that cohort were active again `day_offset` days later, with the
    * retention share. The triangle is capped at `maxOffsetDays` (the
    * classic D0..D14 view) so output stays |cohorts| x offsets.
    *
    * Scale: the event log collapses to DISTINCT (user, day) in one
    * map-side-combined exchange — everything after runs on user-days
    * (bounded by users x horizon, orders of magnitude below event
    * volume). The cohort frame joins back on the user key (AQE picks
    * broadcast vs shuffle by actual size); per-cohort sizes join
    * broadcast (|cohort days| rows). All counts are exact integers —
    * cross-engine stable; only the display share is a rounded double. */
  def cohortRetention(events: DataFrame, tsCol: String, userCol: String,
                      maxOffsetDays: Int = 14): DataFrame = {
    val days = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user"))
      .agg(min(col("day")).as("cohort_day"))
    val sizes = cohorts.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    days.join(cohorts, Seq("user"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("retention_pct",
        round(col("n_active") * 100.0 / col("n_cohort"), 4))
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("n_cohort"), col("retention_pct"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Rolling active users: per calendar day, the daily actives (DAU),
    * the distinct actives over the trailing `windowDays` window (WAU
    * for the default 7), and the DAU/WAU stickiness share — the
    * engagement chart next to every retention triangle. Days without a
    * full trailing window are excluded (a 3-day-old product is not
    * "100% sticky").
    *
    * Scale: the event log collapses to DISTINCT (user, day) first; the
    * window membership is an EXPLODE of at most `windowDays` calendar
    * days per user-day (constant fan-out, the chunking trick of q55) —
    * never a theta/range join that would plan a nested loop over the
    * corpus. The distinct-user count per window day partial-aggregates
    * map-side; the calendar and min-day frames broadcast. */
  def rollingActive(events: DataFrame, tsCol: String, userCol: String,
                    windowDays: Int = 7): DataFrame = {
    val days = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    val cal = days.select(col("day")).distinct()
    val dau = days.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val windowed = days
      .select(col("user"), explode(sequence(col("day"),
        date_add(col("day"), windowDays - 1))).as("day"))
      .join(broadcast(cal), Seq("day"))     // only observed days report
      .groupBy(col("day")).agg(countDistinct(col("user")).as("wau"))
    val firstDay = cal.agg(min(col("day")).as("__d0"))
    dau.join(windowed, Seq("day"))
      .crossJoin(broadcast(firstDay))
      .filter(col("day") >= date_add(col("__d0"), windowDays - 1))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") * 100.0 / col("wau"), 4).as("stickiness_pct"))
      .orderBy(col("day"))
  }

  /** Ordered funnel conversion: for each user, stage k counts only if
    * an event of stage k's type happened STRICTLY AFTER the user's
    * first qualifying stage-(k-1) event (first-touch semantics — the
    * standard "view then click then purchase" funnel, not a bag-of-
    * events intersection). Returns one row per stage with the user
    * count, share of all users, and share of the previous stage.
    *
    * Timestamps compare as integer epoch-MICROseconds: the storage is
    * nanos but Spark's timestamp truncates to micros, so doing the
    * same in the operator (and oracle) keeps the strict `>` exact in
    * every engine rather than hinging on sub-micro residue.
    *
    * Scale: stage k is one filtered keyed aggregate over the event log
    * joined to the (user, t_{k-1}) frame — the join key is the user
    * id, AQE-sized; each stage frame shrinks monotonically. The final
    * assembly is a |stages|-row union with a single-partition window —
    * constant-size by construction. */
  def funnel(events: DataFrame, tsCol: String, userCol: String,
             typeCol: String, stages: Seq[String],
             maxGapUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(maxGapUs.forall(_ > 0), "maxGapUs must be positive when set")
    val base = events.select(col(userCol).as("user"),
      col(typeCol).as("et"), unix_micros(col(tsCol)).as("tus"))
    val total = base.agg(countDistinct(col("user")).as("n0"))
    // fold: frame k = (user, t_k = min event time of stage k after
    // t_{k-1}); with maxGapUs set, stage k must also land within the
    // CONVERSION WINDOW of stage k-1 ("clicked within an hour of the
    // view" — the windowed-funnel every product dashboard defaults to)
    val frames = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, _)) =>
        val hits = base.filter(col("et") === stage)
        val qualified = prev match {
          case None => hits
          case Some(p) =>
            val after = col("tus") > col("__tp")
            val inWindow = maxGapUs.fold(after)(g =>
              after && col("tus") <= col("__tp") + lit(g))
            hits.join(p.select(col("user"), col("tk").as("__tp")),
              Seq("user")).filter(inWindow)
        }
        Some(qualified.groupBy(col("user")).agg(min(col("tus")).as("tk")))
    }.flatten
    val counts = frames.zip(stages).zipWithIndex.map {
      case ((f, stage), i) =>
        f.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
            col("n_users"))
    }.reduce(_.unionAll(_))
    val w = Window.orderBy(col("stage_idx"))
    // ANSI mode: an empty log (or a dry stage) makes these divisors 0 —
    // shares are null then, not a DIVIDE_BY_ZERO job failure
    counts.crossJoin(broadcast(total))
      .withColumn("__prev", coalesce(lag(col("n_users"), 1).over(w), col("n0")))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        round(when(col("n0") > 0, col("n_users") * 100.0 / col("n0")), 4)
          .as("pct_of_all"),
        round(when(col("__prev") > 0, col("n_users") * 100.0 / col("__prev")), 4)
          .as("pct_of_prev"))
      .orderBy(col("stage_idx"))
  }

  /** First-order (Markov) event transition matrix: for every ordered
    * per-user step (event → next event), the transition count and the
    * row-normalized probability P(next | current). The "what do users
    * do after X" report, and the input to next-event prediction /
    * anomalous-flow detection.
    *
    * Ordering is (ts, id) per user — the id tie-break makes same-
    * timestamp streams deterministic (the q122 convention). Scale: one
    * user-keyed window (the q09 shape) to pair each event with its
    * successor, then a map-side-combined aggregate onto the
    * |event types|^2-bounded matrix; row normalization is a window
    * over that bounded frame, so the event log is scanned once. */
  def transitionMatrix(events: DataFrame, tsCol: String, userCol: String,
                       typeCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val steps = events
      .select(col(typeCol).as("from_event"),
        lead(col(typeCol), 1).over(w).as("to_event"))
      .filter(col("to_event").isNotNull)
      .groupBy(col("from_event"), col("to_event"))
      .agg(count(lit(1)).as("n"))
    // row totals as a window over the AGGREGATED matrix (|types|^2
    // rows) — a separate-aggregate-and-join would re-execute the
    // event window a second time
    val wRow = Window.partitionBy(col("from_event"))
    steps
      .select(col("from_event"), col("to_event"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(wRow), 6).as("p"))
      .orderBy(col("from_event"), col("to_event"))
  }

  /** Top event PATHS: the most common length-`len` consecutive
    * event-type sequences per user stream — [[transitionMatrix]]
    * extended from bigrams to the path grain product analytics
    * actually explores ("what do users do in their next two steps
    * after signup?"). Paths never cross users; ordering is (ts, id)
    * so equal-timestamp events sequence deterministically.
    *
    * Scale: the SAME single user-keyed window exchange as
    * [[transitionMatrix]] — all len−1 leads ride one sort — then a
    * map-side-combined count whose key space is bounded by
    * |types|^len (types are a small enum), and a
    * TakeOrderedAndProject top-k. Event volume is touched once.
    *
    * Output: (path "a>b>c", n) top `topK` by count, ties broken by
    * path string. */
  def eventPaths(events: DataFrame, tsCol: String, userCol: String,
                 typeCol: String, idCol: String, len: Int = 3,
                 topK: Int = 20): DataFrame = {
    require(len >= 2, "a path needs at least 2 steps")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val stepCols = (1 until len).map(i =>
      lead(col(typeCol), i).over(w).as(s"__s$i"))
    events
      .select((col(typeCol).as("__s0") +: stepCols): _*)
      .filter((1 until len).map(i => col(s"__s$i").isNotNull)
        .reduce(_ && _))
      .select(concat_ws(">",
        (0 until len).map(i => col(s"__s$i")): _*).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(topK)
  }

  /** Time-grid RESAMPLE with forward fill — the gap-filling step every
    * time-series consumer needs before window math (a sensor that went
    * quiet, an hourly rollup with dead hours): per key, a dense bucket
    * grid from the key's first to last observation, each bucket
    * carrying its LAST observation, empty buckets carrying the most
    * recent earlier value. `is_observed` distinguishes measured from
    * filled rows (imputation must stay auditable).
    *
    * Determinism: the per-bucket pick is max(struct(ts, value)) — the
    * latest observation, value as the tie-break for same-microsecond
    * rows; the fill is `last(value, ignoreNulls) ROWS UNBOUNDED
    * PRECEDING..CURRENT` over the dense grid — both engine-portable.
    * Leading buckets before a key's first observation don't exist (the
    * grid starts AT the first observation, so `value` is never null).
    *
    * Movement: one (key, bucket) aggregate, one |keys|-sized span
    * aggregate whose `sequence()` explode rebuilds the grid (fan-out =
    * span/step per key — the caller sizes the step to the span the way
    * q107's densify does), one left join back + one key-partitioned
    * window. Volume collapses to the bucket grain in the first
    * map-side combine. */
  def resampleFill(df: DataFrame, key: String, ts: Column, value: Column,
                   stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be > 0, got $stepUs")
    val obs = df
      .select(col(key), unix_micros(ts).as("__us"), value.as("__v"))
      .filter(col("__v").isNotNull)
      // FLOOR division on the integer lattice: Spark's `div`
      // truncates toward zero, but the oracle's `//` floors, and the
      // two differ by one bucket for pre-1970 (negative-micros)
      // timestamps. pmod is non-negative, so (us - pmod) is an exact
      // step multiple and the quotient is the floor — no double
      // round-trip (exact past 2^53 too).
      .withColumn("__b",
        expr(s"(__us - pmod(__us, ${stepUs}L)) div ${stepUs}L"))
      .groupBy(col(key), col("__b"))
      .agg(max(struct(col("__us"), col("__v"))).getField("__v").as("__obs"))
    val grid = obs.groupBy(col(key))
      .agg(min(col("__b")).as("__lo"), max(col("__b")).as("__hi"))
      .select(col(key), explode(expr("sequence(__lo, __hi)")).as("__b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    grid.join(obs, Seq(key, "__b"), "left")
      .withColumn("value", last(col("__obs"), ignoreNulls = true).over(w))
      .select(col(key), (col("__b") * stepUs).as("bucket_us"),
        col("value"), col("__obs").isNotNull.as("is_observed"))
      .orderBy(col(key), col("bucket_us"))
  }


  /** TIME-WEIGHTED AVERAGE (TWAP) per key — the metric a plain AVG
    * gets wrong on irregularly sampled series (a value that held for
    * an hour must weigh 60x one that held a minute): each observation
    * carries forward to the next (LOCF), twap = Σ v_i·(t_{i+1}−t_i)
    * / (t_n − t_0). Keys with fewer than two observations have no
    * span and are omitted.
    *
    * Exactness: values on a DECIMAL(18,6) lattice x exact micro
    * intervals (the DECIMAL(19,0) cast keeps the product on the
    * int128-safe grid), one closing double division per key.
    *
    * Scale: one keyed window (the lead) + one keyed aggregate — the
    * same single exchange as any per-key rollup; no global state.
    * Same-microsecond ties order by value (the q284 one-canonical-
    * ordering lesson): with distinct values at one instant, which one
    * "held" the zero-length interval must not depend on partitioning. */
  def twap(df: DataFrame, key: String, ts: Column,
           value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key))
      .orderBy(col("__us").asc, col("__v").asc)
    df.select(col(key), unix_micros(ts).as("__us"),
        value.cast("decimal(18,6)").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("__nxt", lead(col("__us"), 1).over(w))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_obs"),
        (max(col("__us")) - min(col("__us"))).as("span_us"),
        sum(col("__v") * (col("__nxt") - col("__us"))
          .cast("decimal(19,0)")).as("__area"))
      .filter(col("span_us") > 0)
      .select(col(key), col("n_obs"), col("span_us"),
        round(col("__area").cast("double") /
          col("span_us").cast("double"), 6).as("twap"))
      .orderBy(col(key))
  }
}
