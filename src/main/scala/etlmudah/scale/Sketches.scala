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
  * (`streamlit/pages/market_overview.py:34,68` value_counts head-N
  * charts, `:157` top-model counts) at the scale where exact per-key
  * aggregation state is the bottleneck. */
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
                      topN: Int = 10): DataFrame =
    cmsReport(
      df.groupBy(col(keyCol).cast("string").as("key"))
        .agg(count(lit(1)).as("n_exact")),
      cmsSketch(df, keyCol, depth, width), depth, width, topN)

  /** The report tail shared by the batch operator and the STREAMING
    * sink ([[etlmudah.streaming.Streaming]].heavyHitterSink), so
    * stream == batch holds by construction: takes pre-aggregated
    * (key, n_exact) counts and a single-row `sketch` frame, emits the
    * topN report. */
  def cmsReport(keyCounts: DataFrame, sketch: DataFrame,
                depth: Int, width: Int, topN: Int): DataFrame =
    keyCounts
      .orderBy(col("n_exact").desc, col("key").asc)
      .limit(topN)
      .crossJoin(broadcast(sketch))
      .select(col("key"), col("n_exact"),
        cmsEstimate(col("sketch"), col("key"), depth, width).as("n_est"))
      .withColumn("overcount", col("n_est") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("key").asc)

  /** JOIN-SIZE estimation from two count-min grids (Cormode &
    * Muthukrishnan 2005 §4.3, the CM inner-product estimator): the
    * equi-join output cardinality |A ⋈ B| = Σ_k fA(k)·fB(k) is
    * estimated as min over the depth rows of the grids' per-row dot
    * product — an OVERESTIMATE by construction (collisions only add),
    * never an undercount. This is the optimizer question ("how big is
    * this join going to be?") answered from two ~33 KB sketches
    * WITHOUT moving either table's keys — at 100 TB each side folds
    * its grid in its own scan and the estimate is depth·width
    * arithmetic. The exact answer rides alongside as the audit tier
    * (at true scale it is the first thing dropped — computing it IS
    * the join). One row out: est_join_size, true_join_size,
    * overestimate_ratio (4dp, null on an empty true join). */
  def cmsJoinSizeEstimate(dfA: DataFrame, aKey: String,
                          dfB: DataFrame, bKey: String,
                          depth: Int = 4, width: Int = 256): DataFrame = {
    def grid(df: DataFrame, key: String, tag: String) =
      cmsSketch(df, key, depth, width)
        .select(posexplode(col("sketch")).as(Seq("pos", s"c$tag")))
    val dots = grid(dfA, aKey, "a").join(grid(dfB, bKey, "b"), Seq("pos"))
      .groupBy(expr(s"pos div $width").as("d"))
      .agg(sum(col("ca") * col("cb")).as("dot"))
    val est = dots.agg(min(col("dot")).as("est_join_size"))
    def counts(df: DataFrame, key: String, tag: String) =
      df.groupBy(col(key).cast("string").as("k"))
        .agg(count(lit(1)).as(s"n$tag"))
    val truth = counts(dfA, aKey, "a").join(counts(dfB, bKey, "b"), Seq("k"))
      .agg(coalesce(sum(col("na") * col("nb")), lit(0L))
        .as("true_join_size"))
    est.crossJoin(broadcast(truth))
      .select(col("est_join_size"), col("true_join_size"),
        when(col("true_join_size") > 0,
          round(col("est_join_size").cast("double") /
            col("true_join_size").cast("double"), 4))
          .as("overestimate_ratio"))
  }

  /** Rebuild the single-row `sketch` array frame from grid PARTIALS
    * (pos, cnt) — the streaming sink's standing state is the exploded
    * grid, merged by plain addition (the sketch's mergeability is the
    * whole point): sum per position, then re-assemble positionally via
    * a map lookup (deterministic — no collect_list ordering anywhere).
    * Bounded by depth*width rows end to end. */
  def cmsFromParts(gridParts: DataFrame, depth: Int, width: Int): DataFrame =
    gridParts
      .groupBy(col("pos")).agg(sum(col("cnt")).as("cnt"))
      .agg(map_from_entries(collect_list(
        struct(col("pos").cast("int"), col("cnt")))).as("m"))
      .select(transform(sequence(lit(0), lit(depth * width - 1)),
        i => coalesce(try_element_at(col("m"), i), lit(0L))).as("sketch"))

  /** PORTABLE HyperLogLog registers (Flajolet-Fusy-Gandouet-Meunier
    * 2007) — the distinct-count twin of the CMS grid, and unlike
    * `approx_count_distinct` (whose registers ride an engine-private
    * hash) every register here is an exact, oracle-replayable integer.
    * COMPOSED from built-ins, no custom aggregate needed — the
    * brief's preference order honored: hash lane -> bucket/suffix
    * split -> per-bucket MAX is groupBy work Spark already does
    * map-side-combined.
    *
    * Layout: md5 lane 0 (32 bits) splits into the top `log2(m)` bits
    * (bucket) and the remaining suffix; the register is rho(suffix) =
    * (suffix bit width) - bitlen(suffix) + 1, where bitlen is an
    * EXACT integer comparison ladder (sum of [x >= 2^k]) — zero
    * floating point, so Spark and any SQL engine agree bit for bit.
    * Duplicate keys hash identically, so no distinct pass is needed:
    * the registers ARE the dedup. */
  def hllRho(key: Column, b: Int): Column = {
    require(b >= 2 && b <= 12, s"hll bucket bits out of range: $b")
    val lane = conv(substring(md5(key.cast("string")
      .cast("binary")), 1, 8), 16, 10).cast("long")
    val sufBits = 32 - b
    val bucket = shiftright(lane, sufBits)
    val suffix = lane.bitwiseAND(lit((1L << sufBits) - 1))
    // bitlen(x) = #{k : x >= 2^k} — exact, portable, no log anywhere
    val bitlen = (0 until sufBits)
      .map(k => when(suffix >= lit(1L << k), 1L).otherwise(0L))
      .reduce(_ + _)
    struct(bucket.as("bucket"), (lit(sufBits.toLong) - bitlen + 1).as("rho"))
  }

  /** The observed registers: <= m rows of (bucket, reg) — one
    * map-side-combined groupBy MAX, the only corpus-sized work. */
  def hllRegisterTable(df: DataFrame, keyCol: String, b: Int = 6): DataFrame =
    df.select(hllRho(col(keyCol), b).as("h"))
      .groupBy(col("h.bucket").as("bucket"))
      .agg(max(col("h.rho")).as("reg"))

  /** The full HLL report as EXACT integers plus the raw estimate: one
    * row — m, the count of still-zero registers, the maximal register,
    * and the lattice-exact register sum S = sum over all m registers
    * of 2^(CAP - reg) at the fixed cap CAP = 33 - b (zero registers
    * contribute 2^CAP each), so sum 2^-reg == S / 2^CAP with NO
    * floating-point addition anywhere. est = alpha_m * m^2 * 2^CAP / S
    * is the one double — every operand exact (S <= m * 2^CAP << 2^53),
    * the expression written left-to-right identically on both engines,
    * so even it is hash-comparable. */
  def hllReport(df: DataFrame, keyCol: String, b: Int = 6): DataFrame =
    reportOfRegs(hllRegisterTable(df, keyCol, b).groupBy(), b)
      .select(col("m"), col("n_zero"), col("maxreg"), col("s"),
        col("raw_est"))

  /** Report over an externally-merged (bucket, reg) register table —
    * the streaming sink's consumer: same fold and columns as
    * [[hllReport]], inputs already max-merged by the caller. */
  private[etlmudah] def hllReportFromRegs(regs: DataFrame,
                                          b: Int): DataFrame =
    reportOfRegs(regs.groupBy(), b)
      .select(col("m"), col("n_zero"), col("maxreg"), col("s"),
        col("raw_est"))

  /** The report fold shared by the global, per-group, and merged
    * tiers: takes registers under any grouping. */
  private def reportOfRegs(
      grouped: org.apache.spark.sql.RelationalGroupedDataset,
      b: Int): DataFrame = {
    val m = 1 << b
    grouped.agg(
        count(lit(1)).as("n_obs"),
        max(col("reg")).as("maxreg"),
        // sum 2^-reg, held exact by scaling with the FIXED cap
        // CAP = 33 - b (the largest register a 32-b-bit suffix can
        // produce): each observed bucket contributes 2^(CAP - reg),
        // an integer — one fold, no second pass for a data-dependent
        // scale
        sum(call_function("shiftleft", lit(1L),
          (lit((33 - b).toLong) - col("reg")).cast("int"))).as("s_cap"))
      .withColumn("m", lit(m.toLong))
      .withColumn("n_zero", lit(m.toLong) - col("n_obs"))
      // S at cap: observed terms + a 2^cap term per zero register
      .withColumn("s", col("s_cap") + (lit(m.toLong) - col("n_obs")) *
        call_function("shiftleft", lit(1L), lit(33 - b)))
      .withColumn("raw_est",
        round((lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))) *
          lit((m.toDouble * m)) *
          pow(lit(2.0), lit((33 - b).toDouble)) / col("s"), 4))
      .drop("n_obs", "s_cap")
  }

  /** HLL UNION ALGEBRA: per-group distinct sketches PLUS their merge —
    * the property that makes HLL the distinct counter of a sharded
    * world: registers union by per-bucket MAX, so the merge of
    * per-source sketches IS the sketch of the union, exactly (never
    * approximately — approximation lives only between sketch and
    * truth). ONE register pass keyed by (group, bucket) feeds both
    * tiers; the merged row carries group = '__all__'. At 100 TB each
    * source/shard folds its own m-register sketch and the combiner
    * maxes them — no re-scan of any source to count the union. */
  /** HLL OVERLAP estimate via inclusion-exclusion: |A n B| ~
    * est(A) + est(B) - est(A u B), with the union sketch the exact
    * per-bucket MAX merge — how two shards/sources/snapshots estimate
    * their key overlap WITHOUT ever co-shuffling keys (each side folds
    * its own m registers; the comparison is m-row arithmetic). The
    * error compounds (three +-1.04/sqrt(m) estimates), which is the
    * documented trade: the exact intersection join is the audit tier,
    * carried alongside. One row out: est_a, est_b, est_union,
    * est_overlap, n_true_overlap. */
  def hllOverlapReport(dfA: DataFrame, dfB: DataFrame, keyCol: String,
                       b: Int = 6): DataFrame = {
    val ra = hllRegisterTable(dfA, keyCol, b)
    val rb = hllRegisterTable(dfB, keyCol, b)
    def est(regs: DataFrame, name: String): DataFrame =
      reportOfRegs(regs.groupBy(), b).select(col("raw_est").as(name))
    val ru = ra.union(rb).groupBy(col("bucket"))
      .agg(max(col("reg")).as("reg"))
    val truth = dfA.select(col(keyCol).as("__k")).distinct()
      .join(dfB.select(col(keyCol).as("__k")).distinct(), Seq("__k"))
      .agg(count(lit(1)).as("n_true_overlap"))
    est(ra, "est_a")
      .crossJoin(broadcast(est(rb, "est_b")))
      .crossJoin(broadcast(est(ru, "est_union")))
      .crossJoin(broadcast(truth))
      .select(col("est_a"), col("est_b"), col("est_union"),
        round(col("est_a") + col("est_b") - col("est_union"), 4)
          .as("est_overlap"),
        col("n_true_overlap"))
  }

  def hllUnionReport(df: DataFrame, keyCol: String, groupCol: String,
                     b: Int = 6): DataFrame = {
    val regs = df
      .select(col(groupCol).cast("string").as("grp"),
        hllRho(col(keyCol), b).as("h"))
      .groupBy(col("grp"), col("h.bucket").as("bucket"))
      .agg(max(col("h.rho")).as("reg"))
    val perGroup = reportOfRegs(regs.groupBy(col("grp")), b)
    val merged = reportOfRegs(
      regs.groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
        .withColumn("grp", lit("__all__")).groupBy(col("grp")), b)
    perGroup.union(merged)
      .select(col("grp"), col("m"), col("n_zero"), col("maxreg"),
        col("s"), col("raw_est"))
      .orderBy(col("grp"))
  }

  /** PORTABLE approximate quantiles per group — the oracle-checkable
    * tier of the approx-percentile family (Spark's
    * `percentile_approx` rides an engine-internal KLL-style sketch no
    * other system replays; this one is a fixed-width value lattice,
    * so every estimate is exact integer arithmetic both engines
    * reproduce): values bucket at `floor(v / width)`, one cumulative
    * window over the per-(group, bucket) counts, and quantile q‰ is
    * the FIRST bucket whose cumulative count reaches
    * ceil(n·q/1000) — thresholds as `(n·q + 999) div 1000`, pure
    * BIGINT, no float rank anywhere. Error is bounded by `width` by
    * construction (the estimate is the bucket's lower edge), which is
    * the honest contract: the caller picks the resolution, and the
    * sketch size is the group's OCCUPIED bucket count.
    *
    * Movement: volume collapses to the (group, bucket) grain in the
    * first map-side combine; the window and the final fold run on
    * that bucket frame only. The mergeable form is the bucket-count
    * table itself — per-shard tables add, the CMS/HLL sink discipline
    * applies unchanged. */
  def latticeQuantiles(df: DataFrame, key: String, value: Column,
                       width: Double, qsPerMille: Seq[Int]): DataFrame = {
    require(width > 0, s"width must be > 0, got $width")
    require(qsPerMille.nonEmpty &&
      qsPerMille.forall(q => q >= 1 && q <= 1000),
      s"quantiles must be 1..1000 per-mille, got $qsPerMille")
    val buckets = df.filter(value.isNotNull)
      .groupBy(col(key),
        floor(value / lit(width)).cast("long").as("__b"))
      .agg(count(lit(1)).as("__c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
    val cum = buckets
      .withColumn("__cum", sum(col("__c")).over(w))
      .withColumn("__n", sum(col("__c")).over(wAll))
    val qCols = qsPerMille.flatMap { q =>
      val hit = col("__cum") >= expr(s"(__n * ${q}L + 999L) div 1000L")
      Seq(min(when(hit, col("__b"))).as(s"q${q}_bucket"),
        (min(when(hit, col("__b"))) * width).as(s"q${q}_est"))
    }
    cum.groupBy(col(key))
      .agg(min(col("__n")).as("n"), qCols: _*)
      .orderBy(col(key))
  }
}
