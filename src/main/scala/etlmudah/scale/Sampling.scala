package etlmudah.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting and sampling for training-data
  * curation: train/val/test splits, per-domain (stratified) downsampling,
  * and mixture reweighting.
  *
  * Everything derives from ONE primitive: a uniform in [0,1) computed
  * from md5 of the row key. That makes every operation
  *  - a pure per-row projection: no shuffle, no RNG state, no
  *    `sample()` nondeterminism — embarrassingly parallel at any scale
  *    and stable across reruns, executors, and engines;
  *  - re-derivable: membership of a row in a split is a function of its
  *    key alone, so late-arriving data lands in the same split and a
  *    split can be reproduced years later from the key;
  *  - oracle-checkable: DuckDB computes the identical uniform via
  *    `('0x' || substr(md5(key), 1, 8))::UBIGINT / 4294967296.0`.
  *
  * Thresholds are passed as explicit cumulative UPPER BOUNDS (not
  * weights) so the literals compared against are bit-identical on both
  * engines — `0.8 + 0.1` in double arithmetic is NOT `0.9`.
  */
object Sampling {

  /** Uniform in [0,1) from md5 of the key (first 32 bits / 2^32).
    * `salt` decorrelates independent splits over the same keys. */
  def hashUniform(key: Column, salt: String = ""): Column =
    conv(substring(md5(concat(key.cast("string"), lit(salt)).cast("binary")), 1, 8),
      16, 10).cast("long").cast("double") / lit(4294967296.0)

  /** Deterministic split assignment: label = first entry whose upper
    * bound exceeds the key's uniform. Bounds must be ascending; rows at
    * or above the last bound get `restLabel` (use 1.0 as the final
    * bound to cover everything). Null keys have no uniform and land in
    * `restLabel` (in `stratifiedSample` they are dropped) — filter
    * upstream if null keys should be handled differently. */
  def hashSplit(df: DataFrame, keyCol: String,
                bounds: Seq[(String, Double)], salt: String = "",
                restLabel: String = "rest"): DataFrame = {
    require(bounds.map(_._2) == bounds.map(_._2).sorted,
      "split bounds must be ascending")
    val u = hashUniform(col(keyCol), salt)
    val label = bounds.foldRight(lit(restLabel): Column) {
      case ((name, hi), otherwise) => when(u < hi, lit(name)).otherwise(otherwise)
    }
    df.withColumn("split", label)
  }

  /** Approximate sequence packing for training batches: assign each
    * document to a (bucket, bin) so bins hold ~`capacity` tokens.
    * Documents hash into `buckets` independent streams (so packing
    * parallelizes — the cumulative window runs per bucket, never
    * globally); within a bucket, bins are cut by cumulative token count
    * in key order. Next-fit-by-cumsum is approximate: a document
    * straddling a boundary lands in the bin its PRECEDING total points
    * at, so bins can overflow by at most one document — the standard
    * streaming-packing tradeoff, deterministic and shuffle-minimal (one
    * exchange on the bucket key). Returns the input plus (bucket, bin).
    */
  def packIntoBins(df: DataFrame, keyCol: String, tokenCol: String,
                   capacity: Long, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = floor(hashUniform(col(keyCol)) * buckets).cast("int")
    val withBucket = df.withColumn("bucket", b)
    val w = Window.partitionBy(col("bucket")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // non-negative operands: floor(double div) == integer div on both engines
    withBucket
      .withColumn("__running", sum(col(tokenCol)).over(w))
      .withColumn("bin",
        floor((col("__running") - col(tokenCol)) / lit(capacity.toDouble))
          .cast("long"))
      .drop("__running")
  }

  /** Temperature-based mixture resampling — the multinomial rule of
    * multilingual LM corpus balancing: stratum s with n_s rows gets
    * target share n_s^alpha / sum_t n_t^alpha (alpha in (0,1] flattens
    * the mixture toward uniform; alpha=1 keeps natural proportions), so
    * its per-row keep probability is min(1, targetTotal*share/n_s).
    * Rows are kept by the same deterministic md5-uniform as
    * `stratifiedSample` — re-running reproduces the sample exactly, and
    * growing the corpus only adds/removes rows whose own uniform flips.
    *
    * Scale shape: the stratum census is a tiny partial-agg'd groupBy
    * (|strata| rows) broadcast back onto the corpus — the big side is
    * never shuffled, exactly like `stratifiedSample` with computed
    * fractions. Output preserves the input's column order.
    *
    * Cross-engine parity: use alpha=0.5 when bit-parity matters (sqrt
    * is correctly rounded per IEEE 754 while pow(x, a) is not). The
    * normalizer z = sum of stratum weights is a floating sum whose
    * accumulation order is engine/partitioning dependent; a key whose
    * uniform lands within an ulp of its keep threshold could therefore
    * flip between engines. With realistic strata counts (tens to
    * thousands) the error is a few ulps — treat per-row membership as
    * exact only up to that tolerance. */
  def temperatureSample(df: DataFrame, keyCol: String, strataCol: String,
                        alpha: Double, targetTotal: Long,
                        salt: String = ""): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    // sqrt fast path keyed with a tolerance, not exact double equality
    // (pow(x, 0.5) and sqrt(x) agree to the ulp on IEEE doubles, so the
    // branch is cosmetic either way)
    val weight: Column => Column =
      if (math.abs(alpha - 0.5) < 1e-12) sqrt(_) else pow(_, lit(alpha))
    val census = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    // |strata| rows: the empty-frame window is a single-partition
    // exchange of the census only, never of the corpus
    val z = sum(weight(col("__n"))).over(Window.partitionBy())
    val frac = census.select(col(strataCol),
      least(lit(1.0), lit(targetTotal.toDouble) * weight(col("__n")) / z / col("__n"))
        .as("__f"))
    df.join(broadcast(frac), Seq(strataCol))
      .filter(hashUniform(col(keyCol), salt) < col("__f"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /** Per-stratum TOKEN-budget sampling — corpus mixing by token count,
    * not document count (the unit LM training actually consumes):
    * within each stratum, documents are taken in deterministic
    * md5-uniform order until the stratum's cumulative token total
    * reaches `budget`. Next-fit semantics: a document straddling the
    * boundary is kept (its PRECEDING total is under budget), so each
    * stratum overshoots by at most one document — same convention as
    * `packIntoBins`, and oracle-reproducible because no look-ahead is
    * needed. One keyed window shuffle; no RNG; growing the corpus only
    * appends to each stratum's uniform order, so the kept prefix is
    * stable under growth until the budget boundary moves. */
  def tokenBudgetSample(df: DataFrame, keyCol: String, strataCol: String,
                        tokenCol: String, budget: Long,
                        salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashUniform(col(keyCol), salt).asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .filter(col("__cum") - col(tokenCol) < budget)
      .drop("__cum")
  }

  /** Per-stratum deterministic downsampling: keep a row iff its uniform
    * is below the stratum's fraction (strata absent from the map keep
    * `defaultFraction`). The mixture-reweighting primitive: fractions
    * chosen per domain/source/language reshape the corpus composition
    * without a shuffle or an RNG. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       salt: String = ""): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction): Column) {
      case (otherwise, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(f)).otherwise(otherwise)
    }
    df.filter(hashUniform(col(keyCol), salt) < frac)
  }

  /** Per-stratum document CAP (the RefinedWeb "at most N pages per
    * domain" rule): keep at most `cap` rows per stratum, chosen in
    * deterministic md5-uniform order (ties break on the key). A count
    * quota — unlike `stratifiedSample`'s rate quota — so a stratum with
    * a million rows and one with twenty both land at <= cap.
    *
    * One stratum-keyed window shuffle; never a global sort. A stratum
    * hot enough that even its (key, uniform) rows skew one reducer is
    * the AQE-skew case, not a different algorithm. */
  def capPerStratum(df: DataFrame, keyCol: String, strataCol: String,
                    cap: Int, salt: String = ""): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashUniform(col(keyCol), salt).asc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** CLUSTER-BALANCED diversity sample: assign every embedding to its
    * nearest coarse centroid, then keep at most `perCluster` vectors
    * per cluster in deterministic md5-uniform order — [[capPerStratum]]
    * with the stratum COMPUTED by semantic clustering instead of read
    * from a column. This is the cluster-then-cap recipe for de-biasing
    * a corpus toward semantic coverage (dense regions — boilerplate,
    * near-duplicate templates — contribute at most `perCluster` docs;
    * sparse regions keep everything), the sampling-side complement of
    * SemDeDup's cluster-then-dedup.
    *
    * Built on [[Similarity.portableAssign]] (the q158 deterministic
    * md5-pick quantizer), so the WHOLE pipeline — centroid pick,
    * argmax-cosine assignment, per-cluster cap — replays in external
    * SQL and carries a hash-checked oracle row (q208); swap in the
    * trained quantizer ([[Similarity.ivfTopKAll]]'s) for production
    * list balance and the cap machinery is unchanged.
    *
    * Scale shape: centroids broadcast, assignment argmax rides the
    * repartition(id) exchange map-side-combined (vectors never
    * shuffle), and the cap is ONE cluster-keyed window over (id, cid)
    * pairs — fixed-width rows, never embeddings. A degenerate quantizer
    * that lands most of the corpus in one cluster makes that cluster's
    * window partition corpus-sized: raise `nlist` (the intended dial)
    * or salt as in [[capPerStratum]]'s AQE note.
    *
    * Returns (vec_id, centroid_id, pick_rank) for the kept rows. */
  def clusterBalancedSample(embeddings: DataFrame, idCol: String,
                            vecCol: String, nlist: Int = 8,
                            perCluster: Int = 32,
                            salt: String = ""): DataFrame = {
    val assign = Similarity.portableAssign(embeddings, idCol, vecCol,
      nlist, keepVec = false)
    val w = Window.partitionBy(col("cid"))
      .orderBy(hashUniform(col("id"), salt).asc, col("id").asc)
    assign.withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= perCluster)
      .select(col("id").as("vec_id"), col("cid").as("centroid_id"),
        col("pick_rank"))
      .orderBy(col("vec_id"))
  }

  /** Weighted sampling WITHOUT replacement, k winners (Efraimidis &
    * Spirakis A-Res): rank rows by ln(u)/w — monotone in the classic
    * u^(1/w) key, so the global top-k by it IS the weighted sample —
    * and keep the k largest. Deterministic: u is the md5-uniform of the
    * row key, so the sample is reproducible and oracle-checkable.
    *
    * The key is a pure projection and top-k plans as
    * TakeOrderedAndProject (per-partition heaps + driver merge of k
    * rows), so cost is one scan — no global sort, no shuffle of the
    * corpus. The key is rounded to 12 dp before ranking so a last-ulp
    * ln()/division difference between engines cannot flip the k-th
    * boundary; u is floored at 1e-12 so a zero uniform (p = 2^-32 per
    * row — real at corpus scale) cannot produce -Infinity.
    *
    * Returns the winners with their ranking key as `ares_key`. Weights
    * must be strictly positive. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
                     k: Int, salt: String = ""): DataFrame = {
    val u = greatest(hashUniform(col(keyCol), salt), lit(1e-12))
    val key = round(log(u) / col(weightCol).cast("double"), 12)
    df.withColumn("ares_key", key)
      .orderBy(col("ares_key").desc, col(keyCol).asc)
      .limit(k)
  }

  /** LEAKAGE-SAFE split: [[hashSplit]] where every member of a near-dup
    * cluster is assigned by its CLUSTER id's uniform instead of its own
    * — so a train/test boundary can never separate two near-duplicate
    * documents (the eval-contamination hole a plain per-doc split
    * leaves open even after q47-style decontamination: a near-dup pair
    * split across the boundary leaks test content into training).
    *
    * `clusters` is `Dedup.dupClusters` output ((doc_id, cluster_id, …));
    * docs outside any cluster keep their own key. The join's right side
    * is duplicate FAMILIES only — vanishing vs the corpus, so AQE
    * broadcasts it; the split itself stays a pure projection. */
  def leakageSafeSplit(df: DataFrame, keyCol: String,
                       bounds: Seq[(String, Double)], clusters: DataFrame,
                       salt: String = "",
                       restLabel: String = "rest"): DataFrame =
    hashSplit(
      df.join(clusters.select(col("doc_id").as(keyCol), col("cluster_id")),
          Seq(keyCol), "left")
        .withColumn("__ek", coalesce(col("cluster_id"), col(keyCol))),
      "__ek", bounds, salt, restLabel)
      .drop("__ek")

  /** Deterministic k-fold assignment for cross-validation: fold =
    * floor(u * k) over the md5-uniform of the key (clamped to k-1 for
    * the u→1 edge). Same contract as [[hashSplit]]: membership is a
    * pure function of the key, so folds are reproducible, growth-stable
    * and shuffle-free, and fold i's validation set is exactly the rows
    * `fold === i`. */
  def kFold(df: DataFrame, keyCol: String, k: Int,
            salt: String = ""): DataFrame = {
    require(k >= 2, "k must be at least 2")
    df.withColumn("fold",
      least(floor(hashUniform(col(keyCol), salt) * lit(k)), lit(k - 1))
        .cast("int"))
  }

  /** Weighted per-stratum CAP: keep the top `cap` rows of each stratum
    * by the A-Res key ln(u)/w — [[capPerStratum]]'s count quota with
    * [[weightedSample]]'s weight-proportional choice, i.e. a weighted
    * sample WITHOUT replacement of size `cap` from every stratum in one
    * pass (per-domain quotas that still prefer long/high-quality docs).
    *
    * Same single stratum-keyed window as `capPerStratum`; the key is
    * rounded to 12 dp and u floored at 1e-12 (the q90 ulp armor), so
    * the boundary row cannot flip between engines. */
  def weightedCapPerStratum(df: DataFrame, keyCol: String,
                            strataCol: String, weightCol: String,
                            cap: Int, salt: String = ""): DataFrame = {
    val u = greatest(hashUniform(col(keyCol), salt), lit(1e-12))
    val key = round(log(u) / col(weightCol).cast("double"), 12)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(key.desc, col(keyCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Corpus mixture PLAN: given per-stratum target weights and a total
    * token budget, report for every stratum its natural share, its
    * target share, and the sampling rate / epoch count that realizes
    * the target (the "how many epochs of Wikipedia vs one pass of
    * CommonCrawl" table every LLM data recipe publishes; cf. the
    * reference's per-segment composition reports).
    *
    * `epochs` = target_tokens / stratum_tokens: < 1 means downsample at
    * that rate (feed `stratifiedSample` with it), > 1 means repeat the
    * stratum that many times. `sampling_fraction` is epochs clamped to
    * 1.0 — the single-pass rate. Weights need not sum to 1; strata
    * absent from the map get `defaultWeight`.
    *
    * Cost: one map-side-combined aggregate over the corpus (strata
    * count worth of rows out); the grand total is a window over that
    * bounded frame — nothing here grows with corpus size and the
    * corpus is scanned exactly once, so the plan step is free at
    * 100 TB. */
  def mixturePlan(df: DataFrame, strataCol: String, sizeCol: String,
                  weights: Map[String, Double], budget: Long,
                  defaultWeight: Double = 0.0): DataFrame = {
    val weight = weights.foldLeft(lit(defaultWeight): Column) {
      case (otherwise, (stratum, wt)) =>
        when(col(strataCol) === stratum, lit(wt)).otherwise(otherwise)
    }
    val perStratum = df.groupBy(col(strataCol)).agg(
      count(lit(1)).as("n_docs"),
      sum(col(sizeCol).cast("long")).as("tokens"))
    // grand total as a window over the AGGREGATED |strata| frame — a
    // separate aggregate + cross join would scan the corpus twice.
    // ANSI guards: a stratum of zero-size rows (tokens = 0) yields null
    // epochs/share, not a DIVIDE_BY_ZERO job failure
    val total = sum(col("tokens")).over(Window.partitionBy())
    val epochs = when(col("tokens") > 0,
      lit(budget) * weight / col("tokens"))
    perStratum
      .withColumn("target_weight", weight)
      .select(col(strataCol), col("n_docs"), col("tokens"),
        round(when(total > 0, col("tokens") / total), 6).as("natural_share"),
        col("target_weight"),
        round(lit(budget) * col("target_weight"), 1).as("target_tokens"),
        round(epochs, 6).as("epochs"),
        round(least(epochs, lit(1.0)), 6).as("sampling_fraction"))
  }

  /** EPOCH-CAPPED mixture plan — exact water-filling over the strata
    * frame. [[mixturePlan]]'s epochs column can exceed any sane
    * repetition count (data-constrained scaling: repeating a source
    * past ~4 epochs returns sharply diminishing value, Muennighoff et
    * al. 2023), so this planner allocates `budget` tokens
    * proportionally to integer `weights` SUBJECT TO a per-stratum cap
    * of `maxEpochs` × its unique tokens, spilling displaced budget to
    * the unsaturated strata — the standard water-filling solution,
    * computed in CLOSED FORM (no iteration): sort strata by cap/weight
    * ascending; the saturated set is a prefix of that order; the
    * prefix boundary falls out of one cumulative-sum window pass.
    *
    * Every decision is BIGINT-exact: weights are small integer parts
    * (1:2:3-style ratios — keeping the cap×weight cross-products far
    * from Long overflow even at 10^13-token strata), the saturation
    * test is the cross-multiplied w·B ≥ cap·W (never a float λ), and
    * final allocations/epochs round via integer division. Only the
    * SORT key (cap/w) is a double, and equal rationals divide to equal
    * doubles on every IEEE engine with the stratum tie-break behind it.
    *
    * Scale: one corpus aggregate, then ALL windows run over the
    * |strata|-row frame (the q137 shape) — partition-less by design
    * and bounded by the number of provenance labels.
    *
    * Output per stratum: n_docs, tokens, weight, cap_tokens,
    * saturated, alloc_tokens, epochs (6dp, null for empty strata). */
  def epochPlan(df: DataFrame, strataCol: String, sizeCol: String,
                weights: Map[String, Long], budget: Long,
                maxEpochs: Int = 4, defaultWeight: Long = 1L): DataFrame = {
    require(budget >= 0, "budget must be non-negative")
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    require(defaultWeight >= 0 && weights.values.forall(_ >= 0),
      "weights must be non-negative")
    val w = weights.foldLeft(lit(defaultWeight): Column) {
      case (otherwise, (stratum, wt)) =>
        when(col(strataCol) === stratum, lit(wt)).otherwise(otherwise)
    }
    val per = df.groupBy(col(strataCol)).agg(
        count(lit(1)).as("n_docs"),
        sum(col(sizeCol).cast("long")).as("tokens"))
      .withColumn("weight", w.cast("long"))
      .withColumn("cap_tokens", col("tokens") * maxEpochs)
      // zero-weight strata get ratio +inf via the null sort (LAST): they
      // can never saturate (their proportional share is 0 <= cap)
      .withColumn("ratio", when(col("weight") > 0,
        col("cap_tokens").cast("double") / col("weight")))
    val ord = Window.orderBy(col("ratio").asc_nulls_last, col(strataCol))
    val before = ord.rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val marked = per
      .withColumn("__capB", coalesce(sum(col("cap_tokens")).over(before),
        lit(0L)))
      .withColumn("__wB", coalesce(sum(col("weight")).over(before), lit(0L)))
      .withColumn("__wT", sum(col("weight")).over(all))
      // stage test at position k: w_k * B_{k-1} >= cap_k * W_{k-1}
      // (B = budget minus caps already granted, W = weight not yet
      // satisfied); monotone in ratio order, so the saturated set is
      // the longest prefix where the test holds — enforced by the
      // running min
      .withColumn("__ok", when(
        col("weight") * (lit(budget) - col("__capB")) >=
          col("cap_tokens") * (col("__wT") - col("__wB")), 1L)
        .otherwise(0L))
      .withColumn("saturated",
        min(col("__ok")).over(ord.rowsBetween(
          Window.unboundedPreceding, Window.currentRow)) === 1L)
    val planned = marked
      .withColumn("__capSat", coalesce(sum(when(col("saturated"),
        col("cap_tokens"))).over(all), lit(0L)))
      .withColumn("__wUnsat", coalesce(sum(when(!col("saturated"),
        col("weight"))).over(all), lit(0L)))
      // DIV, not '/': Spark's Divide is double division — exactness at
      // 10^13-token strata needs the integral operator. The 6dp epochs
      // split into quotient + half-up remainder so the scaled product
      // stays within Long for any stratum under ~4.6e12 unique tokens
      // (documented bound; the ALLOCATION itself is exact at any scale)
      .withColumn("alloc_tokens", when(col("saturated"), col("cap_tokens"))
        .otherwise(when(col("__wUnsat") > 0,
          expr(s"weight * ($budget - __capSat) div __wUnsat"))
          .otherwise(lit(0L))))
    planned
      .withColumn("__eq", expr("alloc_tokens div tokens"))
      .withColumn("__er", col("alloc_tokens") - col("__eq") * col("tokens"))
      .select(col(strataCol), col("n_docs"), col("tokens"),
        col("weight"), col("cap_tokens"), col("saturated"),
        col("alloc_tokens"),
        (when(col("tokens") > 0,
          col("__eq") * 1000000L +
            expr("(__er * 2000000 + tokens) div (tokens * 2)"))
          .cast("double") / lit(1000000.0)).as("epochs"))
      .orderBy(col(strataCol))
  }

  /** Token-balanced SHARD assignment for training-data export: assign
    * every row a shard id so that consecutive shards (in `keyCol`
    * order) each hold ~`shardBudget` worth of `sizeCol`. The export
    * primitive behind "write the corpus as N-token tfrecord/parquet
    * shards".
    *
    * shard = floor(start_offset / budget) where start_offset is the
    * exclusive prefix sum of sizes in key order — so a row never
    * straddles the budget boundary decision and an oversized row simply
    * owns its shard(s).
    *
    * The prefix sum is DISTRIBUTED, never a one-reducer window:
    *  1. range-partition by key (contiguous key ranges per partition);
    *  2. per-partition cumulative sums in parallel (window PARTITIONED
    *     by the range bucket);
    *  3. per-bucket totals — one row per partition, a bounded frame —
    *     get their exclusive prefix via a tiny window over ≤ numBuckets
    *     rows, broadcast back.
    * Global offset = bucket offset + local cumsum. The result is
    * invariant to where the range boundaries fall, so the oracle is the
    * plain one-ordering window cumsum.
    *
    * Cost: two full-data exchanges (the range shuffle, then the
    * bucket-clustered window shuffle — Catalyst cannot see that `__b`
    * is constant per range partition) — both fully parallel. Project
    * down to (key, size, payload you need) before calling at scale;
    * column pruning pushes the projection below both shuffles. */
  def shardAssign(df: DataFrame, keyCol: String, sizeCol: String,
                  shardBudget: Long, buckets: Int = 0,
                  startOffset: Long = 0L): DataFrame = {
    require(shardBudget > 0, "shardBudget must be positive")
    require(startOffset >= 0, "startOffset must be non-negative")
    // startOffset continues a previous export's running total (the
    // streaming shard sink's incremental case)
    withStartOffset(df, keyCol, sizeCol, buckets, startOffset)
      .withColumn("shard",
        floor(col("__start") / lit(shardBudget)).cast("long"))
      .drop("__start")
  }

  /** The distributed exclusive prefix sum behind [[shardAssign]] and
    * [[packSequences]]: adds `__start` = sum of `sizeCol` over all rows
    * strictly before this one in `keyCol` order, plus `startOffset`.
    * See [[shardAssign]]'s scaladoc for the three-stage range-bucketed
    * construction; the result is invariant to where the range
    * boundaries fall, so the oracle is the plain one-ordering window
    * cumsum. */
  private def withStartOffset(df: DataFrame, keyCol: String,
                              sizeCol: String, buckets: Int,
                              startOffset: Long): DataFrame = {
    val b = if (buckets > 0) buckets
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val bucketed = df.repartitionByRange(b, col(keyCol))
      .withColumn("__b", spark_partition_id())
    val wLocal = Window.partitionBy(col("__b")).orderBy(col(keyCol))
    val withLocal = bucketed.withColumn("__lc",
      sum(col(sizeCol).cast("long")).over(wLocal))
    // bucket totals come from `bucketed` (NOT withLocal: that would
    // execute the cumsum window a second time — the groupBy reuses the
    // range exchange instead); one row per range bucket, bounded by
    // numBuckets, hence the partition-less offset window is safe
    val wOff = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__b"))
      .agg(sum(col(sizeCol).cast("long")).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(wOff), lit(0L)))
      .drop("__bsum")
    withLocal.join(broadcast(offsets), "__b")
      .withColumn("__start",
        col("__off") + col("__lc") - col(sizeCol).cast("long")
          + lit(startOffset))
      .drop("__b", "__lc", "__off")
  }

  /** Token-level SEQUENCE PACKING — the GPT-style training-example
    * layout: the corpus is conceptually concatenated in `keyCol` order
    * and chopped into fixed `ctxLen`-token packs; a document straddling
    * a boundary SPLITS across consecutive packs (unlike [[shardAssign]],
    * which keeps rows whole, and [[packIntoBins]], which next-fits whole
    * rows into bins). Emits one row per (document, pack) span:
    * (key, pack_id, doc_offset, n_tokens) where `doc_offset` is the
    * span's starting token within the document — exactly what a loader
    * needs to slice each document's token array into training windows.
    * Every pack except the final one holds exactly `ctxLen` tokens by
    * construction. Zero-`sizeCol` rows vanish (they occupy no tokens).
    *
    * Scale shape: [[shardAssign]]'s two fully-parallel exchanges for
    * the distributed prefix sum, then a constant-bounded explode —
    * each document fans out to ceil(tokens/ctxLen) + 1 spans at most.
    * All span arithmetic is exact integer math, so the table replays
    * bit-for-bit in SQL from a window cumsum. */
  def packSequences(df: DataFrame, keyCol: String, sizeCol: String,
                    ctxLen: Long, buckets: Int = 0,
                    startOffset: Long = 0L): DataFrame = {
    require(ctxLen > 0, "ctxLen must be positive")
    require(startOffset >= 0, "startOffset must be non-negative")
    // startOffset continues a previous packing's running token total
    // (the streaming pack-export sink's incremental case)
    val spans = withStartOffset(df, keyCol, sizeCol, buckets, startOffset)
      .filter(col(sizeCol).cast("long") > 0)
      .withColumn("__end", col("__start") + col(sizeCol).cast("long"))
    // non-negative operands: floor(double div) == integer div; offsets
    // stay exact in double up to 2^53 tokens (far past any corpus)
    spans
      .select(col(keyCol), col("__start"), col("__end"),
        explode(sequence(
          floor(col("__start") / lit(ctxLen.toDouble)).cast("long"),
          floor((col("__end") - 1) / lit(ctxLen.toDouble)).cast("long")))
          .as("pack_id"))
      .select(col(keyCol), col("pack_id"),
        (greatest(col("__start"), col("pack_id") * ctxLen) - col("__start"))
          .as("doc_offset"),
        (least(col("__end"), (col("pack_id") + lit(1L)) * ctxLen)
          - greatest(col("__start"), col("pack_id") * ctxLen))
          .as("n_tokens"))
      .orderBy(col(keyCol), col("pack_id"))
  }

  /** Per-stratum bottom-quantile DROP: remove the lowest `q` fraction
    * of each stratum by `scoreCol` (ties broken on the key) — the
    * adaptive version of a global quality cutoff, so a uniformly weaker
    * source still keeps its best (1-q) rather than being wiped out by a
    * corpus-wide threshold.
    *
    * RANK-based, not value-interpolation-based: a row is dropped iff
    * its (score, key) rank <= floor(q * n_stratum). That keeps the
    * operator exact and engine-portable — no interpolated percentile
    * value whose last ulp could flip boundary rows between engines.
    * Survivors carry `__cutoff_rank` dropped; callers wanting the
    * realized threshold read min(score) of the survivors.
    *
    * One stratum-keyed window shuffle (rank + count in the same
    * window), same scale shape as [[capPerStratum]]. */
  def bottomQuantileDrop(df: DataFrame, scoreCol: String, keyCol: String,
                         strataCol: String, q: Double): DataFrame = {
    require(q >= 0.0 && q < 1.0, "q must be in [0, 1)")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col(scoreCol).asc, col(keyCol).asc)
    val wAll = Window.partitionBy(col(strataCol))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__rn") > floor(lit(q) * col("__n")))
      .drop("__rn", "__n")
  }

  /** Poisson(1) resampling weight from one 16-bit hash lane — the
    * POISSON BOOTSTRAP primitive (Chamandy, Muralidharan, Najmi,
    * Naidu, "Estimating uncertainty for massive data streams", Google
    * TR 2012): at corpus scale one cannot draw n rows with replacement,
    * but Binomial(n, 1/n) -> Poisson(1), so each row independently
    * contributes w ~ Poisson(1) copies to each replicate — a pure
    * per-row projection, embarrassingly parallel, no RNG state.
    *
    * The draw inverts the Poisson(1) CDF against the lane using EXACT
    * precomputed integer thresholds T_k = floor(CDF(k) * 2^16):
    * w = #{k : lane >= T_k}, capped at 8 (on the 16-bit lattice
    * P(w = 8) = 2^-16 vs the true tail 1.1e-5 — the documented
    * quantization, not a silent one; the weight MEAN stays 0.99982).
    * 16-bit lanes are the efficiency lever: ONE md5 per (row, block)
    * yields EIGHT replicate weights, so the hash work is reps/8 per
    * row, not reps (the first cut of this operator paid one md5 per
    * (row, rep) and benched 27 s at sf0.1; this shape benches ~2 s).
    * Zero floating point — any SQL engine replays every weight. */
  def poissonLaneWeight(lane16: Column): Column =
    Sampling.poissonThresholds16
      .map(t => when(lane16 >= lit(t), 1L).otherwise(0L))
      .reduce(_ + _)

  /** floor(CDF_Poisson(1)(k) * 2^16) for k = 0..7 — public so the
    * oracle generator shares the exact constants (no drift). */
  val poissonThresholds16: Seq[Long] = Seq(
    24112L, 48222L, 60277L, 64295L, 65296L, 65497L, 65530L, 65535L)

  /** Bootstrap CONFIDENCE INTERVAL for the mean of `valueCol`: `reps`
    * Poisson-bootstrap replicates of the weighted mean, nearest-rank
    * 2.5%/97.5% percentiles over the replicate distribution. One row
    * out: n, point_est, ci_lo, ci_hi, reps.
    *
    * Replicate weights come in BLOCKS of eight: md5(id # block) is
    * hashed once and its eight 16-bit hex lanes feed
    * [[poissonLaneWeight]] for replicates 8*block .. 8*block+7. The
    * hex string exists only on the (row x blocks) frame; the full
    * (row x reps) frame carries just (rep, weight, value).
    *
    * Exactness discipline: values fold as exact integer CENTS
    * (round(v*100) BIGINT — order-independent, and ~4x faster over
    * the reps-times-corpus frame than Decimal objects; overflow bound
    * sum(w * cents) < 2^63, i.e. ~10^14 rows of 10^5-unit values —
    * the documented dial is folding DECIMAL instead), weights are
    * exact integers, so each replicate's mean is one deterministic
    * double division (mu = swc / (100 * sw), evaluated
    * operand-for-operand identically on both engines); the percentile
    * is nearest-rank over the (mu, rep)-ordered bounded `reps`-row
    * frame — no interpolation, no ulp-sensitive boundary.
    *
    * 100 TB shape: the replicate explosion is map-side combined down
    * to `reps` rows per partition before the exchange (the whole point
    * of the Poisson trick — resampling becomes one aggregate), and the
    * percentile window runs over the |reps| frame. */
  def bootstrapMeanCi(df: DataFrame, idCol: String, valueCol: String,
                      reps: Int = 200): DataFrame = {
    require(reps >= 40, s"too few replicates for a 2.5% tail: $reps")
    val v = round(col(valueCol).cast("double") * 100).cast("long")
    val blocks = (reps + 7) / 8
    val spark = df.sparkSession
    // Expression-duplication discipline (measured, not guessed): each
    // non-cheap value gets its OWN projection step — CollapseProject
    // never inlines a non-cheap alias into multiple uses, so the md5
    // runs once per block row and each lane's conv runs once per lane
    // (the naive one-projection form inlined the conv into all eight
    // CASE branches of its ladder: 64 convs per row, 5x slower; a
    // higher-order transform() lambda is worse still — CodegenFallback)
    val weighted = df
      .select(col(idCol).cast("string").as("__id"), v.as("__v"))
      // rebalance BEFORE the x(blocks) generator multiplies the rows:
      // a single-split local scan would otherwise run the whole hash
      // fan-out on one task; at cluster scale the input is already
      // many-partition and this exchange is noise next to the explode
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("__id"), col("__v"),
        explode(sequence(lit(0), lit(blocks - 1))).as("blk"))
      .select(col("__v"), col("blk"),
        md5(concat(col("__id"), lit("#"), col("blk").cast("string"))
          .cast("binary")).as("__hex"))
      .select(Seq(col("__v"), col("blk")) ++ (0 until 8).map(l =>
        conv(substring(col("__hex"), l * 4 + 1, 4), 16, 10)
          .cast("long").as(s"__l$l")): _*)
      .select(col("__v"), col("blk"),
        posexplode(array((0 until 8).map(l =>
          poissonLaneWeight(col(s"__l$l"))): _*)).as(Seq("lane", "__w")))
      .select((col("blk") * 8 + col("lane")).as("rep"),
        col("__v"), col("__w"))
      .where(col("rep") < reps)
    val mus = weighted.groupBy(col("rep")).agg(
      // an all-zero-weight replicate (probability 0.368^n — real only
      // for toy frames) is an EMPTY resample with no mean; ANSI throws
      // on the zero divisor, so it reports NULL and drops from the
      // percentile frame
      when(sum(col("__w")) > 0,
        sum(col("__w") * col("__v")).cast("double") /
          (lit(100.0) * sum(col("__w")).cast("double"))).as("mu"))
    val rnLo = math.ceil(0.025 * reps).toLong
    val rnHi = math.ceil(0.975 * reps).toLong
    val w = Window.orderBy(col("mu").asc, col("rep").asc) // |reps| frame
    val ranked = mus.where(col("mu").isNotNull)
      .withColumn("__rn", row_number().over(w))
    val point = df.agg(
      count(lit(1)).as("n"),
      (sum(v).cast("double") /
        (lit(100.0) * count(lit(1)).cast("double"))).as("point_est"))
    // BOTH percentile rows come out of ONE pass over the ranked
    // replicate frame (conditional max over the two target ranks):
    // the former per-bound crossJoin pair planned the whole
    // scan→weight-explode→replicate-aggregate subtree once per bound
    // (2 scans + 2 generator fan-outs measured, guide §2.4 duplicated
    // subtrees). The null-guard keeps the degenerate semantics of the
    // old empty-frame crossJoins: if either target rank is absent
    // (fewer surviving replicates than rnHi), the result is empty,
    // exactly as a crossJoin against a zero-row bound frame was.
    val cis = ranked
      .where(col("__rn") === rnLo || col("__rn") === rnHi)
      .agg(
        round(max(when(col("__rn") === rnLo, col("mu"))), 6).as("ci_lo"),
        round(max(when(col("__rn") === rnHi, col("mu"))), 6).as("ci_hi"))
      .where(col("ci_lo").isNotNull && col("ci_hi").isNotNull)
    point.crossJoin(broadcast(cis))
      .select(col("n"), round(col("point_est"), 6).as("point_est"),
        col("ci_lo"), col("ci_hi"), lit(reps.toLong).as("reps"))
  }

  /** RENDEZVOUS (highest-random-weight) shard assignment — Thaler &
    * Ravishankar 1998, the consistent-placement scheme behind cache
    * rings and shard maps: key k lands on argmax_s md5(k ":" s). The
    * property [[shardAssign]]'s mod-hash cannot give: when the shard
    * count changes n → n+1, a key either STAYS or moves to the NEW
    * shard (its argmax over the old candidates is unchanged unless the
    * new candidate beats it) — so a reshard moves ~1/(n+1) of the data
    * and NOTHING migrates laterally between surviving shards. At
    * 100 TB that is the difference between rewriting 1/(n+1) of the
    * corpus and rewriting all of it.
    *
    * Pure per-row projection (an array_max over n (hash, shard)
    * structs — no explode, no shuffle, whole-stage codegen); the hex
    * md5 strings compare lexicographically, which any engine replays.
    * n is bounded to 1024 — rendezvous is O(n) per key; ring-based
    * consistent hashing takes over when shard counts outgrow that. */
  def rendezvousShard(key: Column, nShards: Int): Column = {
    require(nShards >= 1 && nShards <= 1024,
      s"nShards must be in [1, 1024], got $nShards")
    array_max(array((0 until nShards).map(s =>
      struct(md5(concat(key.cast("string"), lit(s":$s"))
          .cast("binary")).as("h"),
        lit(s.toLong).as("s"))): _*)).getField("s")
  }
}
