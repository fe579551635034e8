package graft

import org.apache.spark.sql.execution.FileSourceScanExec

/** Pins the physical-plan claims made in README/SCALE.md: filter
  * pushdown reaches the parquet scan, column pruning narrows ReadSchema,
  * dimension joins broadcast, and top-k plans as TakeOrderedAndProject.
  * A regression that silently de-optimizes a plan fails here even while
  * results stay correct. */
class PlanShapeSpec extends SparkSpec {

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sf0001).queryExecution.executedPlan.toString

  // sparkPlan (pre-AQE): AdaptiveSparkPlanExec hides its inner tree
  // from collect()
  private def scansOf(q: String): Seq[FileSourceScanExec] =
    SparkEntry.queries(q)(spark, sf0001).queryExecution.sparkPlan
      .collect { case s: FileSourceScanExec => s }

  test("q246: skyline is the sweep plan — no self-join; only the bucket-summary broadcast") {
    val plan = planOf("q246_skyline_parts")
    // the definitional NOT-EXISTS would surface as a second join of
    // the part table against itself; the sweep carries exactly ONE
    // join: the <=|buckets|-row cumulative-min summary broadcast back
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 1, plan.take(800))
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    assert(scansOf("q246_skyline_parts").forall(
      _.schema.fieldNames.length <= 3), "scan must prune to 3 columns")
  }

  test("q257: bm25 serving prunes every documents scan to (doc_id, text) or less") {
    val scans = scansOf("q257_bm25_search")
    // the totals branch legitimately narrows further (text only); no
    // branch may drag lang/source/n_chars through the scan
    assert(scans.nonEmpty &&
      scans.forall(_.schema.fieldNames.toSet.subsetOf(
        Set("doc_id", "text"))),
      scans.map(_.schema.fieldNames.mkString(",")).mkString(" | "))
  }

  test("q259: interval join plans as a bin equi-join, never a nested-loop range join") {
    val plan = planOf("q259_interval_join_sessions")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    // the bin key must be a real join key (hash or broadcast-hash)
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), plan.take(800))
  }

  test("q267: ship-date literals reach the lineitem scan; both nation aliases broadcast") {
    val scans = scansOf("q267_nation_trade_flows")
    val li = scans.find(_.schema.fieldNames.contains("l_shipdate")).get
    assert(li.metadata("PushedFilters").contains("GreaterThanOrEqual(l_shipdate"),
      li.metadata("PushedFilters"))
    val plan = planOf("q267_nation_trade_flows")
    // supplier, customer, and two nation aliases all broadcast — only
    // the two fact tables may meet in a shuffled join
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4, plan.take(1200))
  }

  test("q273: sole-returner plans as semi + anti joins, never row subqueries") {
    val plan = planOf("q273_sole_returner")
    assert(plan.contains("LeftSemi"), plan.take(1200))
    assert(plan.contains("LeftAnti"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("q302: Q20 decorrelation plans two semi-joins, the name prefix pushed to the part scan") {
    val plan = planOf("q302_excess_stock_suppliers")
    assert("LeftSemi".r.findAllIn(plan).length >= 2, plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
    val part = scansOf("q302_excess_stock_suppliers")
      .find(_.schema.fieldNames.contains("p_name")).get
    assert(part.metadata("PushedFilters")
      .contains("StringStartsWith(p_name,red)"),
      part.metadata("PushedFilters"))
  }

  test("q304: PNG decode tier reads doc_id alone — blobs synthesize in the projection") {
    assert(scansOf("q304_png_pixel_stats").forall(
      _.schema.fieldNames.toSeq == Seq("doc_id")),
      "documents scan must prune to doc_id")
  }

  test("q309: the k-core loop joins only by semi-join — the edge table never widens") {
    val plan = planOf("q309_k_core")
    assert(plan.contains("LeftSemi"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("q340/q341: the concentration-statistic scale tiers run NO unpartitioned entity-frame window") {
    import org.apache.spark.sql.execution.window.WindowExec
    // q345's rank windows partition by node (degree-bounded frames)
    for (q <- Seq("q340_gini_bucketed", "q341_lorenz_binned",
        "q345_coreness_hindex")) {
      val wins = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.sparkPlan
        .collect { case w: WindowExec => w }
      // q340's rank window partitions by bucket; its offset window and
      // q341's cumulative window run over the <=|buckets|-row summary
      // (child plan already aggregated) — neither ranks the raw
      // entity frame globally
      val global = wins.filter(_.partitionSpec.isEmpty)
      assert(global.forall(w =>
        w.child.find(_.isInstanceOf[
          org.apache.spark.sql.execution.aggregate.BaseAggregateExec])
          .isDefined),
        s"$q has a global window over a non-aggregated frame:\n" +
          global.map(_.toString).mkString)
    }
  }

  test("q345: the h-index step windows ONLY the aggregated histogram — never a raw adjacency partition") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import spark.implicits._
    val sym = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val c = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("node", "c")
    val wins = etlmudah.graph.Centrality.hIndexStep(sym, c)
      .queryExecution.sparkPlan
      .collect { case w: WindowExec => w }
    assert(wins.nonEmpty, "step must fold the histogram via a window")
    assert(wins.forall(w =>
      w.child.find(_.isInstanceOf[BaseAggregateExec]).isDefined),
      "h-index window must sit ABOVE the per-(node,value) aggregate — " +
        "a window over the raw adjacency reintroduces the hot-node " +
        "ceiling:\n" + wins.map(_.toString).mkString)
  }

  test("q337/q349/q350: the entropy-decode tiers prune the documents scan to doc_id alone") {
    for (q <- Seq("q337_jpeg_pixel_stats", "q349_gif_pixel_stats",
        "q350_cross_container_lzw_dedup", "q351_jpeg420_pixel_stats",
        "q352_cross_format_subsample_dedup",
        "q359_jpeg_progressive_stats",
        "q360_cross_format_progressive_dedup",
        "q361_png_color_type_dedup", "q362_png_color_type_stats",
        "q363_png_bit_depth_dedup", "q364_apng_frame_sample",
        "q365_tiff_cross_format_dedup", "q366_tiff_compression_dedup"))
      assert(scansOf(q).forall(
        _.schema.fieldNames.toSeq == Seq("doc_id")),
        s"$q: documents scan must prune to doc_id")
  }

  test("q336: the coreness ladder closes as one grouped max over pinned level frames — no window, no wide join") {
    val plan = planOf("q336_coreness")
    assert(!plan.contains("Window"), plan.take(1200))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("q283: rendezvous placement is one scan + projection + aggregate — no join, no window") {
    val plan = planOf("q283_rendezvous_reshard")
    assert(!plan.contains("Join") && !plan.contains("Window"),
      plan.take(1200))
    assert(scansOf("q283_rendezvous_reshard").forall(
      _.schema.fieldNames.toSeq == Seq("doc_id")),
      "scan must prune to doc_id alone")
  }

  test("q32: filters pushed to the parquet scan, projection pruned") {
    val scan = scansOf("q32_filter_pipeline").head
    val meta = scan.metadata("PushedFilters")
    assert(meta.contains("GreaterThanOrEqual(o_totalprice"), meta)
    assert(meta.contains("In(o_orderpriority"), meta)
    assert(meta.contains("EqualTo(o_orderstatus,F)"), meta)
    // 3 output cols + 3 filter cols, never the whole table
    assert(scan.schema.fieldNames.length <= 5, scan.schema.treeString)
  }

  test("q02: star join broadcasts all three dimension sides") {
    val plan = planOf("q02_stats_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 3, plan.take(800))
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q03: top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf("q03_top_parts")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("q143: date range pushed to the orders scan; all joins hash, dims broadcast") {
    val scans = scansOf("q143_local_supplier_volume")
    val orders = scans.find(_.schema.fieldNames.contains("o_custkey")).get
    val pushed = orders.metadata("PushedFilters")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate"), pushed)
    assert(pushed.contains("LessThan(o_orderdate"), pushed)
    val plan = planOf("q143_local_supplier_volume")
    // 5 joins total, none nested-loop/cartesian; the small sides
    // (region, nation, supplier, customer at sf0.001) ride broadcast
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3, plan.take(800))
  }

  test("q150: EUROPE filter pushed to the region scan; dual-role nation broadcasts, no nested loop") {
    val scans = scansOf("q150_market_share")
    val region = scans.find(_.schema.fieldNames.contains("r_name")).get
    assert(region.metadata("PushedFilters").contains("EqualTo(r_name,EUROPE)"),
      region.metadata("PushedFilters"))
    val plan = planOf("q150_market_share")
    // 6 joins (nation twice — once per role), none nested-loop or
    // cartesian; the dims at sf0.001 all ride broadcast
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(800))
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 3, plan.take(800))
  }

  test("minhash signature aggregate stays inside whole-stage codegen") {
    // the 128-min-column aggregate silently drops to interpreted mode
    // when spark.sql.codegen.maxFields is left at its default 100 — this
    // pins the fix (maxFields=512 in every session builder we own)
    // AQE defers codegen-collapsing above exchanges until stages run, so
    // inspect the non-adaptive plan where the whole tree is visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try {
      val docs = etlmudah.Tables.documents(spark, sf0001).limit(50)
      val sh = etlmudah.scale.Dedup.shingleRows(docs, "text", "doc_id", 3)
      etlmudah.scale.Dedup.minhashBandsRows(sh, 128, 32)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val aggLines = plan.linesIterator
      .filter(l => l.contains("HashAggregate") && l.contains("min(")).toSeq
    assert(aggLines.nonEmpty, plan.take(800))
    assert(aggLines.forall(_.contains("*(")), aggLines.mkString("\n").take(800))
  }

  test("sampling operators are pure projections — no exchange, no shuffle") {
    val docs = etlmudah.Tables.documents(spark, sf0001)
    val split = etlmudah.scale.Sampling.hashSplit(docs, "doc_id",
      Seq(("train", 0.8), ("val", 0.9), ("test", 1.0)))
    val sampled = etlmudah.scale.Sampling.stratifiedSample(docs, "doc_id",
      "lang", Map("en" -> 0.5), defaultFraction = 0.1)
    for (df <- Seq(split, sampled)) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan.take(500))
    }
  }

  test("asofJoin: exactly one exchange — the keyed window; no join operator") {
    // the union + sorted-window form must never plan an actual join
    // (range join / BroadcastNestedLoop would be the quadratic failure
    // mode) and must shuffle the unioned stream exactly once
    import org.apache.spark.sql.functions._
    val ev = etlmudah.Tables.eventsTyped(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("cid"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try etlmudah.joins.Joins
      .asofJoin(purchases, clicks, "user_id", "ts", Seq("cid" -> "click_id"))
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(!plan.contains("Join"), plan.take(600))
    assert("Exchange".r.findAllIn(plan).length == 1, plan.take(600))
  }

  test("q69: centroid aggregate is partially aggregated and codegen'd") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try planOf("q69_label_centroids")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val aggLines = plan.linesIterator
      .filter(l => l.contains("HashAggregate") && l.contains("avg(")).toSeq
    assert(aggLines.size >= 2, plan.take(600))        // partial + final
    assert(aggLines.forall(_.contains("*(")), aggLines.mkString("\n").take(600))
  }

  test("no query plans a cartesian product; nested-loop joins only where bounded") {
    // BroadcastNestedLoopJoin is legitimate exactly where the build side
    // is a bounded frame by construction: q57's single-row corpus size,
    // q27's single query vector, q51's probe set, q38's nlist-row
    // centroid table, q79's single-row percentile bounds, q96's
    // single-row grand-total, q94's nlist-row refined centroids, q93's
    // two single-row profile aggregates, q99's single-row vocabulary
    // total, q106's single-row transition total, q111's single-row user
    // total, q112's single-row unigram/bigram totals, q113's single-row
    // first-day frame, q115's bounded probe set (the exact-baseline
    // broadcast scan is the point of the recall report), q105's
    // nothing (entropy has no cross join). Anything else — and any
    // CartesianProduct — is an accident this pins against.
    // q43's 1-row cardinality frames crossJoin back together broadcast
    // q133/q134's pair matrices non-equi-join two |groups|-row
    // aggregates (provenance labels — dimension-sized by construction);
    // q135's corpus doc count is a single-row broadcast cross join
    val bnljAllowed = Set("q57_tfidf", "q131_bm25", "q43_cardinalities",
      "q27_cosine_topk",
      "q51_similarity_profile", "q38_ivf_topk", "q79_price_deciles_scale",
      "q96_skew_report", "q94_kmeans_refine", "q93_profile_orders",
      "q99_unigram_logprob", "q100_semantic_dedup", "q106_bigram_logprob",
      // q149's totals side is a single broadcast row (the q99 shape)
      "q149_dsir_selection",
      "q111_event_funnel", "q151_windowed_funnel", "q112_collocations",
      "q113_rolling_active",
      "q115_ann_recall", "q133_source_overlap", "q134_lexical_divergence",
      "q135_boilerplate_shingles",
      // q136's probe side is a bounded id slice, broadcast by
      // construction — the exact-twin audit floor for q62's LSH tier
      "q136_embedding_pairs_exact",
      // q158's build side is the nlist-row portable centroid table —
      // the q38 assignment shape with a deterministic pick
      "q158_ivf_assign_portable",
      // q164 reuses q158's bounded centroid broadcast for the portable
      // SemDeDup assignment step
      "q164_semantic_dedup_portable",
      // q179 carries q158's nlist-row centroid broadcast twice (list
      // assignment + probe-list selection); the PQ/ADC joins stay keyed
      "q179_ivfpq_topk",
      // q167 fans doc profiles out by the |classes|-row broadcast
      "q167_rank_profile_classify",
      // q169 carries q57's single-row corpus-count broadcast
      "q169_tfidf_cosine_pairs",
      // q188/q189 carry q106's shape plus the single-row
      // distinct-bigram total broadcast (the Kneser-Ney normalizer)
      "q188_kneser_ney_logprob", "q189_perplexity_buckets",
      // q208 reuses q158's nlist-row centroid broadcast under the cap
      "q208_cluster_balanced_sample",
      // q210's build side is the nProbes-row probe set (the q115
      // exact-baseline broadcast, scored twice per row)
      "q210_matryoshka_recall",
      // q211 runs q158's centroid broadcast once per snapshot side
      "q211_semantic_drift_psi",
      // q225's build side is the nprobe-row packed-signature set (the
      // q115/q210 bounded-probe broadcast, scanned against 8-byte-per-
      // vector signatures); q229 carries it twice (binary tier + the
      // exact ground-truth scan it is measured against); q308 is
      // q229's shape at the 128-bit thermometer dial (same bounded
      // |probes|-row signature broadcast on both sides)
      "q225_binary_hamming_topk", "q229_binary_recall",
      "q308_binary_recall_128",
      // q310's grid build crosses the |classes| frame with the
      // |sensitive-domain| margin (an attribute domain, small by
      // construction) and the single-row grand total — both broadcast
      "q310_t_closeness",
      // q312 crosses the |nations| rollup with the single-row grand
      // total (the q06 percent-of-total shape at the region grain)
      "q312_ratio_to_parent",
      // q319's cell frame (|domain(x)| x |domain(y)|) crosses the
      // single-row grand total — the q99 normalizer shape
      "q319_type_dow_mi",
      // q317 crosses the per-order span frame with the single-row
      // corpus horizon (max order date) for the censoring bound
      "q317_reorder_survival",
      // q322 crosses the 10-row decile frame with the single-row
      // grand total (the q06 share shape); q321 crosses the two
      // 25-row nation coordinate frames (bounded dimension grid)
      "q322_lorenz_deciles", "q321_nearest_nation",
      // q326 crosses the |days| daily aggregate with the single-row
      // (n, total) frame for the exact CUSUM lattice
      "q326_changepoint_split",
      // q330/q332 cross bounded frames with single-row moment/count
      // frames (pooled CUPED moments; edge/node/recip counts)
      "q330_cuped_adjustment", "q332_host_reciprocity",
      // q333 crosses the distinct-value lattice frame with the
      // single-row rank frame, then the single-row exact median
      "q333_median_order_stat_ci",
      // q231's build side is the single-row count-min grid (one
      // array<bigint> of depth*width) broadcast onto the topN winners
      "q231_cms_heavy_hitters",
      // q236 joins two single-row frames (HLL report x true distinct)
      "q236_hll_distinct_sketch",
      // q237 assembles its one-row report from three single-row frames
      // (point estimate x nearest-rank lo x nearest-rank hi)
      "q237_bootstrap_mean_ci",
      // q245 assembles four single-row frames (three sketch estimates
      // + the exact-intersection audit count)
      "q245_hll_overlap",
      // q250/q251 carry q57's single-row corpus-total broadcast (the
      // basket count / the doc+label totals) onto a keyed rule frame
      "q250_association_rules", "q251_chi2_terms",
      // q255 completes the r×c contingency grid by cross-joining two
      // category-bounded dimension frames (the q133 pair-matrix shape)
      "q255_chi2_independence",
      // q257/q258 carry bm25Search's single-row (N, avgdl) broadcast;
      // q258 additionally runs q27's single-query-vector broadcast scan
      "q257_bm25_search", "q258_hybrid_rrf",
      // q262 carries q27's query-vector broadcast plus the MMR loop's
      // ≤k-row selected-vector broadcast each greedy round
      "q262_mmr_rerank",
      // q263 assembles its one-row report from the single-row estimate
      // and truth frames (the q236 shape)
      "q263_cms_join_size",
      // q274/q275 carry a single-row global scalar broadcast (the avg
      // positive balance / the (total, part-count) pair) — the TPC-H
      // Q22/Q11 scalar-subquery decorrelation shape
      "q274_dormant_rich_customers", "q275_revenue_share_parts",
      // q279 runs the MMR-loop shape: a ≤k-row selected-vector
      // broadcast each greedy round
      "q279_kcenter_coreset",
      // q294's build side is the single-row (global sum, global n)
      // frame — the target-encoding prior broadcast
      "q294_target_encoding",
      // q340/q341 carry the single-row percentile-BOUNDARY broadcast
      // (the q79 bucketing shape) — the exact point of the scale
      // tier: a ≤buckets-row frame replaces the global rank window
      "q340_gini_bucketed", "q341_lorenz_binned")
    // these train a model; no single plan to inspect
    val skip = Set("q33_ml_importances", "q81_ml_predict_one")
    for ((name, fn) <- SparkEntry.queries if !skip(name)) {
      val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name plans a cartesian")
      if (!bnljAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected nested-loop join")
    }
  }

  test("q79: decile scale tier plans no window (vs q73's single-partition ntile)") {
    val plan = planOf("q79_price_deciles_scale")
    assert(!plan.contains("Window"), plan.take(600))
    // the exact tier it replaces DOES carry the global window — the two
    // tiers are meaningfully different plans, not renames
    assert(planOf("q73_price_deciles").contains("Window"))
  }

  test("q83: one strata-keyed window, never a global one") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try planOf("q83_token_budget_sample")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size == 1, plan.take(600))
    // the cumulative sum must partition by the stratum — a missing
    // partitionBy would single-partition the whole corpus
    assert(plan.contains("hashpartitioning(lang"), plan.take(600))
  }

  test("zipfFit: top-V is a TakeOrderedAndProject; rank window sits above the limit") {
    val docs = etlmudah.Tables.documents(spark, sf0001)
    val plan = etlmudah.text.TextStats.zipfFit(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    // distributed per-partition top-V, merged — never a full-vocab sort
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    // the single-partition rank window consumes the <= maxRank survivors
    // (window ABOVE the limit = nearer the root = earlier in toString);
    // a window below the limit would rank the whole vocabulary on one
    // reducer — the round-4 scale bug this pins against
    assert(plan.indexOf("Window") >= 0 &&
      plan.indexOf("Window") < plan.indexOf("TakeOrderedAndProject"),
      plan.take(800))
  }

  test("cluster pair tier (q64/q66/q82) is the prefix-filtered PPJoin tier") {
    val docs = etlmudah.Tables.documents(spark, sf0001).limit(60)
    val plan = SparkEntry.clusterPairs(docs)
      .queryExecution.executedPlan.toString
    // prefix-rank signature: a row_number window (the rare-first prefix
    // rank) — the exact sum-df^2 tier has no row_number anywhere
    assert(plan.contains("row_number"), plan.take(800))
    // verify phase is the exploded count join — per-document shingle
    // arrays are never collected
    assert(!plan.contains("collect_list"), plan.take(800))
  }

  test("q159: prefix-sum cumsum rides the bucket partitioning; offset window is aggregate-bounded") {
    val df = SparkEntry.queries("q159_sequence_packing")(spark, sf0001)
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    val (unpart, part) = wins.partition(_.partitionSpec.isEmpty)
    // the per-bucket local cumsum is a PARTITIONED window (parallel)
    assert(part.nonEmpty, wins.map(_.partitionSpec.mkString(",")).mkString("\n"))
    // exactly one partition-less window — the bucket-offset prefix —
    // and it consumes the bounded (<= numBuckets rows) bucket-total
    // aggregate, never corpus rows
    assert(unpart.size == 1)
    assert(unpart.head.find {
      case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
      case _ => false
    }.isDefined, "offset window must sit above the bucket-total aggregate")
  }

  test("q158: portable centroid pick plans as TakeOrderedAndProject (no global sort)") {
    val plan = planOf("q158_ivf_assign_portable")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
  }

  test("q177/q178: PQ codebook and ADC LUT join as broadcasts; corpus never shuffles by (sub, code)") {
    // every join in the encode is a BroadcastHashJoin (the codes x dims
    // codebook and the probe LUT are the broadcast sides) — a sort-merge
    // join here would mean the exploded corpus shuffled on join keys
    val enc = planOf("q177_pq_codes")
    assert(enc.contains("BroadcastHashJoin"), enc.take(600))
    assert(!enc.contains("SortMergeJoin"), enc.take(800))
    val adc = planOf("q178_pq_adc_topk")
    assert(adc.contains("BroadcastHashJoin"), adc.take(600))
    assert(!adc.contains("SortMergeJoin"), adc.take(800))
  }

  test("q174: domain stats is one aggregate; the share window runs over the aggregated frame") {
    val wins = SparkEntry.queries("q174_domain_stats")(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
    // exactly one window (the share-of-total), and it must sit ABOVE
    // the domain aggregate — its child plan contains the HashAggregate,
    // so it only ever sees |domains| rows
    assert(wins.length == 1, s"expected 1 WindowExec, got ${wins.length}")
    assert(wins.head.child.toString.contains("HashAggregate"),
      wins.head.child.toString.take(600))
  }

  test("q169: prefix-filter suffix norms and full norms ride ONE id-partitioned window") {
    val wins = SparkEntry.queries("q169_tfidf_cosine_pairs")(spark, sf0001)
      .queryExecution.sparkPlan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
    // both window sums (inclusive suffix norm + full norm) must plan
    // into a single WindowExec PER INSTANCE — a split would mean a
    // second id-keyed exchange per side. The prefix self-join
    // duplicates the subtree (<= 2 instances pre-AQE); what matters is
    // that no instance splits its two sums across separate windows.
    assert(wins.nonEmpty && wins.length <= 2,
      s"expected 1-2 WindowExec, got ${wins.length}")
    wins.foreach(w => assert(w.windowExpression.length == 2,
      w.windowExpression.mkString(", ")))
  }

  test("stagedClusterPairs: mines once, then reads the staged parquet; pairs identical") {
    val direct = SparkEntry.clusterPairs(
        etlmudah.Tables.documents(spark, sf0001))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val staged = SparkEntry.stagedClusterPairs(spark, sf0001)
    val stagedSet = staged.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(stagedSet == direct && direct.nonEmpty)
    // warm call: the plan is a bare parquet scan of the artifact — no
    // window/join mining operators anywhere
    val warm = SparkEntry.stagedClusterPairs(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!warm.contains("WindowExec") && !warm.contains("row_number") &&
      !warm.contains("SortMergeJoin"), warm.take(500))
  }

  test("stagedPortableSigs: builds once, then reads the staged parquet; signatures intact") {
    val docs = etlmudah.Tables.documents(spark, sf0001)
    val staged = SparkEntry.stagedPortableSigs(spark, sf0001)
    assert(staged.count() == docs.count())
    assert(staged.columns.toSet == Set("id", "mins"))
    assert(staged.select(org.apache.spark.sql.functions.size(
      org.apache.spark.sql.functions.col("mins"))).head().getInt(0) == 128)
    // warm call: a bare parquet scan — no md5 projection, no aggregate
    val warm = SparkEntry.stagedPortableSigs(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!warm.contains("md5") && !warm.contains("HashAggregate"),
      warm.take(500))
  }

  /** Fresh DIRECTORY-layout copy of the sf0.001 documents table (the
    * layout the recursive staging key listing exists for), under a new
    * temp root -> a fresh staging key. Returns the corpus root dir. */
  private def freshCorpusCopy(tag: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val tmp = Files.createTempDirectory(tag).toString
    val docs = Paths.get(s"$tmp/documents.parquet")
    Files.createDirectory(docs)
    val srcLeaf = Paths.get(sf0001, "documents.parquet")
    val leaves =
      if (Files.isDirectory(srcLeaf)) {
        val st = Files.list(srcLeaf)
        try st.toArray.map(_.toString)
          .filter(p => !Paths.get(p).getFileName.toString.startsWith("_") &&
            !Paths.get(p).getFileName.toString.startsWith("."))
        finally st.close()
      } else Array(srcLeaf.toString)
    leaves.zipWithIndex.foreach { case (p, i) =>
      Files.copy(Paths.get(p), docs.resolve(f"part-$i%05d.parquet"),
        StandardCopyOption.COPY_ATTRIBUTES)
    }
    tmp
  }

  test("staging key: meta-dir junk is invisible, real leaf changes re-key, racer artifacts stay live") {
    import java.nio.file.{Files, Paths}
    val tmp = freshCorpusCopy("stagekey")
    val docs = Paths.get(s"$tmp/documents.parquet")
    val first = SparkEntry.stagedPortableSigs(spark, tmp)
    val firstFiles = first.inputFiles.toSet
    assert(firstFiles.nonEmpty)
    // junk under a `_`-prefixed ancestor (a killed write's _temporary)
    // must NOT enter the key: the warm call resolves the SAME artifact
    val junkDir = docs.resolve("_temporary").resolve("0")
    Files.createDirectories(junkDir)
    Files.write(junkDir.resolve("part-00000"), Array[Byte](1, 2, 3))
    assert(SparkEntry.stagedPortableSigs(spark, tmp).inputFiles.toSet
      == firstFiles, "meta-dir junk churned the staging key")
    // a REAL leaf change (mtime bump) must re-key and rebuild
    val st = Files.list(docs)
    val leaf = try st.toArray.map(_.toString)
      .filter(_.endsWith(".parquet")).head finally st.close()
    Files.setLastModifiedTime(Paths.get(leaf),
      java.nio.file.attribute.FileTime.fromMillis(
        Files.getLastModifiedTime(Paths.get(leaf)).toMillis + 60000))
    val rekeyed = SparkEntry.stagedPortableSigs(spark, tmp).inputFiles.toSet
    assert(rekeyed != firstFiles, "leaf mtime change did not re-key")
    // never-delete publish: the first artifact's files survive the
    // rebuild — a reader mid-scan of them cannot lose files to a racer
    firstFiles.foreach { f =>
      assert(Files.exists(Paths.get(f.stripPrefix("file:"))),
        s"live artifact file deleted by a later publish: $f")
    }
  }

  test("stagedWinnowPairs: equals the live join; warm path is a bare parquet scan") {
    val live = etlmudah.scale.Dedup.winnowSharedPairsFromFps(
        SparkEntry.stagedWinnowFps(spark, sf0001),
        minShared = 2L, maxDf = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val staged = SparkEntry.stagedWinnowPairs(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(staged == live && live.nonEmpty)
    val warm = SparkEntry.stagedWinnowPairs(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!warm.contains("SortMergeJoin") && !warm.contains("HashAggregate"),
      warm.take(500))
  }

  test("stagedWinnowFps: mines once, then reads the staged parquet; fingerprints identical") {
    val direct = etlmudah.scale.Dedup.winnowFingerprints(
        etlmudah.Tables.documents(spark, sf0001), "text", "doc_id",
        k = 3, w = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val staged = SparkEntry.stagedWinnowFps(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(staged == direct && direct.nonEmpty)
    // warm call: a bare parquet scan — no md5 projection, no winnow
    // windows anywhere
    val warm = SparkEntry.stagedWinnowFps(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!warm.contains("md5") && !warm.contains("Window"),
      warm.take(500))
  }

  test("stagedHostEdges: equals the live mine; warm path is a bare parquet scan") {
    import org.apache.spark.sql.functions._
    import etlmudah.web.Web
    val id = col("doc_id")
    val live = Web.hostLinkEdges(
        etlmudah.Tables.documents(spark, sf0001).select(
          Web.fakeUrl(id, col("source")).as("url"),
          Web.fakeHtml(id, col("text"), lit(null).cast("string"),
            Web.fakeLinkUrls(id)).as("page")),
        "url", "page")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val staged = SparkEntry.stagedHostEdges(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(staged == live && live.nonEmpty)
    // warm call: a bare parquet scan — no href extraction (regexp), no
    // page synthesis, no edge aggregate anywhere in the plan
    val warm = SparkEntry.stagedHostEdges(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!warm.contains("regexp") && !warm.contains("HashAggregate"),
      warm.take(500))
  }

  test("staging publish: concurrent writers on a fresh key both resolve a live artifact") {
    import java.nio.file.{Files, Paths}
    // fresh corpus copy -> fresh staging key, so both threads enter the
    // build+publish path simultaneously and exercise the CURRENT-pointer
    // race (never-delete attempt dirs, last-pointer-wins)
    val tmp = freshCorpusCopy("stageconc")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = (1 to 2).map(_ => Future {
      val df = SparkEntry.stagedPortableSigs(spark, tmp)
      (df.count(), df.inputFiles.toSet)
    })
    val results = Await.result(Future.sequence(runs), 10.minutes.toCoarsest)
    val counts = results.map(_._1).toSet
    assert(counts.size == 1 && counts.head > 0, counts.toString)
    // whichever attempt each writer resolved, its files must be live
    // (the never-delete guarantee) and readable
    results.foreach { case (_, files) =>
      files.foreach { f =>
        assert(Files.exists(Paths.get(f.stripPrefix("file:"))), f)
      }
    }
  }

  test("q19: aggregation reads only the needed columns") {
    val scan = scansOf("q19_doc_token_stats").head
    val fields = scan.schema.fieldNames.toSet
    assert(fields == Set("lang", "n_chars", "text"), fields.toString)
  }

  test("q207: one source-keyed exchange serves all three rank windows") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try planOf("q207_rank_ensemble")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // k score columns must NOT mean k shuffles: a single hash exchange
    // on source feeds every rank window (plus the final presentation
    // range sort) — a per-window exchange would be the k-pass failure
    val hashEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    assert(hashEx.size == 1, plan.take(900))
  }

  test("q213: both path leads ride one window over one exchange") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = try planOf("q213_event_paths")
    finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    val windows = plan.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windows.size == 1, plan.take(900))
    val hashEx = plan.linesIterator
      .filter(l => l.contains("Exchange hashpartitioning")).toSeq
    // window exchange + the aggregate exchange, nothing more
    assert(hashEx.size <= 2, plan.take(900))
  }

  test("q210: windows are probe-keyed AND group-limit pruned before the exchange") {
    val plan = planOf("q210_matryoshka_recall")
    plan.linesIterator.filter(_.contains("Window [")).foreach { l =>
      assert(l.contains("probe_id"), l)
    }
    // InferWindowGroupLimit must rewrite the rank filters into
    // Partial+Final per-group limits — each input split keeps only its
    // own top-k per probe BEFORE the exchange, so the probe-keyed sort
    // never sees a corpus-sized partition (the reason no manual salted
    // pre-rank stage exists in the operator)
    assert(plan.contains("WindowGroupLimit") &&
      plan.contains("Partial") && plan.contains("Final"), plan.take(900))
  }

  test("q225: probe-keyed windows group-limit pruned; signature scan stays bit-width") {
    val plan = planOf("q225_binary_hamming_topk")
    // both the Hamming candidate cut and the rerank top-k must prune
    // per-partition before their exchange (the q210 discipline)
    plan.linesIterator.filter(_.contains("Window [")).foreach { l =>
      assert(l.contains("probe_id"), l)
    }
    assert(plan.contains("WindowGroupLimit") &&
      plan.contains("Partial") && plan.contains("Final"), plan.take(900))
    // the Hamming scan must run on the packed signature table, never
    // refetch float vectors: no cosine call below the candidate window
    val preCand = plan.substring(plan.indexOf("WindowGroupLimit"))
    assert(preCand.contains("bit_count"), plan.take(900))
  }
}
