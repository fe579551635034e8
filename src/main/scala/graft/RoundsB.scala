package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import etlmudah.Tables
import etlmudah.analytics.{Analytics, Density, Events}
import etlmudah.text.TextStats
import etlmudah.multimodal.Multimodal
import etlmudah.scale.{Dedup, Sampling, Similarity, Sketches, Spectral}
import etlmudah.web.Web
import etlmudah.load.Upsert
import etlmudah.joins.Joins
import SparkEntry._

/** Registry tier q231-q300 (rounds 9-10) — carved out of SparkEntry.scala behind the per-round
  * registry seam (the Round11 convention): `SparkEntry.queries` /
  * `oracleSql` concatenate this object's maps. Entries are MOVED
  * VERBATIM — no behavior change; helper vals/defs stay on
  * [[SparkEntry]] (package-private) and arrive via the wildcard
  * import. */
object RoundsB {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // COUNT-MIN SKETCH heavy hitters (Cormode-Muthukrishnan): a
    // mergeable fixed-memory frequency grid (TypedImperativeAggregate
    // graft_cms — one 4x32 grid per partition over the exchange, never
    // the keys) probed for the exact top-15 (mktsegment, nation) pairs.
    // The bucket hash is the portable md5-lane discipline, so the
    // oracle replays EVERY counter and estimate exactly: n_est >=
    // n_exact always, and at width 32 over ~125 keys collisions are
    // certain — nonzero overcounts are part of the checked result
    "q231_cms_heavy_hitters" -> ((s, dir) => {
      val keyed = Tables.customer(s, dir).select(
        concat(col("c_mktsegment"), lit("#"),
          col("c_nationkey").cast("string")).as("seg"))
      etlmudah.scale.Sketches.cmsHeavyHitters(
        keyed, "seg", depth = 4, width = 32, topN = 15)
    }),


    // EXACT-INTEGER distributed PCA, part 1: the top principal
    // component of the embedding corpus — one graft_gram pass (33 KB
    // buffer per partition over the exchange, vector rows never
    // shuffle), exact integer centering, then a 3-step lattice power
    // iteration on the driver over the provably bounded d^2 collect.
    // The oracle replays the ENTIRE chain — quantize, Gram, center,
    // rescale, iterate — as an unrolled CTE, integers end to end (the
    // PageRank/LR-trainer discipline applied to spectra)
    "q232_pca_top_component" -> ((s, dir) =>
      etlmudah.scale.Spectral.pcaTopComponent(
        Tables.embeddings(s, dir), "embedding", dims = 64)),


    // part 2: every vector's exact lattice projection onto that
    // component, top-10 by |projection| — the component rides the plan
    // as a literal array (zero joins; pure codegen'd expression work
    // over one scan)
    "q233_pca_projection_topk" -> ((s, dir) =>
      etlmudah.scale.Spectral.pcaProjectionTopK(
        Tables.embeddings(s, dir), "vec_id", "embedding", dims = 64)),


    // Declarative VALIDATION suite over a deliberately perturbed
    // orders frame (the maimed-blob discipline: failures are planted
    // closed-form in o_orderkey, so the oracle replays the exact
    // perturbation AND the report). Six rules across all three tiers:
    // four row rules in ONE scan (two fail, two pass), one uniqueness
    // rule (a duplicated key slice), one FK rule (a shifted custkey
    // slice). Witnesses are minimal-as-string — deterministic on both
    // engines
    "q234_validation_report" -> ((s, dir) => {
      import etlmudah.quality.Validate
      import etlmudah.quality.Validate.{FkRule, RowRule, UniqueRule}
      val k = col("o_orderkey")
      val maimed = Tables.orders(s, dir)
        .withColumn("o_totalprice", when(k % 97 === 0, -col("o_totalprice"))
          .otherwise(col("o_totalprice")))
        .withColumn("o_orderpriority", when(k % 101 === 0, lit("9-BOGUS"))
          .otherwise(col("o_orderpriority")))
        .withColumn("o_custkey", when(k % 499 === 0,
          col("o_custkey") + 1000000L).otherwise(col("o_custkey")))
      val withDups = maimed.union(maimed.where(k % 1000 === 0))
      Validate.report(withDups, "o_orderkey",
        rowRules = Seq(
          RowRule("price_positive", col("o_totalprice") > 0),
          RowRule("priority_known", col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")),
          RowRule("status_known", col("o_orderstatus").isin("P", "O", "F")),
          RowRule("date_in_range", col("o_orderdate").between(
            to_timestamp(lit("1992-01-01")), to_timestamp(lit("2001-12-31"))))),
        uniqueRules = Seq(UniqueRule("orderkey_unique", Seq("o_orderkey"))),
        fkRules = Seq(FkRule("custkey_covered", "o_custkey",
          Tables.customer(s, dir), "c_custkey")))
    }),


    // S9++ — Z-ORDER (Morton) clustered layout round-trip: write
    // orders z-ordered on (o_totalprice, o_custkey) — ONE range
    // exchange on the interleaved z-value — read back a slice
    // predicated on BOTH columns (each prunes files independently;
    // the multi-column pruning itself is pinned in WritersSpec),
    // aggregate. The oracle sees only values: layout must never
    // change results
    "q235_zorder_roundtrip" -> ((s, dir) => {
      val out = s"/tmp/graft_sink_q235_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
      etlmudah.sinks.Writers.writeZOrdered(
        Tables.orders(s, dir), out,
        Seq("o_totalprice", "o_custkey"), files = 16)
      s.read.parquet(out)
        .filter(col("o_totalprice").between(50000, 150000) &&
          col("o_custkey") < 500)
        .agg(
          count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
    }),


    // PORTABLE HyperLogLog distinct-count sketch (Flajolet et al.
    // 2007), the distinct twin of q231's CMS and the oracle-checked
    // counterpart of q54's engine-private approx_count_distinct:
    // registers ride the md5-lane discipline with an exact integer
    // bit-length ladder (no log anywhere), the register sum is held
    // on a power-of-two lattice, and even the raw estimate is a
    // deterministic double both engines compute identically. COMPOSED
    // from built-ins — one map-side-combined groupBy MAX, no custom
    // aggregate needed. n_true joins on as a single broadcast row
    "q236_hll_distinct_sketch" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val rep = etlmudah.scale.Sketches.hllReport(orders, "o_custkey", b = 6)
      val truth = orders.agg(
        count_distinct(col("o_custkey")).as("n_true"))
      rep.crossJoin(broadcast(truth))
    }),


    // POISSON-BOOTSTRAP confidence interval (Chamandy et al. 2012) for
    // mean(o_totalprice): 200 replicates of the Poisson(1)-weighted
    // mean — weights invert the exact integer CDF thresholds against
    // the (id, rep) md5 lane, values fold as DECIMAL, the percentile
    // is nearest-rank over the 200-row replicate frame. Resampling at
    // corpus scale as ONE map-side-combined aggregate; every weight,
    // mean, and rank replays in SQL
    "q237_bootstrap_mean_ci" -> ((s, dir) =>
      etlmudah.scale.Sampling.bootstrapMeanCi(
        Tables.orders(s, dir), "o_orderkey", "o_totalprice", reps = 200)),


    // UNIGRAM-LATTICE Viterbi tokenizer (Kudo 2018 — the SentencePiece
    // family, the second tokenizer family next to BPE): texts are
    // PLANTED as closed-form concatenations of vocabulary pieces (plus
    // an off-vocab '!' every fifth doc), with super-additive weights
    // and boundary-unambiguous pieces making the planted segmentation
    // uniquely optimal — so the oracle carries the KNOWN pieces (the
    // fakeLinkUrls discipline) while ViterbiProps separately proves the
    // DP optimal against brute-force enumeration on random inputs
    "q238_viterbi_segmentation" -> ((s, dir) => {
      val ps = array(lit("foo"), lit("bar"), lit("qux"), lit("zz"))
      val id = col("doc_id")
      val text = concat(
        element_at(ps, (id % 4 + 1).cast("int")),
        element_at(ps, ((id * 2 + 1) % 4 + 1).cast("int")),
        when(id % 5 === 0, lit("!")).otherwise(lit("")),
        element_at(ps, ((id + 3) % 4 + 1).cast("int")))
      val vocab = Seq("foo" -> 9000L, "bar" -> 9000L,
        "qux" -> 9000L, "zz" -> 4000L)
      Tables.documents(s, dir)
        .select(explode(
          etlmudah.text.TextStats.viterbiSegment(text, vocab)).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("token"))
    }),


    // EXACT closed-form OLS: price ~ quantity over lineitem. The five
    // moment sums fold as DECIMAL(38,0) on integer-cent lattices (no
    // float addition anywhere, order-independent at any n); slope /
    // intercept / r2 are single double divisions of exact decimals,
    // operand order mirrored in the oracle (HUGEINT there — the same
    // exact integers), so even the doubles hash-match
    "q239_linear_fit" -> ((s, dir) =>
      etlmudah.analytics.Analytics.linearFit(
        Tables.lineitem(s, dir), "l_quantity", "l_extendedprice")),


    // HLL UNION ALGEBRA: per-priority distinct-customer sketches plus
    // their max-merge (grp = '__all__') — the merge of per-group
    // sketches IS the sketch of the union, exactly; customers overlap
    // across priorities, so the merged estimate sits well below the
    // per-group sum (the union, not the total). One register pass
    // feeds both tiers; every register and estimate replays in SQL
    "q240_hll_union" -> ((s, dir) =>
      etlmudah.scale.Sketches.hllUnionReport(
        Tables.orders(s, dir), "o_custkey", "o_orderpriority", b = 6)),


    // PERSONALIZED (topic-sensitive) host rank — Haveliwala 2002 over
    // the staged host link graph: all teleport mass pinned to the
    // '.com' seed hosts, so rank measures PROXIMITY TO THE TRUSTED SET
    // (the seed-expansion prior of curated crawls), not global
    // centrality. Same integer lattice, same warm staged-edge path as
    // q223; the oracle replays the full 3-round seeded chain unrolled
    "q241_personalized_host_rank" -> ((s, dir) => {
      import etlmudah.web.Web
import etlmudah.load.Upsert
import etlmudah.joins.Joins
      val edges = stagedHostEdges(s, dir)
      val seeds = edges.select(col("src_host").as("host"))
        .union(edges.select(col("dst_host").as("host"))).distinct()
        .where(col("host").endsWith(".com"))
      Web.hostRankSeeded(edges, seeds, iters = 3)
    }),


    // DELETE-ONE-GROUP JACKKNIFE standard error of mean(o_totalprice)
    // over the priority groups — the bootstrap's (q237) resampling-free
    // sibling for naturally sharded data: leave-one-group-out means
    // need only the |G| per-group sums (one aggregate), variance rides
    // the exact integer identity G*sum(t^2)-(sum t)^2 on a re-quantized
    // micro-lattice, and the single sqrt runs on an exact operand —
    // every number including the se hash-matches
    "q242_jackknife_se" -> ((s, dir) =>
      etlmudah.analytics.Analytics.jackknifeMeanByGroup(
        Tables.orders(s, dir), "o_totalprice", "o_orderpriority")),


    // BENFORD first-digit audit of o_totalprice — the classic
    // fabricated-data screen: observed first-significant-digit shares
    // against the fixed log10(1 + 1/d) expectation (6dp literals — no
    // log function crosses an engine boundary) with per-digit
    // chi-square terms, all on the 9-row aggregated frame
    "q243_benford_digits" -> ((s, dir) =>
      etlmudah.analytics.Analytics.benfordReport(
        Tables.orders(s, dir), "o_totalprice")),


    // q239's exact OLS PER GROUP: one trend line per l_returnflag —
    // the same decimal moment fold, map-side combined per group, one
    // exchange of |groups| moment rows
    "q244_linear_fit_by_flag" -> ((s, dir) =>
      etlmudah.analytics.Analytics.linearFitBy(
        Tables.lineitem(s, dir), "l_quantity", "l_extendedprice",
        Seq("l_returnflag"))),


    // HLL OVERLAP via inclusion-exclusion: how many customers the
    // URGENT and LOW priority tiers SHARE, estimated from three
    // sketches (A, B, and their exact max-merge union) without
    // co-shuffling keys; the exact intersection rides alongside as the
    // audit tier. Every register and every estimate replays in SQL
    "q245_hll_overlap" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      etlmudah.scale.Sketches.hllOverlapReport(
        orders.where(col("o_orderpriority") === "1-URGENT"),
        orders.where(col("o_orderpriority") === "5-LOW"),
        "o_custkey", b = 6)
    }),


    // EXACT 2-D skyline of the part catalog (maximize p_size, minimize
    // p_retailprice): the undominated price-performance frontier. The
    // engine runs the distributed bucket-sweep (grid exchange + two
    // RANGE-frame windows + a |buckets|-row broadcast summary); the
    // oracle runs the quadratic NOT-EXISTS definition — same set by
    // the dominance algebra, wildly different plans
    "q246_skyline_parts" -> ((s, dir) =>
      etlmudah.analytics.Analytics.skyline2d(
        Tables.part(s, dir)
          .select(col("p_partkey"), col("p_size"), col("p_retailprice")),
        "p_size", "p_retailprice")
        .select(col("p_partkey"), col("p_size"),
          round(col("p_retailprice"), 2).as("price_2"))
        .orderBy(col("p_size"), col("price_2"), col("p_partkey"))),


    // gaps-and-islands: each customer's distinct active order-months
    // collapse into maximal consecutive runs; output is the
    // streak-length distribution (the retention-continuity readout)
    "q247_order_streaks" -> ((s, dir) =>
      etlmudah.analytics.Analytics.activityIslands(
        Tables.orders(s, dir), "o_custkey", "o_orderdate")),


    // k-anonymity / l-diversity audit of the customer export: QI =
    // (nation, segment), sensitive = the in-debt flag; one row per
    // equivalence-class size with the worst sensitive diversity
    "q248_k_anonymity" -> ((s, dir) =>
      etlmudah.quality.Privacy.kAnonymityReport(
        Tables.customer(s, dir).withColumn("in_debt",
          (col("c_acctbal") < 0).cast("int")),
        Seq("c_nationkey", "c_mktsegment"), "in_debt")),


    // Welch two-sample t-test: does mean order value differ between
    // URGENT and LOW priority? Lattice-exact moments, one pass
    "q249_welch_ttest" -> ((s, dir) =>
      etlmudah.analytics.Analytics.welchTTest(Tables.orders(s, dir),
        "o_totalprice", "o_orderpriority", "1-URGENT", "5-LOW")),


    // pairwise association rules over order baskets: support /
    // directed confidences / lift from DISTINCT-basket counts, top 20
    // by lift — the co-purchase graph's complements/substitutes readout
    "q250_association_rules" -> ((s, dir) =>
      etlmudah.graph.Centrality.associationRules(
        Tables.lineitem(s, dir), "l_orderkey", "l_partkey",
        minSupport = 3L, k = 20)),


    // chi-square term-label feature selection: terms most associated
    // with lang='en' by the 2x2 presence chi-square over doc counts
    "q251_chi2_terms" -> ((s, dir) =>
      TextStats.chiSquareTerms(Tables.documents(s, dir), "text", "doc_id",
        col("lang") === "en", minDf = 5L, k = 25)),


    // NFC normalization audit per source over deterministically
    // damaged text (every doc gets the same 3-composition suffix):
    // graft_nfc vs DuckDB's nfc_normalize, doc-change counts and
    // codepoint-length deltas must agree exactly
    "q252_nfc_audit" -> ((s, dir) =>
      TextStats.nfcAudit(
        Tables.documents(s, dir)
          .where(col("text").isNotNull)
          .withColumn("text", concat(col("text"), lit(nfcSuffix))),
        "text", "source")),


    // Theil-Sen robust slope + Mann-Kendall S per priority over the
    // monthly revenue series (exact-cent lattice): the spike-tolerant
    // twin of q244's OLS
    "q253_theil_sen_trend" -> ((s, dir) =>
      etlmudah.analytics.Analytics.theilSenBy(
        monthlyCents(s, dir), "m", "cents", Seq("o_orderpriority"),
        maxN = 500)),


    // exact two-sample Kolmogorov-Smirnov D between the URGENT and LOW
    // order-value distributions, on a whole-dollar lattice — integer
    // numerator max, one closing division
    "q254_ks_two_sample" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      etlmudah.analytics.Analytics.ksTest(
        orders.where(col("o_orderpriority") === "1-URGENT"),
        orders.where(col("o_orderpriority") === "5-LOW"),
        "o_totalprice", latticeScale = 1)
    }),


    // Pearson chi-square independence test: is order priority
    // associated with order status? Exact-rational cell terms summed
    // as 6dp DECIMAL (order-independent), plus Cramer's V
    "q255_chi2_independence" -> ((s, dir) =>
      etlmudah.analytics.Analytics.chiSquareIndependence(
        Tables.orders(s, dir), "o_orderpriority", "o_orderstatus")),


    // CUSUM changepoint screen per priority over the same monthly
    // revenue series as q253: where does the level shift?
    "q256_cusum_changepoint" -> ((s, dir) =>
      etlmudah.analytics.Analytics.cusumChangepoint(
        monthlyCents(s, dir), "m", "cents", Seq("o_orderpriority"))),


    // BM25 retrieval serving tier: "more like doc 0" lexically — doc
    // 0's distinct tokens as the query, top-15 docs by decimal-summed
    // per-term scores; the query doc stays in the corpus statistics
    // but not the results
    "q257_bm25_search" -> ((s, dir) =>
      TextStats.bm25Search(Tables.documents(s, dir), "text", "doc_id",
        doc0Terms(s, dir), k = 15, excludeId = Some(0L))),


    // REAL audio features: zero-crossing count + silence segmentation
    // over decoded PCM samples (the VAD/trim preprocessing pair) —
    // every count replayed from the synth closed form via lag/islands
    "q265_wav_features" -> ((s, dir) =>
      Tables.documents(s, dir)
        .where(col("doc_id") % 7 === 3)
        .select(col("doc_id"), expr(
          "graft_wav_features(graft_fake_wav16(doc_id, 1L, 8000L, " +
            "doc_id % 50 + 10), 8000)").as("f"))
        .select(col("doc_id"), col("f.n_samples"), col("f.n_zero_cross"),
          col("f.n_silent"), col("f.n_silence_runs"),
          col("f.max_silence_run"))
        .orderBy(col("doc_id"))),


    // TPC-H Q2 shape (min-cost supplier per part): the correlated MIN
    // subquery decorrelated into a per-part aggregate joined back on
    // equality — ties kept, never a per-row subquery. The per-part min
    // is map-side combinable (one exchange on p_partkey); unit price
    // stays the RAW IEEE quotient — bit-identical on both engines,
    // where a 4dp display rounding diverges (Spark rounds the exact
    // decimal expansion HALF_UP, DuckDB nearbyints the scaled double —
    // measured one-ulp disagreement at sf0.001)
    "q266_min_unit_price_supplier" -> ((s, dir) => {
      val offers = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
        .join(Tables.part(s, dir)
            .filter(col("p_size").between(10, 15) &&
              col("p_type") === "STANDARD"),
          col("l_partkey") === col("p_partkey"))
      val minOffer = offers.groupBy(col("p_partkey").as("mp"))
        .agg(min(col("unit_price")).as("min_price"))
      // the min side is |filtered parts|-bounded — broadcast it so the
      // offers frame is never exchanged for the join-back (without the
      // hint Catalyst sort-merges on (partkey, price) at local stats)
      offers
        .join(broadcast(minOffer), col("p_partkey") === col("mp") &&
          col("unit_price") === col("min_price"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .select(col("p_partkey"), col("p_name"), col("min_price"),
          col("s_name"), col("n_name"), col("s_acctbal"))
        .distinct()
        .orderBy(col("s_acctbal").desc, col("p_partkey").asc,
          col("s_name").asc)
        .limit(100)
    }),


    // TPC-H Q7 shape (volume shipping between two nations): the
    // dual-role nation dim joined once per side under two aliases,
    // direction kept as (supp_nation, cust_nation) group keys; the
    // ship-date range pushes to the lineitem scan as literals
    "q267_nation_trade_flows" -> ((s, dir) => {
      val n1 = Tables.nation(s, dir).select(
        col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir).select(
        col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("s_nationkey") === col("sn_key"))
        .join(n2, col("c_nationkey") === col("cn_key"))
        .filter((col("supp_nation") === "NATION_3" &&
            col("cust_nation") === "NATION_7") ||
          (col("supp_nation") === "NATION_7" &&
            col("cust_nation") === "NATION_3"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(round(sum((col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),


    // TPC-H Q9 shape (product-line profit by nation and year): name-
    // filtered parts x their lineitems x supplier nation; profit =
    // discounted revenue minus a retail-price-proportional cost, both
    // terms on the DECIMAL(18,4) lattice so the sum is order-
    // independent across any partitioning
    "q268_profit_by_nation_year" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_name").contains("widget")),
          col("l_partkey") === col("p_partkey"))
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(round(sum((col("l_extendedprice") *
              (lit(1.0) - col("l_discount"))).cast("decimal(18,4)") -
            (col("l_quantity") * col("p_retailprice") * lit(0.1))
              .cast("decimal(18,4)")), 2)
            .cast("double").as("profit"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"), col("o_year").desc)),


    // TPC-H Q13 shape (customer order-count distribution): LEFT join
    // so order-less customers survive as count 0 — the zero bucket is
    // the point of the query; one exchange per aggregate grain
    "q269_order_count_distribution" -> ((s, dir) =>
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir)
            .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)),


    // TPC-H Q15 shape (top supplier by quarter revenue): the revenue
    // view reduces first, the global max is ONE broadcast row, and the
    // winner(s) come back by equality on the rounded double — ties
    // kept, no window over the full frame
    "q270_top_supplier_revenue" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(round(sum((col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")), 2)
          .cast("double").as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.join(broadcast(mx), col("total_revenue") === col("mx"))
        .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),


    // TPC-H Q17 shape (small-quantity revenue): the per-part AVG
    // correlated subquery decorrelated into one aggregate joined back
    // with the 20% threshold in the join condition; single-row answer
    "q271_small_quantity_revenue" -> ((s, dir) => {
      val joined = Tables.lineitem(s, dir)
        .join(Tables.part(s, dir).filter(col("p_brand") === "Brand#12"),
          col("l_partkey") === col("p_partkey"))
      val avgq = joined.groupBy(col("p_partkey").as("ap"))
        .agg(avg(col("l_quantity")).as("avg_qty"))
      joined.join(avgq, col("p_partkey") === col("ap") &&
          col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(sum(col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double") / lit(7.0), 2).as("avg_yearly"),
          count(lit(1)).as("n_items"))
    }),


    // TPC-H Q18 shape (large-volume orders): HAVING sum(qty) > T
    // reduces lineitem to the rare big orders FIRST, then the small
    // survivor set joins back to orders and customer
    "q272_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("bk"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 200)
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
        .join(big, col("o_orderkey") === col("bk"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey").asc)
        .limit(20)
    }),


    // TPC-H Q21 shape (sole returner): suppliers whose line in a
    // multi-supplier order was the ONLY returned one — EXISTS becomes
    // left_semi, NOT EXISTS becomes left_anti, both on the order key
    // with the supplier inequality as residual; never a row subquery
    "q273_sole_returner" -> ((s, dir) => {
      val l1 = Tables.lineitem(s, dir).select(col("l_orderkey").as("ok"),
        col("l_suppkey").as("sk"), col("l_returnflag").as("rf"))
      val cand = l1.filter(col("rf") === "R")
      val withOther = cand.join(
        l1.select(col("ok").as("ok2"), col("sk").as("sk2")),
        col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      val sole = withOther.join(
        cand.select(col("ok").as("ok3"), col("sk").as("sk3")),
        col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
      sole.join(Tables.supplier(s, dir), col("sk") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(countDistinct(col("ok")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey").asc)
        .limit(20)
    }),


    // TPC-H Q22 shape (dormant rich customers): global scalar (sum +
    // count of positive balances) broadcast as ONE row, anti join
    // against the recent-order keys, per-nation rollup of who's left.
    // The above-average cut is the cross-multiplied EXACT comparison
    // bal*n > sum on the DECIMAL(18,2) lattice — never a float
    // average, whose partition-order-dependent fold could flip a
    // borderline customer in the last ulp across SFs/partitionings
    "q274_dormant_rich_customers" -> ((s, dir) => {
      val avgBal = Tables.customer(s, dir)
        .filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast("decimal(18,2)")).as("sb"),
          count(lit(1)).as("nb"))
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      Tables.customer(s, dir)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal").cast("decimal(18,2)") * col("nb") >
          col("sb"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          round(sum(col("c_acctbal").cast("decimal(18,2)")), 2)
            .cast("double").as("totacctbal"))
        .orderBy(col("n_name"))
    }),


    // TPC-H Q11 shape (important stock): per-part revenue vs a global
    // threshold — parts above 1.5x the MEAN part revenue (relative to
    // the part-count grain, so the cut is scale-stable at any SF,
    // unlike TPC-H's 0.0001/SF literal). The comparison is
    // val*np*2 > tot*3 on the EXACT decimal lattice (no decimal
    // division anywhere, so there is no rounding convention to align)
    "q275_revenue_share_parts" -> ((s, dir) => {
      val perPart = Tables.lineitem(s, dir)
        .groupBy(col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).as("val"))
      val tot = perPart.agg(sum(col("val")).as("tv"),
        count(lit(1)).as("np"))
      perPart.crossJoin(broadcast(tot))
        .filter(col("val") * col("np") * 2 > col("tv") * 3)
        .select(col("l_partkey"),
          round(col("val"), 2).cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey").asc)
    }),


    // THE CURATION FUNNEL as one declarative plan (the capstone
    // composition): length gate -> exact dedup -> blocklist ->
    // per-source cap, each stage reported with survivors and token
    // mass. q92's filterFunnel is the ONE-PASS version for predicate
    // rules; this funnel includes non-predicate stages (dedup's keyed
    // window, the cap's stratum window) that genuinely need their own
    // exchanges — per-stage counts re-derive each frame, the honest
    // cost of auditing a staged pipeline
    "q300_curation_funnel" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val s1 = docs.filter(
        TextStats.tokenCount(col("text")).between(30, 100000))
      val s2 = Dedup.exactDedup(s1, "text", "doc_id")
      val s3 = s2.filter(
        regexp_count(col("text"), lit("(?i)\\bslow\\b")) <= 2)
      val s4 = Sampling.capPerStratum(s3, "doc_id", "source",
        cap = 50, salt = "funnel")
      def st(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_rows"),
            sum(TextStats.tokenCount(col("text"))).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_rows"), col("n_tokens"))
      st("0_all", docs)
        .unionByName(st("1_length", s1))
        .unionByName(st("2_dedup", s2))
        .unionByName(st("3_blocklist", s3))
        .unionByName(st("4_cap", s4))
        .orderBy(col("stage"))
    }),


    // PORTABLE approximate quantiles (the oracle-checkable twin of
    // percentile_approx, whose internal sketch no other engine
    // replays): fixed-width value lattice + integer-threshold rank
    // picks — error bounded by the width, every estimate exact
    // integer arithmetic. q52/q79's approx dial, made verifiable
    "q299_lattice_quantiles" -> ((s, dir) =>
      etlmudah.scale.Sketches.latticeQuantiles(
        Tables.lineitem(s, dir), "l_returnflag",
        col("l_extendedprice"), width = 1000.0,
        qsPerMille = Seq(250, 500, 750, 990))),


    // NULL REPAIR by group median (the imputation step of every
    // feature pipeline, audited): prices nulled on a closed-form key
    // slice, refilled with the exact per-priority median, the report
    // carrying n_imputed and the post-repair sum so silent imputation
    // drift is impossible. Median ↔ quantile_cont (the established
    // percentile parity); the filled column sums on a DECIMAL(18,4)
    // lattice (medians of 2dp values carry ≤3dp — the 4th-digit cast
    // never sits on a rounding boundary)
    "q297_impute_nulls" -> ((s, dir) => {
      val damaged = Tables.orders(s, dir)
        .withColumn("price",
          when(col("o_orderkey") % 13 === 0, lit(null).cast("double"))
            .otherwise(col("o_totalprice")))
      val med = damaged.groupBy(col("o_orderpriority").as("mk"))
        .agg(percentile(col("price"), lit(0.5)).as("med"))
      damaged.join(broadcast(med), col("o_orderpriority") === col("mk"))
        .withColumn("filled", coalesce(col("price"), col("med")))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("price").isNull, 1L).otherwise(0L))
            .as("n_imputed"),
          round(min(col("med")), 4).as("median_used"),
          round(sum(col("filled").cast("decimal(18,4)")), 2)
            .cast("double").as("sum_filled"))
        .orderBy(col("o_orderpriority"))
    }),


    // Z-SCORE scaler audit (the feature-standardization fit): per-
    // group mean/std from DECIMAL-lattice moments (sum, sum-of-
    // squares exact; mean, variance, sqrt are closing IEEE ops both
    // engines compute identically from the same integers) + the
    // |z| > 3 outlier count from a second broadcast-moments pass
    "q298_zscore_audit" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,4)").as("__x"))
      val mom = li.groupBy(col("l_returnflag").as("mk"))
        .agg(count(lit(1)).as("n"), sum(col("__x")).as("__s"),
          sum(col("__x") * col("__x")).as("__q"))
        .select(col("mk"), col("n"),
          (col("__s").cast("double") / col("n")).as("__mean"),
          sqrt(col("__q").cast("double") / col("n") -
            (col("__s").cast("double") / col("n")) *
              (col("__s").cast("double") / col("n"))).as("__std"))
      li.join(broadcast(mom), col("l_returnflag") === col("mk"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(min(col("__mean")), 6).as("mean"),
          round(min(col("__std")), 6).as("std"),
          sum(when(abs(col("__x").cast("double") - col("__mean")) >
            lit(3.0) * col("__std"), 1L).otherwise(0L)).as("n_outliers"))
        .orderBy(col("l_returnflag"))
    }),


    // Exact MODE per return flag (most frequent quantity, ties to the
    // smallest value): two stacked aggregates, never a window
    "q293_mode_quantity" -> ((s, dir) =>
      Analytics.modeBy(Tables.lineitem(s, dir), "l_returnflag",
        col("l_quantity"))),


    // Smoothed TARGET ENCODING (Micci-Barreca): priority categories
    // encoded by shrunken mean order value — DECIMAL-lattice sums,
    // single closing double divisions, one global broadcast row
    "q294_target_encoding" -> ((s, dir) =>
      Analytics.targetEncodeBy(Tables.orders(s, dir), "o_orderpriority",
        col("o_totalprice"), m = 10.0)),


    // 2-D histogram grid (the dashboard heatmap): quantity x price
    // bins by integral floor division, one aggregate — the 2-D twin
    // of q07's 1-D histogram
    "q295_qty_price_heatmap" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(expr("cast(floor((l_quantity - 1) / 5.0) as long)")
            .as("q_bin"),
          expr("cast(floor(l_extendedprice / 10000.0) as long)")
            .as("p_bin"))
        .agg(count(lit(1)).as("n"),
          round(sum((col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")), 2)
            .cast("double").as("revenue"))
        .orderBy(col("q_bin"), col("p_bin"))),


    // Explicit GROUPING SETS (the grain mix rollup/cube cannot give:
    // (priority, status), (priority), (status) — no grand total), with
    // grouping_id disambiguating NULL-as-rolled-up from NULL data
    "q296_grouping_sets" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupingSets(
          Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
            Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double").as("total"))
        .orderBy(col("gid"), col("o_orderpriority").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)),


    // N-way membership matrix (the Venn/UpSet table): per user, WHICH
    // event types they touched, rolled up per exact combination — the
    // cross-source overlap readout q133's pairwise matrix cannot give
    // (combinations, not pairs). One user-keyed aggregate + one
    // |combinations|-grain aggregate; the combo key is the sorted
    // member list, so both engines render it identically
    // (the %17 slice keeps per-user coverage PARTIAL — over the full
    // log every user hits all five types and the table degenerates to
    // one row)
    "q291_event_type_venn" -> ((s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") % 17 === 0)
        .groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("event_type"))).as("__types"))
        .groupBy(array_join(col("__types"), "+").as("combo"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("n_users").desc, col("combo").asc)),


    // MULTI-TOUCH attribution credit: each purchase splits one unit of
    // credit equally across the SAME user's clicks in the hour before
    // it (the fractional-credit sibling of q68's last-touch as-of) —
    // per-pair credit rounds at 6dp IN-ENGINE so both engines fold the
    // identical doubles; users ranked by credit earned
    "q292_multi_touch_credit" -> ((s, dir) => {
      val ev = Tables.eventsTyped(s, dir)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("us").as("c_us"),
          col("event_id").as("c_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("us").as("p_us"),
          col("event_id").as("p_id"))
      val pairs = clicks.join(purchases,
        col("c_user") === col("p_user") &&
          col("c_us") <= col("p_us") &&
          col("c_us") >= col("p_us") - 3600000000L)
      val perPurchase = pairs.groupBy(col("p_id").as("pp"))
        .agg(count(lit(1)).as("n_touch"))
      // per-pair credit on the micro-unit INTEGER lattice (1e6 div
      // n_touch — truncating, exact): the per-user sum is a BIGINT
      // fold no addition order can drift, where summing rounded
      // doubles is one ulp from a 6dp boundary flip
      pairs.join(perPurchase, col("p_id") === col("pp"))
        .select(col("c_user"), col("c_id"),
          expr("1000000L div n_touch").as("credit_micro"))
        .groupBy(col("c_user"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("credit_micro")).as("credit_micro"))
        .orderBy(col("credit_micro").desc, col("c_user").asc)
    }),


    // Ordered string aggregation (string_agg ORDER BY, Spark's missing
    // built-in, made deterministic): each customer's order history as
    // a date-ordered key list — collect_list sorts INSIDE the row, so
    // no shuffle or AQE re-plan can reorder it
    "q290_order_history_concat" -> ((s, dir) =>
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          Analytics.orderedConcat(col("o_orderkey"),
            Seq(unix_micros(col("o_orderdate").cast("timestamp")),
              col("o_orderkey")),
            ",").as("history"))
        .orderBy(col("o_custkey"))),


    // Accent-fold dedup keys: each doc spawns a composed (U+00E9) and
    // a decomposed (e + U+0301) accented variant — two DISTINCT raw
    // strings that graft_fold_accents collapses to one key (the
    // diacritic-insensitive matching tier next to q252's NFC); the
    // report counts raw vs folded variants per source, exhibiting the
    // 2:1 collapse wherever the text carries an 'e'
    "q289_accent_fold_keys" -> ((s, dir) => {
      val vs = Tables.documents(s, dir).select(col("source"),
          col("doc_id"), explode(array(
            replace(col("text"), lit("e"), lit("é")),
            replace(col("text"), lit("e"), lit("é")))).as("t"))
        .select(col("source"), col("doc_id"), col("t"),
          expr("graft_fold_accents(t)").as("f"))
      vs.groupBy(col("source"), col("doc_id"))
        .agg(countDistinct(col("t")).as("ndr"),
          countDistinct(col("f")).as("ndf"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("ndr")).as("raw_variants"),
          sum(col("ndf")).as("folded_variants"))
        .orderBy(col("source"))
    }),


    // Trimmed mean per priority — the whale-proof average between
    // q02's plain mean and q103's median/MAD fence: exact 5%/95%
    // percentile band per group, average of what remains
    "q288_trimmed_mean" -> ((s, dir) =>
      Analytics.trimmedMeanBy(Tables.orders(s, dir), "o_orderpriority",
        col("o_totalprice"))),


    // Time-grid RESAMPLE + forward fill: per event type, a dense
    // 6-hour bucket grid over the type's observed span, empty buckets
    // carrying the most recent earlier observation, imputation flagged
    // — the gap-filling step before any time-series window math
    "q287_resample_fill" -> ((s, dir) =>
      etlmudah.analytics.Events.resampleFill(
        Tables.eventsTyped(s, dir), "event_type", col("ts"),
        col("value"), stepUs = 21600000000L)),


    // ANTI-ENTROPY replica verification: two order snapshots compare
    // by 64 checksum rows each (count + bit_xor + mod-prime sum of a
    // portable row hash per bucket), never by co-shuffling rows — the
    // Merkle tier of replica repair. The damaged copy (+1.00 on a
    // sparse key slice) surfaces as exactly the buckets its rows left
    // and entered; price rides DECIMAL(18,2) so both engines render
    // the identical string into the hash
    "q286_replica_checksum_diff" -> ((s, dir) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority")
      val a = Tables.orders(s, dir)
        .withColumn("o_totalprice",
          col("o_totalprice").cast("decimal(18,2)"))
        .select(cols.map(col): _*)
      val b = a.withColumn("o_totalprice",
        when(col("o_orderkey") % 997 === 0,
          (col("o_totalprice") + 1).cast("decimal(18,2)"))
          .otherwise(col("o_totalprice")))
      etlmudah.quality.Validate.checksumDiff(a, b, cols, nBuckets = 64)
    }),


    // Unicode SCRIPT profile over a deterministically multilingualized
    // corpus (the q252 damage discipline: closed-form Cyrillic/CJK/
    // digit-only variants both engines synthesize identically) — the
    // writing-system router a multilingual pipeline splits on first
    "q285_script_profile" -> ((s, dir) =>
      TextStats.scriptProfile(
        Tables.documents(s, dir).select(col("source"),
          when(col("doc_id") % 7 === 0,
            repeat(lit("ж"), (col("doc_id") % 5 + 1).cast("int")))
          .when(col("doc_id") % 7 === 1,
            repeat(lit("中"), (col("doc_id") % 4 + 1).cast("int")))
          .when(col("doc_id") % 7 === 2, lit("12345 !?"))
          .otherwise(concat(col("text"),
            repeat(lit("ж"), (col("doc_id") % 4).cast("int"))))
          .as("text")),
        "text", "source")),


    // Spearman rank correlation per return flag — the monotone-
    // association readout next to q12's Pearson, EXACT on the integer
    // lattice: row_number ranks over a strict total order, Σd² as
    // BIGINT, one closing double division per group
    "q284_spearman_by_flag" -> ((s, dir) =>
      Analytics.spearmanBy(Tables.lineitem(s, dir), "l_returnflag",
        col("l_quantity"), col("l_extendedprice"),
        col("l_orderkey") * 100 + col("l_linenumber"))),


    // Rendezvous (HRW) shard placement + the 8→9 reshard transition
    // matrix: the output itself EXHIBITS the minimal-movement
    // invariant — every off-diagonal row lands on the new shard 8,
    // nothing migrates laterally between surviving shards (the
    // property a mod-hash reshard, which remaps ~all keys, cannot
    // give). Assignment is a pure per-row projection, codegen'd
    "q283_rendezvous_reshard" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Sampling.rendezvousShard(col("doc_id"), 8).as("shard_8"),
          Sampling.rendezvousShard(col("doc_id"), 9).as("shard_9"))
        .groupBy(col("shard_8"), col("shard_9"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("shard_8"), col("shard_9"))),


    // Time-decayed popularity (trending event types): halving per
    // elapsed 7-day half-life on the EXACT 2^40 lattice — the
    // recency-weighted count exp(-λ·age) approximates, with a BIGINT
    // sum both engines fold identically; asOf is a fixed literal past
    // the data's end so the query is a pure function of the table
    "q282_decayed_popularity" -> ((s, dir) =>
      Analytics.decayedCounts(Tables.eventsTyped(s, dir), "event_type",
        col("ts"), asOfUs = 1706745600000000L,          // 2024-02-01 UTC
        halfLifeUs = 604800000000L)),                   // 7 days,


    // CRAWL FRONTIER: bounded-hop BFS from a trusted seed-host set
    // over the link graph — the breadth layer of seed expansion next
    // to q241's proximity ranking. Seeds = the 'www.d0.*' hosts (a
    // closed-form predicate both engines replay); depth = shortest
    // hops, layers unrolled in the oracle
    "q281_crawl_frontier" -> ((s, dir) => {
      import etlmudah.web.Web
import etlmudah.load.Upsert
import etlmudah.joins.Joins
      val id = col("doc_id")
      val pages = Tables.documents(s, dir).select(
        Web.fakeUrl(id, col("source")).as("url"),
        Web.fakeHtml(id, col("text"), lit(null).cast("string"),
          Web.fakeLinkUrls(id)).as("page"))
      // pinned: the HTML-parse edge mine is read FIVE times downstream
      // (crawlFrontier's e + its 2-way hosts union, plus both seed
      // projections) — unpinned, each one replans the corpus-scale
      // parse (8 scans measured, guide §5 reuse); the edge frame is
      // host-level, far smaller than the corpus
      val edges = Web.hostLinkEdges(pages, "url", "page")
        .localCheckpoint(true)
      val seeds = edges.select(col("src_host").as("host"))
        .union(edges.select(col("dst_host").as("host"))).distinct()
        .where(col("host").startsWith("www.d0."))
      Web.crawlFrontier(edges, seeds, maxHops = 2)
    }),


    // INCREMENTAL VIEW MAINTENANCE of a per-customer aggregate: fold
    // an insert+retraction delta into the standing (n, sum, min, max)
    // state WITHOUT rescanning the base — count/sum self-maintain,
    // min/max self-maintain under inserts only, and a retraction at
    // the stored boundary reports needs_rescan instead of a silently
    // stale extreme (the Gupta–Mumick split). Merge cost is
    // O(|delta| + |state|), independent of base size
    "q280_incremental_agg_state" -> ((s, dir) => {
      val orders = Tables.orders(s, dir)
      val v = col("o_totalprice").cast("decimal(18,2)")
      val base = orders.filter(col("o_orderkey") % 10 =!= 7)
      val state = Upsert.aggState(base, Seq("o_custkey"), v)
      val delta = orders.filter(col("o_orderkey") % 10 === 7)
          .select(col("o_custkey"), v.as("__v"), lit(1).as("__op"))
        .unionByName(base.filter(col("o_orderkey") % 10 === 3)
          .select(col("o_custkey"), v.as("__v"), lit(-1).as("__op")))
      Upsert.mergeAggState(state, delta, Seq("o_custkey"),
          col("__v"), col("__op"))
        .select(col("o_custkey"), col("n"),
          round(col("sum_v"), 2).cast("double").as("sum_v"),
          col("min_v").cast("double").as("min_v"),
          col("max_v").cast("double").as("max_v"),
          col("needs_rescan"))
        .orderBy(col("o_custkey"))
    }),


    // k-center greedy coreset (farthest-point sampling, Gonzalez
    // 1985): the diverse-subset pick for training-data selection —
    // coverage-only, where q262's MMR trades against relevance. The
    // oracle unrolls every greedy round; coverage is the selection-
    // time max-cosine evidence (null for the min-id seed)
    "q279_kcenter_coreset" -> ((s, dir) =>
      Similarity.kCenterSelect(
        Tables.embeddings(s, dir)
          .where(col("vec_id") < 60L)
          .select(col("vec_id").as("id"), col("embedding").as("vec")),
        k = 8)),


    // HITS hubs & authorities over the host link graph (Kleinberg
    // 1999) — the directory-vs-destination split next to q222's
    // PageRank: L∞-renormalized integer half-rounds, every one of
    // which the oracle unrolls on the same md5-60bit host ids
    "q278_host_hits" -> ((s, dir) => {
      import etlmudah.web.Web
import etlmudah.load.Upsert
import etlmudah.joins.Joins
      val id = col("doc_id")
      val pages = Tables.documents(s, dir).select(
        Web.fakeUrl(id, col("source")).as("url"),
        Web.fakeHtml(id, col("text"), lit(null).cast("string"),
          Web.fakeLinkUrls(id)).as("page"))
      Web.hostHits(Web.hostLinkEdges(pages, "url", "page"), iters = 2)
    }),


    // Ranked top-N per group WITHOUT a window (the 100 TB dial for
    // q17's shape): the `graft_topk` bounded-heap aggregate partial-
    // aggregates map-side, so the exchange carries at most k rows per
    // (group x partition) instead of the whole frame through a sort.
    // The tag zero-pads so its string order IS the numeric order; the
    // oracle is the window DEFINITION itself over the same aggregate
    "q277_topk_per_nation" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("c_custkey"))
        .agg(round(sum((col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")), 2)
          .cast("double").as("revenue"))
      Analytics.topNPerGroupAgg(rev, Seq("n_name"), col("revenue"),
          lpad(col("c_custkey").cast("string"), 8, "0"), 3)
        .select(col("n_name"), col("rank"),
          col("tag").cast("long").as("c_custkey"),
          col("score").as("revenue"))
        .orderBy(col("n_name"), col("rank"))
    }),


    // TPC-H Q19 shape (disjunctive band join): OR-of-conjunctions as
    // the join residual with the part-side prefilter OR'd from the
    // per-branch part predicates so the scan still prunes; one row out
    "q276_disjunctive_band_join" -> ((s, dir) => {
      val branch1 = col("p_brand") === "Brand#2" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 11)
      val branch2 = col("p_brand") === "Brand#13" &&
        col("p_size").between(1, 25) && col("l_quantity").between(10, 20)
      val branch3 = col("p_brand") === "Brand#24" &&
        col("p_size").between(1, 50) && col("l_quantity").between(20, 30)
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir),
          col("l_partkey") === col("p_partkey") &&
            (branch1 || branch2 || branch3))
        .agg(round(sum((col("l_extendedprice") *
            (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),


    // REAL image resize: 24bpp BMP box-filter 2x downscale (the
    // brief's multimodal resize step) — synth -> graft_bmp_resize ->
    // graft_bmp_stats, with every output byte replayed by the oracle
    // from the synth closed form (floor block means)
    "q264_bmp_resize_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .where(col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          (col("doc_id") % 8 + 2).as("w"),
          ((col("doc_id") * 3) % 8 + 2).as("h"))
        .select(col("doc_id"), col("w"), col("h"),
          expr("graft_bmp_stats(graft_bmp_resize(" +
            "graft_fake_bmp24(doc_id, w, h), 2))").as("st"))
        .select(col("doc_id"), col("w"), col("h"),
          col("st.width").as("ow"), col("st.height").as("oh"),
          col("st.n_px"),
          col("st.b_min"), col("st.b_max"), col("st.b_sum"),
          col("st.g_min"), col("st.g_max"), col("st.g_sum"),
          col("st.r_min"), col("st.r_max"), col("st.r_sum"))
        .orderBy(col("doc_id"))),


    // CMS join-size estimation: |events ⋈ orders on user/cust key|
    // predicted from two grids without moving either table's keys —
    // the optimizer question answered sketch-side; exact join size
    // rides alongside as the audit tier
    "q263_cms_join_size" -> ((s, dir) =>
      etlmudah.scale.Sketches.cmsJoinSizeEstimate(
        Tables.events(s, dir), "user_id",
        Tables.orders(s, dir), "o_custkey",
        depth = 4, width = 256)),


    // token-weighted char-length percentiles per source: the percentile
    // of the document the typical TOKEN lives in (vs q08's row grain) —
    // exact lower weighted quantiles on BIGINT lattices, no
    // interpolation convention to align across engines
    "q261_weighted_quantiles" -> ((s, dir) =>
      etlmudah.analytics.Analytics.weightedQuantilesBy(
        Tables.documents(s, dir)
          .withColumn("bpeish", TextStats.tokenCountBpeIsh(col("text"))),
        "n_chars", "bpeish", Seq("source"), qs = Seq(0.25, 0.5, 0.75, 0.9))),


    // MMR diverse re-ranking of q27's semantic candidates: top-50 by
    // cosine to vec 0, greedily re-ranked to 10 results trading
    // relevance against redundancy at lambda=0.7; all 10 greedy rounds
    // replay unrolled in the oracle
    "q262_mmr_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.where(col("vec_id") === 0L)
        .select(col("embedding").as("__qv"))
      val cand = emb.where(col("vec_id") =!= 0L)
        .join(broadcast(q))
        .select(col("vec_id").as("id"),
          round(Similarity.cosineFast(col("embedding"), col("__qv")), 6)
            .as("score"),
          col("embedding").as("vec"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(50)
      Similarity.mmrSelect(cand, k = 10, lambda = 0.7)
    }),


    // label-propagation communities over the staged co-purchase graph
    // (q220's exact pair view): 3 deterministic synchronous rounds,
    // community = surviving label; output is the community-size table
    "q260_label_propagation" -> ((s, dir) =>
      etlmudah.graph.Centrality.labelPropagation(
        stagedCoEdges(s, dir)
          .filter(col("src") < col("dst") && col("weight") >= 2L)
          .select(col("src").as("u"), col("dst").as("v"), col("weight")),
        iters = 3)
        .groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("label"))),


    // INTERVAL OVERLAP JOIN (bin expansion — never a nested-loop range
    // join): user activity sessions (30-min gap rule, the q42
    // construction on an epoch-micros lattice) joined against nightly
    // 00:00-02:00 UTC maintenance windows; per-window session and user
    // counts. Bin width = 1 h, the session-scale dial
    "q259_interval_join_sessions" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.eventsTyped(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      val sess = ev
        .withColumn("__new",
          when(col("us") - lag(col("us"), 1).over(w) < 1800000000L, 0L)
            .otherwise(1L))
        .withColumn("__sid", sum(col("__new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__sid"))
        .agg(min(col("us")).as("s_us"), max(col("us")).as("e_us"))
        .select(col("user_id"), col("s_us"), col("e_us"))
      val dayUs = 86400000000L
      val wins = ev.agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
        .select(explode(sequence(
          expr(s"lo div ${dayUs}L * ${dayUs}L"),
          expr(s"hi div ${dayUs}L * ${dayUs}L"),
          lit(dayUs))).as("w0"))
        .select(col("w0"), (col("w0") + lit(7199999999L)).as("w1"))
      Joins.intervalJoin(sess, wins, "s_us", "e_us", "w0", "w1",
          binWidth = 3600000000L)
        .groupBy(col("w0"))
        .agg(count(lit(1)).as("n_sessions"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("w0"))
    }),


    // hybrid retrieval: the SAME "more like doc 0" question asked
    // lexically (BM25 top-50) and semantically (exact cosine top-50
    // over the aligned embedding table), fused by reciprocal-rank
    // fusion with the canonical c=60
    "q258_hybrid_rrf" -> ((s, dir) => {
      val lex = TextStats.bm25Search(Tables.documents(s, dir), "text",
        "doc_id", doc0Terms(s, dir), k = 50, excludeId = Some(0L))
        .select(col("id"), col("score"))
      val sem = Similarity.bruteForceTopK(Tables.embeddings(s, dir),
        "vec_id", "embedding", queryId = 0L, k = 50)
        .select(col("vec_id").as("id"), col("cos_sim").as("score"))
      Similarity.rrfFuse(lex, sem, k = 15)
    }),
  )

  def oracleSql: Map[String, String] = Map(


    // Full count-min grid replay: bucket d of a key is md5 hex lane d
    // mod width (the portable lane discipline); a bucket's counter is
    // a plain GROUP BY count; the estimate is the min over the key's
    // four counters. Nothing about the sketch is approximate to the
    // oracle — only to the keys it summarizes.
    "q231_cms_heavy_hitters" ->
      """WITH k AS (
        |  SELECT c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS key
        |  FROM customer),
        |g AS (
        |  SELECT r.d,
        |    CAST(CAST(('0x' || substr(md5(key), 8 * r.d + 1, 8)) AS UBIGINT)
        |      % 32 AS BIGINT) AS bucket,
        |    count(*) AS cnt
        |  FROM k CROSS JOIN range(4) r(d) GROUP BY 1, 2),
        |e AS (
        |  SELECT key, count(*) AS n_exact FROM k GROUP BY 1
        |  ORDER BY n_exact DESC, key ASC LIMIT 15),
        |est AS (
        |  SELECT e.key, e.n_exact, min(g.cnt) AS n_est
        |  FROM e CROSS JOIN range(4) r(d)
        |  JOIN g ON g.d = r.d AND g.bucket =
        |    CAST(CAST(('0x' || substr(md5(e.key), 8 * r.d + 1, 8)) AS UBIGINT)
        |      % 32 AS BIGINT)
        |  GROUP BY 1, 2)
        |SELECT key, n_exact, n_est, n_est - n_exact AS overcount
        |FROM est ORDER BY n_exact DESC, key ASC""".stripMargin,


    "q232_pca_top_component" ->
      s"""WITH $duckPcaCtes
         |SELECT v3.i::BIGINT AS idx, v3.v AS v,
         |  (SELECT num FROM ray) AS ray_num,
         |  (SELECT den FROM ray) AS ray_den
         |FROM v3 ORDER BY idx""".stripMargin,


    "q233_pca_projection_topk" ->
      s"""WITH $duckPcaCtes
         |SELECT q.vec_id, sum(q.qv * v3.v)::BIGINT AS proj
         |FROM q JOIN v3 ON v3.i = q.i
         |GROUP BY 1 ORDER BY abs(sum(q.qv * v3.v)) DESC, q.vec_id ASC
         |LIMIT 10""".stripMargin,


    // The validation report replayed rule by rule: same planted
    // perturbations, same null-is-failure convention (NOT coalesce(p,
    // false)), same minimal-as-string witnesses.
    "q234_validation_report" ->
      """WITH m AS (
        |  SELECT o_orderkey,
        |    CASE WHEN o_orderkey % 97 = 0 THEN -o_totalprice
        |         ELSE o_totalprice END AS p,
        |    CASE WHEN o_orderkey % 101 = 0 THEN '9-BOGUS'
        |         ELSE o_orderpriority END AS prio,
        |    CASE WHEN o_orderkey % 499 = 0 THEN o_custkey + 1000000
        |         ELSE o_custkey END AS ck,
        |    o_orderstatus AS st, o_orderdate AS d
        |  FROM orders),
        |w AS (SELECT * FROM m
        |      UNION ALL SELECT * FROM m WHERE o_orderkey % 1000 = 0),
        |rowr AS (
        |  SELECT 'price_positive' AS rule, 'row' AS kind,
        |    count(*)::BIGINT AS n_checked,
        |    sum(CASE WHEN NOT coalesce(p > 0, false) THEN 1 ELSE 0 END)
        |      ::BIGINT AS n_failed,
        |    min(CASE WHEN NOT coalesce(p > 0, false)
        |      THEN CAST(o_orderkey AS VARCHAR) END) AS example
        |  FROM w
        |  UNION ALL
        |  SELECT 'priority_known', 'row', count(*)::BIGINT,
        |    sum(CASE WHEN NOT coalesce(prio IN ('1-URGENT', '2-HIGH',
        |      '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'), false)
        |      THEN 1 ELSE 0 END)::BIGINT,
        |    min(CASE WHEN NOT coalesce(prio IN ('1-URGENT', '2-HIGH',
        |      '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'), false)
        |      THEN CAST(o_orderkey AS VARCHAR) END)
        |  FROM w
        |  UNION ALL
        |  SELECT 'status_known', 'row', count(*)::BIGINT,
        |    sum(CASE WHEN NOT coalesce(st IN ('P', 'O', 'F'), false)
        |      THEN 1 ELSE 0 END)::BIGINT,
        |    min(CASE WHEN NOT coalesce(st IN ('P', 'O', 'F'), false)
        |      THEN CAST(o_orderkey AS VARCHAR) END)
        |  FROM w
        |  UNION ALL
        |  SELECT 'date_in_range', 'row', count(*)::BIGINT,
        |    sum(CASE WHEN NOT coalesce(d BETWEEN TIMESTAMP '1992-01-01'
        |      AND TIMESTAMP '2001-12-31', false) THEN 1 ELSE 0 END)::BIGINT,
        |    min(CASE WHEN NOT coalesce(d BETWEEN TIMESTAMP '1992-01-01'
        |      AND TIMESTAMP '2001-12-31', false)
        |      THEN CAST(o_orderkey AS VARCHAR) END)
        |  FROM w),
        |uq AS (
        |  SELECT 'orderkey_unique' AS rule, 'unique' AS kind,
        |    sum(c)::BIGINT AS n_checked, sum(c - 1)::BIGINT AS n_failed,
        |    min(CASE WHEN c > 1 THEN k END) AS example
        |  FROM (SELECT CAST(o_orderkey AS VARCHAR) AS k, count(*) AS c
        |        FROM w GROUP BY 1)),
        |fk AS (
        |  SELECT 'custkey_covered' AS rule, 'fk' AS kind,
        |    count(*)::BIGINT AS n_checked,
        |    sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
        |      AS n_failed,
        |    min(CASE WHEN c_custkey IS NULL THEN CAST(ck AS VARCHAR) END)
        |      AS example
        |  FROM w LEFT JOIN customer ON ck = c_custkey
        |  WHERE ck IS NOT NULL)
        |SELECT rule, kind, n_checked, n_failed,
        |  round(n_failed::DOUBLE / n_checked::DOUBLE, 6) AS fail_rate,
        |  example
        |FROM (SELECT * FROM rowr UNION ALL SELECT * FROM uq
        |      UNION ALL SELECT * FROM fk)
        |ORDER BY rule""".stripMargin,


    "q235_zorder_roundtrip" ->
      """SELECT count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |   AS sum_price,
        | min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders
        |WHERE o_totalprice BETWEEN 50000 AND 150000
        |  AND o_custkey < 500""".stripMargin,


    // HLL register replay: md5 lane -> (bucket, suffix) bit split,
    // rho via the same exact >=2^k comparison ladder, per-bucket MAX,
    // then the lattice fold at the fixed cap 2^27. The estimate's
    // double arithmetic is written operand-for-operand like the Spark
    // side (every input exact), so it hash-matches too.
    "q236_hll_distinct_sketch" -> {
      val ladder = (0 until 26).map(k =>
        s"(CASE WHEN suffix >= ${1L << k} THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH h AS (
         |  SELECT CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
         |    1, 8)) AS UBIGINT)::BIGINT AS lane
         |  FROM orders),
         |r AS (SELECT lane >> 26 AS bucket,
         |             lane & 67108863 AS suffix FROM h),
         |regs AS (SELECT bucket,
         |    max(26 - ($ladder) + 1)::BIGINT AS reg
         |  FROM r GROUP BY 1),
         |agg AS (SELECT count(*)::BIGINT AS n_obs,
         |    max(reg)::BIGINT AS maxreg,
         |    sum(1::BIGINT << CAST(27 - reg AS INT))::BIGINT AS s_cap
         |  FROM regs)
         |SELECT 64::BIGINT AS m,
         |  (64 - n_obs)::BIGINT AS n_zero,
         |  maxreg,
         |  (s_cap + (64 - n_obs) * (1::BIGINT << 27))::BIGINT AS s,
         |  round(0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE
         |      / 64.0::DOUBLE) * 4096.0::DOUBLE
         |    * pow(2.0::DOUBLE, 27.0::DOUBLE)
         |    / (s_cap + (64 - n_obs) * (1::BIGINT << 27)), 4) AS raw_est,
         |  (SELECT count(DISTINCT o_custkey)::BIGINT FROM orders)
         |    AS n_true
         |FROM agg""".stripMargin
    },


    // Poisson-bootstrap replay: same 16-bit thresholds (shared
    // constants — no drift possible), same block/lane hash layout
    // (one md5 per (row, block) feeding eight replicate lanes), same
    // decimal folds, same nearest-rank pick over the (mu, rep)-ordered
    // replicate frame.
    "q237_bootstrap_mean_ci" -> {
      val ladder = etlmudah.scale.Sampling.poissonThresholds16.map(t =>
        s"(CASE WHEN lane >= $t THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH blks AS (SELECT i AS blk FROM range(25) t(i)),
         |hx AS (
         |  SELECT b.blk AS blk,
         |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)
         |      AS v,
         |    md5(CAST(o_orderkey AS VARCHAR) || '#'
         |      || CAST(b.blk AS VARCHAR)) AS hex
         |  FROM orders CROSS JOIN blks b),
         |lanes AS (
         |  SELECT hx.blk * 8 + l.lane AS rep, hx.v,
         |    CAST(('0x' || substr(hx.hex, l.lane * 4 + 1, 4))
         |      AS UBIGINT)::BIGINT AS lane
         |  FROM hx CROSS JOIN range(8) l(lane)
         |  WHERE hx.blk * 8 + l.lane < 200),
         |w AS (SELECT rep, v, ($ladder)::BIGINT AS wt FROM lanes),
         |m AS (
         |  SELECT rep,
         |    CAST(sum(wt * v) AS DOUBLE)
         |      / (100.0::DOUBLE * CAST(sum(wt) AS DOUBLE)) AS mu
         |  FROM w GROUP BY 1),
         |rk AS (SELECT mu, row_number() OVER (ORDER BY mu ASC, rep ASC)
         |         AS rn FROM m)
         |SELECT (SELECT count(*)::BIGINT FROM orders) AS n,
         |  (SELECT round(CAST(sum(CAST(round(CAST(o_totalprice AS DOUBLE)
         |        * 100) AS BIGINT)) AS DOUBLE)
         |      / (100.0::DOUBLE * CAST(count(*) AS DOUBLE)), 6)
         |   FROM orders) AS point_est,
         |  (SELECT round(mu, 6) FROM rk WHERE rn = 5) AS ci_lo,
         |  (SELECT round(mu, 6) FROM rk WHERE rn = 195) AS ci_hi,
         |  200::BIGINT AS reps""".stripMargin
    },


    // Viterbi oracle: the planted construction re-derived closed-form
    // — the oracle never runs a DP, it carries the pieces the uniquely
    // optimal segmentation must produce.
    "q238_viterbi_segmentation" ->
      """WITH d AS (
        |  SELECT doc_id % 4 AS a, (doc_id * 2 + 1) % 4 AS b,
        |    (doc_id + 3) % 4 AS c, doc_id % 5 = 0 AS bang
        |  FROM documents),
        |toks AS (
        |  SELECT (['foo','bar','qux','zz'])[a + 1] AS token FROM d
        |  UNION ALL
        |  SELECT (['foo','bar','qux','zz'])[b + 1] FROM d
        |  UNION ALL
        |  SELECT (['foo','bar','qux','zz'])[c + 1] FROM d
        |  UNION ALL
        |  SELECT '!' FROM d WHERE bang)
        |SELECT token, count(*) AS n FROM toks
        |GROUP BY 1 ORDER BY token""".stripMargin,


    // OLS replay on HUGEINT (the same exact integers Spark holds as
    // DECIMAL(38,0) — DuckDB's decimal multiply caps combined width,
    // HUGEINT is its native 128-bit exact lane), double steps mirrored
    // operand for operand.
    "q239_linear_fit" ->
      """WITH q AS (
        |  SELECT CAST(round(CAST(l_quantity AS DOUBLE) * 100) AS BIGINT)
        |      AS x,
        |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)
        |      AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |m AS (
        |  SELECT count(*)::HUGEINT AS n,
        |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
        |    sum(x * x)::HUGEINT AS sxx, sum(x * y)::HUGEINT AS sxy,
        |    sum(y * y)::HUGEINT AS syy
        |  FROM q),
        |c AS (
        |  SELECT CAST(n AS BIGINT) AS n,
        |    n * sxy - sx * sy AS cov_n,
        |    n * sxx - sx * sx AS var_x,
        |    sy * sxx - sx * sxy AS int_n,
        |    n * syy - sy * sy AS var_y
        |  FROM m)
        |SELECT n,
        |  round(CAST(cov_n AS DOUBLE) / CAST(var_x AS DOUBLE)
        |    * (100.0::DOUBLE / 100.0::DOUBLE), 6) AS slope,
        |  round(CAST(int_n AS DOUBLE) / CAST(var_x AS DOUBLE)
        |    / 100.0::DOUBLE, 6) AS intercept,
        |  round(CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE)
        |    / (CAST(var_x AS DOUBLE) * CAST(var_y AS DOUBLE)), 6) AS r2
        |FROM c""".stripMargin,


    // q236's register replay grouped by priority, plus the '__all__'
    // tier from a per-bucket MAX over the same register frame — the
    // union algebra replayed, not assumed.
    "q240_hll_union" -> {
      val ladder = (0 until 26).map(k =>
        s"(CASE WHEN suffix >= ${1L << k} THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH h AS (
         |  SELECT o_orderpriority AS grp,
         |    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
         |      1, 8)) AS UBIGINT)::BIGINT AS lane
         |  FROM orders),
         |r AS (SELECT grp, lane >> 26 AS bucket,
         |             lane & 67108863 AS suffix FROM h),
         |regs AS (SELECT grp, bucket,
         |    max(26 - ($ladder) + 1)::BIGINT AS reg
         |  FROM r GROUP BY 1, 2),
         |tiers AS (
         |  SELECT grp, count(*)::BIGINT AS n_obs, max(reg)::BIGINT
         |      AS maxreg,
         |    sum(1::BIGINT << CAST(27 - reg AS INT))::BIGINT AS s_cap
         |  FROM regs GROUP BY 1
         |  UNION ALL
         |  SELECT '__all__', count(*)::BIGINT, max(reg)::BIGINT,
         |    sum(1::BIGINT << CAST(27 - reg AS INT))::BIGINT
         |  FROM (SELECT bucket, max(reg) AS reg FROM regs GROUP BY 1))
         |SELECT grp, 64::BIGINT AS m,
         |  (64 - n_obs)::BIGINT AS n_zero, maxreg,
         |  (s_cap + (64 - n_obs) * (1::BIGINT << 27))::BIGINT AS s,
         |  round(0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE
         |      / 64.0::DOUBLE) * 4096.0::DOUBLE
         |    * pow(2.0::DOUBLE, 27.0::DOUBLE)
         |    / (s_cap + (64 - n_obs) * (1::BIGINT << 27)), 4) AS raw_est
         |FROM tiers ORDER BY grp""".stripMargin
    },


    // Seeded-teleport replay: same edge/node/outw chain as q222's
    // oracle, with r0 and the per-round teleport term gated on seed
    // membership (host LIKE '%.com') and normalized by |S| not |V|.
    "q241_personalized_host_rank" ->
      s"""WITH hh AS (SELECT doc_id,
         |    ${duckFakeHost("doc_id")} AS hsrc,
         |    ${duckFakeHost("doc_id + 1")} AS h1,
         |    ${duckFakeHost("3 * doc_id + 5")} AS h2
         |  FROM documents),
         |le AS (SELECT hsrc AS src_host, h1 AS dst_host FROM hh
         |       UNION ALL SELECT hsrc, h2 FROM hh),
         |e0 AS (SELECT src_host, dst_host, count(*)::BIGINT AS weight
         |       FROM le WHERE src_host <> dst_host GROUP BY 1, 2),
         |e AS (SELECT
         |    CAST(('0x' || substr(md5(src_host),1,15)) AS UBIGINT)::BIGINT
         |      AS src,
         |    CAST(('0x' || substr(md5(dst_host),1,15)) AS UBIGINT)::BIGINT
         |      AS dst,
         |    weight FROM e0),
         |hosts AS (SELECT host,
         |    CAST(('0x' || substr(md5(host),1,15)) AS UBIGINT)::BIGINT
         |      AS node
         |  FROM (SELECT src_host AS host FROM e0
         |        UNION SELECT dst_host FROM e0)),
         |seedn AS (SELECT DISTINCT node FROM hosts
         |          WHERE host LIKE '%.com'),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |ns AS (SELECT count(*)::BIGINT AS n FROM nodes
         |       WHERE node IN (SELECT node FROM seedn)),
         |ew AS (
         |  SELECT e.src, e.dst, e.weight, o.outw
         |  FROM e JOIN (SELECT src, sum(weight)::BIGINT AS outw
         |               FROM e GROUP BY 1) o USING (src)),
         |r0 AS (SELECT node,
         |    (CASE WHEN node IN (SELECT node FROM seedn)
         |      THEN 1000000000000 // (SELECT n FROM ns)
         |      ELSE 0 END)::BIGINT AS rank
         |  FROM nodes),
         |r1 AS (SELECT nd.node,
         |    (CASE WHEN nd.node IN (SELECT node FROM seedn)
         |      THEN (15 * 1000000000000) // (100 * (SELECT n FROM ns))
         |      ELSE 0 END
         |     + (85 * COALESCE(c.c, 0)) // 100)::BIGINT AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT ew.dst AS node,
         |           sum((r.rank * ew.weight) // ew.outw)::BIGINT AS c
         |    FROM ew JOIN r0 r ON ew.src = r.node GROUP BY 1) c
         |    USING (node)),
         |r2 AS (SELECT nd.node,
         |    (CASE WHEN nd.node IN (SELECT node FROM seedn)
         |      THEN (15 * 1000000000000) // (100 * (SELECT n FROM ns))
         |      ELSE 0 END
         |     + (85 * COALESCE(c.c, 0)) // 100)::BIGINT AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT ew.dst AS node,
         |           sum((r.rank * ew.weight) // ew.outw)::BIGINT AS c
         |    FROM ew JOIN r1 r ON ew.src = r.node GROUP BY 1) c
         |    USING (node)),
         |r3 AS (SELECT nd.node,
         |    (CASE WHEN nd.node IN (SELECT node FROM seedn)
         |      THEN (15 * 1000000000000) // (100 * (SELECT n FROM ns))
         |      ELSE 0 END
         |     + (85 * COALESCE(c.c, 0)) // 100)::BIGINT AS rank
         |  FROM nodes nd LEFT JOIN (
         |    SELECT ew.dst AS node,
         |           sum((r.rank * ew.weight) // ew.outw)::BIGINT AS c
         |    FROM ew JOIN r2 r ON ew.src = r.node GROUP BY 1) c
         |    USING (node))
         |SELECT hosts.host, hosts.host LIKE '%.com' AS is_seed, r3.rank
         |FROM r3 JOIN hosts USING (node)
         |ORDER BY rank DESC, host""".stripMargin,


    // Jackknife replay: per-group cent sums, the guarded leave-one-out
    // double, the micro-lattice re-quantization, and the exact integer
    // variance identity on HUGEINT — every double step mirrored.
    "q242_jackknife_se" ->
      """WITH g AS (
        |  SELECT o_orderpriority AS grp, count(*)::BIGINT AS n_g,
        |    sum(CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT))
        |      ::BIGINT AS s_g
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT grp, n_g, s_g,
        |    (SELECT sum(n_g)::BIGINT FROM g) AS bign,
        |    (SELECT sum(s_g)::BIGINT FROM g) AS bigs,
        |    (SELECT count(*)::BIGINT FROM g) AS ng
        |  FROM g),
        |t2 AS (
        |  SELECT *, CAST(round(
        |    (CASE WHEN bign > n_g THEN
        |       CAST(bigs - s_g AS DOUBLE)
        |         / (100.0::DOUBLE * CAST(bign - n_g AS DOUBLE))
        |     ELSE 0.0::DOUBLE END) * CAST(10000 AS DOUBLE))
        |    AS BIGINT) AS t_g
        |  FROM t),
        |agg AS (
        |  SELECT max(bign) AS n, max(ng) AS n_groups, max(bigs) AS bigs,
        |    sum(t_g)::HUGEINT AS st,
        |    sum(t_g::HUGEINT * t_g::HUGEINT)::HUGEINT AS stt
        |  FROM t2)
        |SELECT n, n_groups,
        |  round(CAST(bigs AS DOUBLE)
        |    / (100.0::DOUBLE * CAST(n AS DOUBLE)), 6) AS point_est,
        |  round(sqrt(CAST(n_groups::HUGEINT * stt - st * st AS DOUBLE)
        |      * CAST(n_groups - 1 AS DOUBLE))
        |    / CAST(n_groups AS DOUBLE) / 10000.0::DOUBLE, 6) AS jk_se
        |FROM agg""".stripMargin,


    // Benford replay: same exact digit extraction (floor -> BIGINT ->
    // first char), same fixed 6dp expected shares, chi terms mirrored.
    "q243_benford_digits" -> {
      val shares = etlmudah.analytics.Analytics.benfordShares
        .zipWithIndex.map { case (v, i) => s"($v)" }.mkString(", ")
      s"""WITH d AS (
         |  SELECT CAST(substr(CAST(CAST(floor(abs(
         |      CAST(o_totalprice AS DOUBLE))) AS BIGINT) AS VARCHAR),
         |      1, 1) AS INT) AS digit
         |  FROM orders
         |  WHERE o_totalprice IS NOT NULL
         |    AND abs(CAST(o_totalprice AS DOUBLE)) >= 1.0),
         |counts AS (SELECT digit, count(*)::BIGINT AS n FROM d
         |           GROUP BY 1),
         |t AS (SELECT digit, n,
         |        (SELECT sum(n)::BIGINT FROM counts) AS total
         |      FROM counts),
         |b AS (SELECT digit, n, total,
         |    round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS share,
         |    ([$shares])[digit] AS benford
         |  FROM t)
         |SELECT digit, n, share, benford,
         |  round((CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * benford)
         |    * (CAST(n AS DOUBLE) - CAST(total AS DOUBLE) * benford)
         |    / (CAST(total AS DOUBLE) * benford), 6) AS chi_term
         |FROM b ORDER BY digit""".stripMargin
    },


    // The grouped OLS replay — q239's chain with a GROUP BY key.
    "q244_linear_fit_by_flag" ->
      """WITH q AS (
        |  SELECT l_returnflag,
        |    CAST(round(CAST(l_quantity AS DOUBLE) * 100) AS BIGINT) AS x,
        |    CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)
        |      AS y
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |m AS (
        |  SELECT l_returnflag, count(*)::HUGEINT AS n,
        |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
        |    sum(x * x)::HUGEINT AS sxx, sum(x * y)::HUGEINT AS sxy,
        |    sum(y * y)::HUGEINT AS syy
        |  FROM q GROUP BY 1),
        |c AS (
        |  SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |    n * sxy - sx * sy AS cov_n,
        |    n * sxx - sx * sx AS var_x,
        |    sy * sxx - sx * sxy AS int_n,
        |    n * syy - sy * sy AS var_y
        |  FROM m)
        |SELECT l_returnflag, n,
        |  round(CAST(cov_n AS DOUBLE) / CAST(var_x AS DOUBLE)
        |    * (100.0::DOUBLE / 100.0::DOUBLE), 6) AS slope,
        |  round(CAST(int_n AS DOUBLE) / CAST(var_x AS DOUBLE)
        |    / 100.0::DOUBLE, 6) AS intercept,
        |  round(CAST(cov_n AS DOUBLE) * CAST(cov_n AS DOUBLE)
        |    / (CAST(var_x AS DOUBLE) * CAST(var_y AS DOUBLE)), 6) AS r2
        |FROM c ORDER BY l_returnflag""".stripMargin,


    // Inclusion-exclusion replay: q236's register/estimate chain run
    // for A, B, and their per-bucket-MAX merge; the exact intersection
    // is one distinct-join count.
    "q245_hll_overlap" -> {
      val ladder = (0 until 26).map(k =>
        s"(CASE WHEN suffix >= ${1L << k} THEN 1 ELSE 0 END)")
        .mkString(" + ")
      def regs(tag: String, pred: String): String =
        s"""r$tag AS (SELECT bucket, max(26 - ($ladder) + 1)::BIGINT AS reg
           |  FROM (SELECT lane >> 26 AS bucket, lane & 67108863 AS suffix
           |        FROM (SELECT CAST(('0x' ||
           |            substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))
           |            AS UBIGINT)::BIGINT AS lane
           |          FROM orders WHERE $pred))
           |  GROUP BY 1)""".stripMargin
      def est(tag: String): String =
        s"""e$tag AS (SELECT round(0.7213::DOUBLE / (1.0::DOUBLE
           |    + 1.079::DOUBLE / 64.0::DOUBLE) * 4096.0::DOUBLE
           |    * pow(2.0::DOUBLE, 27.0::DOUBLE)
           |    / (sum(1::BIGINT << CAST(27 - reg AS INT))::BIGINT
           |       + (64 - count(*)) * (1::BIGINT << 27)), 4) AS est
           |  FROM r$tag)""".stripMargin
      s"""WITH ${regs("a", "o_orderpriority = '1-URGENT'")},
         |${regs("b", "o_orderpriority = '5-LOW'")},
         |ru AS (SELECT bucket, max(reg) AS reg
         |  FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
         |  GROUP BY 1),
         |${est("a")},
         |${est("b")},
         |${est("u")},
         |truth AS (
         |  SELECT count(*)::BIGINT AS n_true_overlap FROM (
         |    SELECT DISTINCT o_custkey FROM orders
         |    WHERE o_orderpriority = '1-URGENT'
         |    INTERSECT
         |    SELECT DISTINCT o_custkey FROM orders
         |    WHERE o_orderpriority = '5-LOW'))
         |SELECT ea.est AS est_a, eb.est AS est_b, eu.est AS est_union,
         |  round(ea.est + eb.est - eu.est, 4) AS est_overlap,
         |  truth.n_true_overlap
         |FROM ea, eb, eu, truth""".stripMargin
    },


    // The skyline DEFINITION (quadratic NOT-EXISTS domination): the
    // engine's bucket-sweep must produce exactly this set.
    "q246_skyline_parts" ->
      """SELECT p.p_partkey, p.p_size,
        |  round(p.p_retailprice, 2) AS price_2
        |FROM part p
        |WHERE p.p_size IS NOT NULL AND p.p_retailprice IS NOT NULL
        |  AND NOT EXISTS (
        |    SELECT 1 FROM part q
        |    WHERE q.p_size IS NOT NULL AND q.p_retailprice IS NOT NULL
        |      AND q.p_size >= p.p_size
        |      AND q.p_retailprice <= p.p_retailprice
        |      AND (q.p_size > p.p_size
        |        OR q.p_retailprice < p.p_retailprice))
        |ORDER BY p_size, price_2, p_partkey""".stripMargin,


    // row_number-difference run collapse, replayed verbatim.
    "q247_order_streaks" ->
      """WITH mo AS (
        |  SELECT DISTINCT o_custkey AS k,
        |    (year(o_orderdate) * 12 + month(o_orderdate) - 1)::BIGINT
        |      AS m
        |  FROM orders
        |  WHERE o_orderdate IS NOT NULL AND o_custkey IS NOT NULL),
        |runs AS (
        |  SELECT k,
        |    m - row_number() OVER (PARTITION BY k ORDER BY m) AS grp
        |  FROM mo),
        |islands AS (
        |  SELECT k, grp, count(*)::BIGINT AS island_len
        |  FROM runs GROUP BY 1, 2)
        |SELECT island_len, count(*)::BIGINT AS n_islands,
        |  count(DISTINCT k)::BIGINT AS n_keys
        |FROM islands GROUP BY 1 ORDER BY island_len""".stripMargin,


    "q248_k_anonymity" ->
      """WITH cls AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    count(*)::BIGINT AS class_size,
        |    count(DISTINCT CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
        |      ::BIGINT AS l_div
        |  FROM customer GROUP BY 1, 2)
        |SELECT class_size, count(*)::BIGINT AS n_classes,
        |  (class_size * count(*))::BIGINT AS n_rows,
        |  min(l_div)::BIGINT AS min_l
        |FROM cls GROUP BY 1 ORDER BY class_size""".stripMargin,


    // Welch replay on the same integer-cent lattice; expression trees
    // mirrored so the float closed forms agree bit-for-bit.
    "q249_welch_ttest" ->
      """WITH q AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(round(CAST(o_totalprice AS DOUBLE) * 100) AS BIGINT)
        |      AS x
        |  FROM orders WHERE o_totalprice IS NOT NULL),
        |m AS (
        |  SELECT
        |    sum(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT
        |      AS n_a,
        |    sum(CASE WHEN g = '5-LOW' THEN 1 ELSE 0 END)::BIGINT AS n_b,
        |    sum(CASE WHEN g = '1-URGENT' THEN x END)::HUGEINT AS sx_a,
        |    sum(CASE WHEN g = '1-URGENT' THEN x * x END)::HUGEINT
        |      AS sxx_a,
        |    sum(CASE WHEN g = '5-LOW' THEN x END)::HUGEINT AS sx_b,
        |    sum(CASE WHEN g = '5-LOW' THEN x * x END)::HUGEINT AS sxx_b
        |  FROM q),
        |c AS (
        |  SELECT n_a, n_b,
        |    CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_a,
        |    CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 AS mean_b,
        |    CAST(n_a::HUGEINT * sxx_a - sx_a * sx_a AS DOUBLE)
        |      / CAST(n_a * (n_a - 1) AS DOUBLE) / 10000.0 AS var_a,
        |    CAST(n_b::HUGEINT * sxx_b - sx_b * sx_b AS DOUBLE)
        |      / CAST(n_b * (n_b - 1) AS DOUBLE) / 10000.0 AS var_b
        |  FROM m),
        |s AS (
        |  SELECT n_a, n_b, mean_a, mean_b, var_a, var_b,
        |    var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE)
        |      AS se2
        |  FROM c)
        |SELECT n_a, n_b,
        |  round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0 THEN
        |    round((mean_a - mean_b) / sqrt(se2), 6) END AS t_stat,
        |  CASE WHEN n_a >= 2 AND n_b >= 2 AND se2 > 0 THEN
        |    round(se2 * se2 / (
        |      var_a * var_a / CAST(n_a * n_a * (n_a - 1) AS DOUBLE) +
        |      var_b * var_b / CAST(n_b * n_b * (n_b - 1) AS DOUBLE)),
        |      6) END AS df_welch
        |FROM s""".stripMargin,


    // support/confidence/lift from DISTINCT-basket counts.
    "q250_association_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS g, l_partkey::BIGINT AS item
        |  FROM lineitem
        |  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
        |pairs AS (
        |  SELECT a.item AS u, b.item AS v, count(*)::BIGINT AS co_support
        |  FROM items a JOIN items b ON a.g = b.g AND a.item < b.item
        |  GROUP BY 1, 2 HAVING count(*) >= 3),
        |marg AS (SELECT item, count(*)::BIGINT AS n FROM items
        |         GROUP BY 1),
        |tot AS (SELECT count(DISTINCT g)::BIGINT AS n_baskets FROM items)
        |SELECT u, v, co_support, mu.n AS n_u, mv.n AS n_v, n_baskets,
        |  round(CAST(co_support AS DOUBLE) / CAST(n_baskets AS DOUBLE),
        |    6) AS support,
        |  round(CAST(co_support AS DOUBLE) / CAST(mu.n AS DOUBLE), 6)
        |    AS conf_u_v,
        |  round(CAST(co_support AS DOUBLE) / CAST(mv.n AS DOUBLE), 6)
        |    AS conf_v_u,
        |  round(CAST(co_support AS DOUBLE) * CAST(n_baskets AS DOUBLE)
        |    / (CAST(mu.n AS DOUBLE) * CAST(mv.n AS DOUBLE)), 6) AS lift
        |FROM pairs
        |JOIN marg mu ON pairs.u = mu.item
        |JOIN marg mv ON pairs.v = mv.item
        |CROSS JOIN tot
        |ORDER BY lift DESC, u, v LIMIT 20""".stripMargin,


    // 2x2 presence chi-square over per-document term counts; HUGEINT
    // cells mirror the engine's DECIMAL(38,0) fold.
    "q251_chi2_terms" ->
      """WITH tot AS (
        |  SELECT count(*)::BIGINT AS n_docs,
        |    sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT
        |      AS n_pos
        |  FROM documents),
        |dt AS (
        |  SELECT DISTINCT doc_id, (lang = 'en') AS y,
        |    unnest(string_split_regex(trim(text), '\s+')) AS term
        |  FROM documents),
        |pt AS (
        |  SELECT term, count(*)::BIGINT AS df_term,
        |    sum(CASE WHEN y THEN 1 ELSE 0 END)::BIGINT AS df_pos
        |  FROM dt GROUP BY 1 HAVING count(*) >= 5),
        |cells AS (
        |  SELECT term, df_term, df_pos,
        |    df_pos::HUGEINT AS a, (df_term - df_pos)::HUGEINT AS b,
        |    (n_pos - df_pos)::HUGEINT AS c,
        |    (n_docs - n_pos - df_term + df_pos)::HUGEINT AS d,
        |    n_docs::HUGEINT AS n
        |  FROM pt CROSS JOIN tot)
        |SELECT term, df_term, df_pos,
        |  CASE WHEN (a + b) * (c + d) * (a + c) * (b + d) > 0 THEN
        |    round(CAST(n * (a * d - b * c) * (a * d - b * c) AS DOUBLE)
        |      / CAST((a + b) * (c + d) * (a + c) * (b + d) AS DOUBLE),
        |      6) END AS chi2
        |FROM cells
        |ORDER BY chi2 DESC NULLS LAST, term LIMIT 25""".stripMargin,


    // nfc_normalize is DuckDB's own NFC — the engine's graft_nfc must
    // agree on every changed-doc count and codepoint length.
    "q252_nfc_audit" ->
      s"""WITH d AS (
         |  SELECT source, text || '$nfcSuffix' AS t
         |  FROM documents WHERE text IS NOT NULL),
         |n AS (SELECT source, t, nfc_normalize(t) AS nf FROM d)
         |SELECT source AS slice, count(*)::BIGINT AS n_docs,
         |  sum(CASE WHEN t <> nf THEN 1 ELSE 0 END)::BIGINT
         |    AS n_changed,
         |  sum(length(t))::BIGINT AS chars_raw,
         |  sum(length(nf))::BIGINT AS chars_nfc
         |FROM n GROUP BY 1 ORDER BY slice""".stripMargin,


    // Theil-Sen/Mann-Kendall replay: identical md5-ranked cap, pair
    // join, exact-int slopes, interpolated median.
    "q253_theil_sen_trend" ->
      s"""WITH series AS ($monthlyCentsSql),
         |capped AS (
         |  SELECT g, m AS x, cents AS y FROM (
         |    SELECT g, m, cents, row_number() OVER (PARTITION BY g
         |      ORDER BY md5(CAST(m AS VARCHAR) || '|' ||
         |        CAST(cents AS VARCHAR)), m) AS r
         |    FROM series) WHERE r <= 500),
         |pairs AS (
         |  SELECT a.g, (b.y - a.y) AS dy, (b.x - a.x) AS dx
         |  FROM capped a JOIN capped b ON a.g = b.g AND a.x < b.x),
         |agg AS (
         |  SELECT g, count(*)::BIGINT AS n_pairs,
         |    sum(sign(dy))::BIGINT AS mk_s,
         |    round(quantile_cont(CAST(dy AS DOUBLE) / CAST(dx AS DOUBLE),
         |      0.5), 6) AS slope_med
         |  FROM pairs GROUP BY g),
         |npts AS (SELECT g, count(*)::BIGINT AS n_points FROM capped
         |         GROUP BY g)
         |SELECT npts.g AS o_orderpriority, n_points, n_pairs, mk_s,
         |  slope_med
         |FROM agg JOIN npts ON agg.g = npts.g
         |ORDER BY o_orderpriority""".stripMargin,


    // KS replay: distinct-lattice frame, integer deviation numerator,
    // one division; argmax value with min-v tie-break.
    "q254_ks_two_sample" ->
      """WITH la AS (
        |  SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 1) AS BIGINT)
        |    AS v
        |  FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice IS NOT NULL),
        |lb AS (
        |  SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * 1) AS BIGINT)
        |    AS v
        |  FROM orders
        |  WHERE o_orderpriority = '5-LOW' AND o_totalprice IS NOT NULL),
        |ca AS (SELECT v, count(*)::BIGINT AS na FROM la GROUP BY 1),
        |cb AS (SELECT v, count(*)::BIGINT AS nb FROM lb GROUP BY 1),
        |m AS (
        |  SELECT coalesce(ca.v, cb.v) AS v,
        |    coalesce(na, 0)::BIGINT AS na, coalesce(nb, 0)::BIGINT AS nb
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |c AS (
        |  SELECT v,
        |    sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS cma,
        |    sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW)::BIGINT AS cmb,
        |    (SELECT sum(na) FROM m)::BIGINT AS ta,
        |    (SELECT sum(nb) FROM m)::BIGINT AS tb
        |  FROM m),
        |d AS (SELECT v, abs(cma * tb - cmb * ta)::BIGINT AS dev, ta, tb
        |      FROM c)
        |SELECT max(ta) AS n_a, max(tb) AS n_b,
        |  CASE WHEN max(ta) > 0 AND max(tb) > 0 THEN
        |    round(CAST(max(dev) AS DOUBLE)
        |      / CAST(max(ta) * max(tb) AS DOUBLE), 6) END AS d_stat,
        |  (SELECT min(v) FROM d
        |   WHERE dev = (SELECT max(dev) FROM d)) AS d_at
        |FROM d""".stripMargin,


    // chi-square independence replay: HUGEINT cells, 6dp DECIMAL term
    // sum (order-independent), mirrored Cramer's V.
    "q255_chi2_independence" ->
      """WITH observed AS (
        |  SELECT o_orderpriority AS a, o_orderstatus AS b,
        |    count(*)::BIGINT AS o
        |  FROM orders
        |  WHERE o_orderpriority IS NOT NULL AND o_orderstatus IS NOT NULL
        |  GROUP BY 1, 2),
        |grid AS (
        |  SELECT da.a, db.b
        |  FROM (SELECT DISTINCT a FROM observed) da
        |  CROSS JOIN (SELECT DISTINCT b FROM observed) db),
        |cells AS (
        |  SELECT grid.a, grid.b, coalesce(o, 0)::BIGINT AS o
        |  FROM grid LEFT JOIN observed
        |    ON grid.a = observed.a AND grid.b = observed.b),
        |t AS (
        |  SELECT a, b, o,
        |    sum(o) OVER (PARTITION BY a)::HUGEINT AS rt,
        |    sum(o) OVER (PARTITION BY b)::HUGEINT AS ct,
        |    sum(o) OVER ()::HUGEINT AS n
        |  FROM cells),
        |terms AS (
        |  SELECT n,
        |    CAST(round(CAST((o::HUGEINT * n - rt * ct)
        |        * (o::HUGEINT * n - rt * ct) AS DOUBLE)
        |      / CAST(n * rt * ct AS DOUBLE), 6) AS DECIMAL(20,6)) AS term
        |  FROM t),
        |rc AS (SELECT count(DISTINCT a)::BIGINT AS r,
        |              count(DISTINCT b)::BIGINT AS c FROM cells),
        |s AS (SELECT CAST(max(n) AS BIGINT) AS n,
        |             CAST(sum(term) AS DOUBLE) AS chi2 FROM terms)
        |SELECT n, r, c, (r - 1) * (c - 1) AS dof, chi2,
        |  CASE WHEN n > 0 AND least(r, c) > 1 THEN
        |    round(sqrt(chi2 / CAST(n * (least(r, c) - 1) AS DOUBLE)), 6)
        |  END AS cramers_v
        |FROM s CROSS JOIN rc""".stripMargin,


    // CUSUM replay: cumulative-share deviation on the exact lattice,
    // min-t argmax tie-break.
    "q256_cusum_changepoint" ->
      s"""WITH series AS ($monthlyCentsSql),
         |sc AS (
         |  SELECT g, m, cents,
         |    sum(cents) OVER (PARTITION BY g ORDER BY m
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         |    row_number() OVER (PARTITION BY g ORDER BY m) AS i,
         |    count(*) OVER (PARTITION BY g) AS n,
         |    sum(cents) OVER (PARTITION BY g) AS tot
         |  FROM series),
         |d AS (
         |  SELECT g, m, abs(s * n - tot * i)::BIGINT AS dev,
         |    n::BIGINT AS n, tot::BIGINT AS tot
         |  FROM sc),
         |best AS (SELECT g, max(n) AS n_points, max(tot) AS y_total,
         |                max(dev) AS dn
         |         FROM d GROUP BY g),
         |pick AS (
         |  SELECT d.g, min(d.m) AS t_star
         |  FROM d JOIN best ON d.g = best.g AND d.dev = best.dn
         |  GROUP BY d.g)
         |SELECT best.g AS o_orderpriority, n_points, y_total,
         |  CASE WHEN y_total <> 0 THEN
         |    round(CAST(dn AS DOUBLE) / (CAST(n_points AS DOUBLE)
         |      * CAST(abs(y_total) AS DOUBLE)), 6) END AS d_stat,
         |  t_star
         |FROM best JOIN pick ON best.g = pick.g
         |ORDER BY o_orderpriority""".stripMargin,


    // BM25 serving replay off the shared retrieval ladder.
    "q257_bm25_search" ->
      s"""WITH $bm25SearchSql
         |SELECT id, terms_hit, score FROM agg
         |ORDER BY score DESC, id LIMIT 15""".stripMargin,


    // hybrid RRF replay: lexical ladder + q27's cosine scan, both
    // ranked (score desc, id), rank-filtered to each retriever's
    // top-50, full-outer fused at c=60.
    "q258_hybrid_rrf" ->
      s"""WITH $bm25SearchSql,
         |lexr AS (
         |  SELECT id, row_number() OVER (ORDER BY score DESC, id)
         |    ::BIGINT AS rank_a
         |  FROM agg),
         |lex AS (SELECT id, rank_a FROM lexr WHERE rank_a <= 50),
         |semscore AS (
         |  SELECT vec_id AS id,
         |    round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6)
         |      AS score
         |  FROM embeddings, (SELECT embedding::DOUBLE[] AS qv
         |    FROM embeddings WHERE vec_id = 0) q
         |  WHERE vec_id <> 0),
         |semr AS (
         |  SELECT id, row_number() OVER (ORDER BY score DESC, id)
         |    ::BIGINT AS rank_b
         |  FROM semscore),
         |sem AS (SELECT id, rank_b FROM semr WHERE rank_b <= 50),
         |fused AS (
         |  SELECT coalesce(lex.id, sem.id) AS id, rank_a, rank_b,
         |    round(coalesce(1.0 / (60 + rank_a), 0.0) +
         |      coalesce(1.0 / (60 + rank_b), 0.0), 6) AS rrf
         |  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
         |SELECT id, rank_a, rank_b, rrf FROM fused
         |ORDER BY rrf DESC, id LIMIT 15""".stripMargin,


    // wav-feature replay: samples from the synth closed form (doc_id
    // >= 0, so SQL % equals floorMod), crossings via lag, silence
    // runs via the islands trick over silent rows only.
    "q265_wav_features" ->
      """WITH d AS (SELECT doc_id, (doc_id % 50 + 10)::BIGINT AS nf
        |  FROM documents WHERE doc_id % 7 = 3),
        |s AS (SELECT d.doc_id, i.x AS i,
        |    ((d.doc_id * 31 + i.x * 17) % 65536 - 32768)::BIGINT AS v
        |  FROM d, range(0, 60) i(x) WHERE i.x < d.nf),
        |f AS (SELECT doc_id, i, v,
        |    lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv,
        |    CASE WHEN abs(v) <= 8000 THEN 1 ELSE 0 END AS sil
        |  FROM s),
        |runs AS (SELECT doc_id, i,
        |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
        |      AS grp
        |  FROM f WHERE sil = 1),
        |runagg AS (SELECT doc_id, count(*)::BIGINT AS rl FROM runs
        |           GROUP BY doc_id, grp),
        |rstats AS (SELECT doc_id, count(*)::BIGINT AS n_runs,
        |             max(rl)::BIGINT AS max_run
        |           FROM runagg GROUP BY doc_id),
        |base AS (SELECT doc_id, count(*)::BIGINT AS n_samples,
        |    sum(CASE WHEN pv IS NOT NULL AND pv * v < 0
        |      THEN 1 ELSE 0 END)::BIGINT AS n_zero_cross,
        |    sum(sil)::BIGINT AS n_silent
        |  FROM f GROUP BY doc_id)
        |SELECT b.doc_id, n_samples, n_zero_cross, n_silent,
        |  coalesce(r.n_runs, 0)::BIGINT AS n_silence_runs,
        |  coalesce(r.max_run, 0)::BIGINT AS max_silence_run
        |FROM base b LEFT JOIN rstats r USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    // Q2 shape: the correlated min decorrelated exactly as the engine
    // does it — the unit price is the RAW IEEE quotient (both engines
    // divide the same two parquet doubles, so the bits agree; rounding
    // it was the parity seam commit 02cdb06 removed), per-part min,
    // equality join back with ties kept, DISTINCT collapsing repeat
    // quotes
    "q266_min_unit_price_supplier" ->
      """WITH offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    l_extendedprice / l_quantity AS unit_price
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE p_size BETWEEN 10 AND 15 AND p_type = 'STANDARD'),
        |mo AS (SELECT l_partkey AS mp, min(unit_price) AS min_price
        |       FROM offers GROUP BY 1)
        |SELECT DISTINCT p_partkey, p_name, min_price, s_name, n_name,
        |  s_acctbal
        |FROM offers
        | JOIN mo ON l_partkey = mp AND unit_price = min_price
        | JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
        |LIMIT 100""".stripMargin,


    // Q7 shape: both directions between the two nations, grouped by
    // (supp_nation, cust_nation, ship year)
    "q267_nation_trade_flows" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        | year(l_shipdate)::BIGINT AS l_year,
        | CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation n1 ON s_nationkey = n1.n_nationkey
        | JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,


    // Q9 shape: profit = discounted revenue − retail-proportional
    // cost, both terms on the DECIMAL(18,4) lattice
    "q268_profit_by_nation_year" ->
      """SELECT n_name, year(o_orderdate)::BIGINT AS o_year,
        | CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
        |   - CAST(l_quantity * p_retailprice * 0.1 AS DECIMAL(18,4))), 2) AS DOUBLE) AS profit,
        | count(*) AS n_items
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2
        |ORDER BY n_name, o_year DESC""".stripMargin,


    // Q13 shape: LEFT join so order-less customers land in the zero
    // bucket; count(o_orderkey) skips the null padding
    "q269_order_count_distribution" ->
      """WITH pc AS (
        |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM pc GROUP BY 1
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,


    // Q15 shape: quarter revenue per supplier, winner(s) by equality
    // with the scalar max — ties kept
    "q270_top_supplier_revenue" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,


    // Q17 shape: per-part avg-quantity threshold, single-row answer;
    // 0.2 multiplies as a DOUBLE on both engines
    "q271_small_quantity_revenue" ->
      """WITH j AS (
        |  SELECT l_partkey, l_quantity, l_extendedprice
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand = 'Brand#12'),
        |aq AS (SELECT l_partkey AS ap, avg(l_quantity) AS avg_qty
        |       FROM j GROUP BY 1)
        |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_items
        |FROM j JOIN aq ON l_partkey = ap
        |  AND l_quantity < CAST(0.2 AS DOUBLE) * avg_qty""".stripMargin,


    // Q18 shape: big orders first (HAVING over lineitem), join back
    "q272_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey AS bk, sum(l_quantity) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN big ON o_orderkey = bk
        |ORDER BY total_qty DESC, o_orderkey ASC
        |LIMIT 20""".stripMargin,


    // Q21 shape: EXISTS other-supplier line, NOT EXISTS other-supplier
    // returned line; distinct orders per supplier
    "q273_sole_returner" ->
      """SELECT s_suppkey, s_name,
        |  count(DISTINCT l1.l_orderkey)::BIGINT AS numwait
        |FROM lineitem l1
        | JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_returnflag = 'R')
        |GROUP BY 1, 2
        |ORDER BY numwait DESC, s_suppkey ASC
        |LIMIT 20""".stripMargin,


    // Q22 shape: above-average balance AND no recent orders, rolled
    // up per nation; balances fold on the DECIMAL(18,2) lattice and
    // the above-average cut is the exact cross-multiply bal*n > sum
    // (the DECIMAL(19,0) cast forces int128 multiply in DuckDB)
    "q274_dormant_rich_customers" ->
      """WITH ab AS (
        |  SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS sb,
        |         CAST(count(*) AS DECIMAL(19,0)) AS nb
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, count(*) AS numcust,
        | CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
        |FROM customer
        | JOIN nation ON c_nationkey = n_nationkey
        | CROSS JOIN ab
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) * nb > sb
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1
        |ORDER BY n_name""".stripMargin,


    // Q11 shape: parts above 1.5x the mean part revenue —
    // val*np*2 > tot*3 on the exact decimal lattice, no division
    "q275_revenue_share_parts" ->
      """WITH pp AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS val
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(val) AS tv, count(*) AS np FROM pp)
        |SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS value
        |FROM pp, t
        |WHERE val * np * 2 > tv * 3
        |ORDER BY value DESC, l_partkey ASC""".stripMargin,


    // funnel replay: the q19 token count, the q24 fingerprint window,
    // the q202 blocklist rule, and the q89 cap window chained
    "q300_curation_funnel" ->
      """WITH d0 AS (SELECT doc_id, source, text,
        |    len(string_split_regex(trim(text), '\s+'))::BIGINT AS nt
        |  FROM documents),
        |s1 AS (SELECT * FROM d0 WHERE nt BETWEEN 30 AND 100000),
        |s2 AS (SELECT * FROM s1
        |  QUALIFY row_number() OVER (
        |    PARTITION BY md5(regexp_replace(lower(trim(text)),
        |      '\s+', ' ', 'g'))
        |    ORDER BY doc_id) = 1),
        |s3 AS (SELECT * FROM s2
        |  WHERE len(regexp_extract_all(text, '(?i)\bslow\b')) <= 2),
        |s4 AS (SELECT * FROM s3
        |  QUALIFY row_number() OVER (PARTITION BY source
        |    ORDER BY CAST(('0x' || substr(md5(doc_id::VARCHAR
        |      || 'funnel'), 1, 8)) AS UBIGINT) / 4294967296.0 ASC,
        |      doc_id ASC) <= 50)
        |SELECT '0_all' AS stage, count(*) AS n_rows,
        |  sum(nt)::BIGINT AS n_tokens FROM d0
        |UNION ALL SELECT '1_length', count(*), sum(nt)::BIGINT FROM s1
        |UNION ALL SELECT '2_dedup', count(*), sum(nt)::BIGINT FROM s2
        |UNION ALL SELECT '3_blocklist', count(*), sum(nt)::BIGINT
        |  FROM s3
        |UNION ALL SELECT '4_cap', count(*), sum(nt)::BIGINT FROM s4
        |ORDER BY stage""".stripMargin,


    // lattice-quantile replay: same buckets, same cumulative window,
    // same integer thresholds
    "q299_lattice_quantiles" ->
      """WITH b AS (SELECT l_returnflag AS k,
        |    floor(l_extendedprice / 1000.0)::BIGINT AS bu,
        |    count(*)::BIGINT AS c
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL
        |  GROUP BY 1, 2),
        |cu AS (SELECT k, bu, c,
        |    sum(c) OVER (PARTITION BY k ORDER BY bu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      ::BIGINT AS cum,
        |    sum(c) OVER (PARTITION BY k)::BIGINT AS n
        |  FROM b)
        |SELECT k AS l_returnflag, min(n) AS n,
        |  min(CASE WHEN cum >= (n * 250 + 999) // 1000 THEN bu END)
        |    AS q250_bucket,
        |  min(CASE WHEN cum >= (n * 250 + 999) // 1000 THEN bu END)
        |    * 1000.0 AS q250_est,
        |  min(CASE WHEN cum >= (n * 500 + 999) // 1000 THEN bu END)
        |    AS q500_bucket,
        |  min(CASE WHEN cum >= (n * 500 + 999) // 1000 THEN bu END)
        |    * 1000.0 AS q500_est,
        |  min(CASE WHEN cum >= (n * 750 + 999) // 1000 THEN bu END)
        |    AS q750_bucket,
        |  min(CASE WHEN cum >= (n * 750 + 999) // 1000 THEN bu END)
        |    * 1000.0 AS q750_est,
        |  min(CASE WHEN cum >= (n * 990 + 999) // 1000 THEN bu END)
        |    AS q990_bucket,
        |  min(CASE WHEN cum >= (n * 990 + 999) // 1000 THEN bu END)
        |    * 1000.0 AS q990_est
        |FROM cu GROUP BY k
        |ORDER BY l_returnflag""".stripMargin,


    // imputation replay: same damage, quantile_cont median, same
    // decimal fill-sum
    "q297_impute_nulls" ->
      """WITH d AS (SELECT o_orderpriority,
        |    CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |         ELSE o_totalprice END AS price
        |  FROM orders),
        |m AS (SELECT o_orderpriority AS mk,
        |    quantile_cont(price, 0.5) AS med
        |  FROM d GROUP BY 1)
        |SELECT o_orderpriority, count(*) AS n,
        |  sum(CASE WHEN price IS NULL THEN 1 ELSE 0 END)::BIGINT
        |    AS n_imputed,
        |  round(min(med), 4) AS median_used,
        |  CAST(round(sum(CAST(coalesce(price, med) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_filled
        |FROM d JOIN m ON o_orderpriority = mk
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,


    // z-score replay: identical decimal moments + the same closing
    // IEEE mean/variance/sqrt tree, same 3-sigma count
    "q298_zscore_audit" ->
      """WITH x AS (SELECT l_returnflag,
        |    CAST(l_extendedprice AS DECIMAL(18,4)) AS v
        |  FROM lineitem),
        |m AS (SELECT l_returnflag AS mk, count(*)::BIGINT AS n,
        |    -- the DECIMAL(19,4) cast forces int128 multiply lanes
        |    -- (DuckDB's 18-digit decimals multiply in int64 and
        |    -- overflow); the product is the same exact value Spark's
        |    -- (18,4)x(18,4) -> (37,8) computes
        |    sum(v) AS s, sum(CAST(v AS DECIMAL(19,4)) * v) AS q
        |  FROM x GROUP BY 1),
        |mm AS (SELECT mk, n, s::DOUBLE / n AS mean,
        |    sqrt(q::DOUBLE / n - (s::DOUBLE / n) * (s::DOUBLE / n))
        |      AS std
        |  FROM m)
        |SELECT l_returnflag, count(*) AS n,
        |  round(min(mean), 6) AS mean, round(min(std), 6) AS std,
        |  sum(CASE WHEN abs(v::DOUBLE - mean) > 3.0 * std
        |      THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        |FROM x JOIN mm ON l_returnflag = mk
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,


    // mode replay: the row_number argmax definition (n DESC, v ASC)
    "q293_mode_quantity" ->
      """WITH c AS (SELECT l_returnflag AS k, l_quantity AS v,
        |    count(*)::BIGINT AS n
        |  FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1, 2)
        |SELECT k AS l_returnflag, v AS mode, n AS n_mode
        |FROM (SELECT *, row_number() OVER (PARTITION BY k
        |    ORDER BY n DESC, v ASC) AS rk FROM c) t
        |WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,


    // encoding replay: DECIMAL sums, the same two closing divisions
    "q294_target_encoding" ->
      """WITH cat AS (SELECT o_orderpriority, count(*)::BIGINT AS n,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
        |  FROM orders GROUP BY 1),
        |g AS (SELECT sum(n)::BIGINT AS gn, sum(s) AS gs FROM cat)
        |SELECT o_orderpriority, n,
        |  round((s::DOUBLE + 10.0 * (gs::DOUBLE / gn::DOUBLE))
        |    / (n::DOUBLE + 10.0), 6) AS encoding
        |FROM cat, g ORDER BY o_orderpriority""".stripMargin,


    // heatmap replay: identical integral bins, decimal revenue
    "q295_qty_price_heatmap" ->
      """SELECT floor((l_quantity - 1) / 5.0)::BIGINT AS q_bin,
        |  floor(l_extendedprice / 10000.0)::BIGINT AS p_bin,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY 1, 2
        |ORDER BY q_bin, p_bin""".stripMargin,


    // grouping-sets replay: DuckDB native GROUPING SETS + GROUPING()
    // (Spark's grouping_id over two cols == 2*g(a) + g(b))
    "q296_grouping_sets" ->
      """SELECT (2 * grouping(o_orderpriority)
        |    + grouping(o_orderstatus))::BIGINT AS gid,
        |  o_orderpriority, o_orderstatus, count(*) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
        |  (o_orderpriority), (o_orderstatus))
        |ORDER BY gid, o_orderpriority ASC NULLS FIRST,
        |  o_orderstatus ASC NULLS FIRST""".stripMargin,


    // Venn replay: same sorted-member combo key, same two grains
    "q291_event_type_venn" ->
      """WITH u AS (SELECT user_id,
        |    list_sort(list(DISTINCT event_type)) AS types
        |  FROM events WHERE event_id % 17 = 0 GROUP BY 1)
        |SELECT list_aggregate(types, 'string_agg', '+') AS combo,
        |  count(*) AS n_users
        |FROM u GROUP BY 1
        |ORDER BY n_users DESC, combo ASC""".stripMargin,


    // multi-touch replay: same interval pairs, same per-purchase
    // touch counts, same 6dp per-pair credit
    "q292_multi_touch_credit" ->
      """WITH c AS (SELECT user_id AS c_user, epoch_us(ts) AS c_us,
        |    event_id AS c_id FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS p_user, epoch_us(ts) AS p_us,
        |    event_id AS p_id FROM events WHERE event_type = 'purchase'),
        |pairs AS (SELECT * FROM c JOIN p ON c_user = p_user
        |  AND c_us <= p_us AND c_us >= p_us - 3600000000),
        |pt AS (SELECT p_id AS pp, count(*)::BIGINT AS n_touch
        |  FROM pairs GROUP BY 1)
        |SELECT c_user, count(*) AS n_pairs,
        |  sum(1000000 // n_touch)::BIGINT AS credit_micro
        |FROM pairs JOIN pt ON p_id = pp
        |GROUP BY 1
        |ORDER BY credit_micro DESC, c_user ASC""".stripMargin,


    // string_agg replay: DuckDB's native ordered aggregation with the
    // identical (date, key) total order
    "q290_order_history_concat" ->
      """SELECT o_custkey, count(*) AS n_orders,
        |  string_agg(o_orderkey::VARCHAR, ','
        |    ORDER BY epoch_us(o_orderdate), o_orderkey) AS history
        |FROM orders GROUP BY 1
        |ORDER BY o_custkey""".stripMargin,


    // accent-fold replay: same two variants (composed via the literal,
    // decomposed via chr(769)), DuckDB's own strip_accents as the fold
    // (parity with NFD-strip spot-checked across the Latin fixtures)
    "q289_accent_fold_keys" ->
      """WITH v AS (SELECT source, doc_id,
        |    unnest([replace(text, 'e', 'é'),
        |            replace(text, 'e', 'e' || chr(769))]) AS t
        |  FROM documents),
        |d AS (SELECT source, doc_id,
        |    count(DISTINCT t)::BIGINT AS ndr,
        |    count(DISTINCT strip_accents(t))::BIGINT AS ndf
        |  FROM v GROUP BY 1, 2)
        |SELECT source, count(*) AS n_docs,
        |  sum(ndr)::BIGINT AS raw_variants,
        |  sum(ndf)::BIGINT AS folded_variants
        |FROM d GROUP BY 1 ORDER BY source""".stripMargin,


    // trimmed-mean replay: quantile_cont fences (the established
    // percentile parity), conditional average inside the band
    "q288_trimmed_mean" ->
      """WITH f AS (SELECT o_orderpriority AS k,
        |    quantile_cont(o_totalprice, 0.05) AS lo,
        |    quantile_cont(o_totalprice, 0.95) AS hi
        |  FROM orders GROUP BY 1)
        |SELECT o_orderpriority, count(*) AS n,
        |  sum(CASE WHEN o_totalprice BETWEEN lo AND hi
        |      THEN 1 ELSE 0 END)::BIGINT AS n_kept,
        |  round(avg(o_totalprice), 4) AS mean,
        |  round(avg(CASE WHEN o_totalprice BETWEEN lo AND hi
        |      THEN o_totalprice END), 4) AS trimmed_mean,
        |  round(min(lo), 4) AS lo, round(min(hi), 4) AS hi
        |FROM orders JOIN f ON o_orderpriority = k
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,


    // resample replay: same bucket pick (latest ts, value tie-break),
    // same dense grid, same IGNORE NULLS forward-fill window
    "q287_resample_fill" ->
      """WITH obs AS (SELECT k, b, v FROM (
        |    SELECT event_type AS k,
        |      epoch_us(ts) // 21600000000 AS b, value AS v,
        |      row_number() OVER (
        |        PARTITION BY event_type, epoch_us(ts) // 21600000000
        |        ORDER BY epoch_us(ts) DESC, value DESC) AS rk
        |    FROM events WHERE value IS NOT NULL) t WHERE rk = 1),
        |sp AS (SELECT k, min(b) AS lo, max(b) AS hi FROM obs
        |       GROUP BY 1),
        |g AS (SELECT k, unnest(range(lo, hi + 1)) AS b FROM sp),
        |j AS (SELECT g.k, g.b, obs.v
        |      FROM g LEFT JOIN obs ON obs.k = g.k AND obs.b = g.b)
        |SELECT k AS event_type, (b * 21600000000)::BIGINT AS bucket_us,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY k ORDER BY b
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
        |  (v IS NOT NULL) AS is_observed
        |FROM j ORDER BY event_type, bucket_us""".stripMargin,


    // checksum replay: same row hash (md5 over chr(1)-joined values,
    // chr(2) null sentinel), same bucket/xor/mod-sum folds on both
    // snapshots, same full-outer disagreement filter
    "q286_replica_checksum_diff" ->
      """WITH a0 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
        |    o_orderpriority FROM orders),
        |b0 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 997 = 0
        |      THEN CAST(o_totalprice + 1 AS DECIMAL(18,2))
        |      ELSE o_totalprice END AS o_totalprice,
        |    o_orderpriority FROM a0),
        |ha AS (SELECT CAST(('0x' || substr(md5(
        |      coalesce(o_orderkey::VARCHAR, chr(2)) || chr(1) ||
        |      coalesce(o_custkey::VARCHAR, chr(2)) || chr(1) ||
        |      coalesce(o_orderstatus, chr(2)) || chr(1) ||
        |      coalesce(o_totalprice::VARCHAR, chr(2)) || chr(1) ||
        |      coalesce(o_orderpriority, chr(2))), 1, 15))
        |    AS UBIGINT)::BIGINT AS h FROM a0),
        |hb AS (SELECT CAST(('0x' || substr(md5(
        |      coalesce(o_orderkey::VARCHAR, chr(2)) || chr(1) ||
        |      coalesce(o_custkey::VARCHAR, chr(2)) || chr(1) ||
        |      coalesce(o_orderstatus, chr(2)) || chr(1) ||
        |      coalesce(o_totalprice::VARCHAR, chr(2)) || chr(1) ||
        |      coalesce(o_orderpriority, chr(2))), 1, 15))
        |    AS UBIGINT)::BIGINT AS h FROM b0),
        |ca AS (SELECT h % 64 AS bucket, count(*)::BIGINT AS n_a,
        |    bit_xor(h)::BIGINT AS xor_a,
        |    sum(h % 1000003)::BIGINT AS sum_a FROM ha GROUP BY 1),
        |cb AS (SELECT h % 64 AS bucket, count(*)::BIGINT AS n_b,
        |    bit_xor(h)::BIGINT AS xor_b,
        |    sum(h % 1000003)::BIGINT AS sum_b FROM hb GROUP BY 1)
        |SELECT coalesce(ca.bucket, cb.bucket) AS bucket,
        |  n_a, n_b, xor_a, xor_b, sum_a, sum_b
        |FROM ca FULL OUTER JOIN cb ON ca.bucket = cb.bucket
        |WHERE n_a IS DISTINCT FROM n_b
        |   OR xor_a IS DISTINCT FROM xor_b
        |   OR sum_a IS DISTINCT FROM sum_b
        |ORDER BY bucket""".stripMargin,


    // script replay: same closed-form damage, same block regexes with
    // the 'g' flag (DuckDB replaces first-match by default), same
    // fixed latin > cyrillic > cjk tie order
    "q285_script_profile" ->
      """WITH d AS (SELECT source,
        |    CASE WHEN doc_id % 7 = 0
        |           THEN repeat('ж', (doc_id % 5 + 1)::INT)
        |         WHEN doc_id % 7 = 1
        |           THEN repeat('中', (doc_id % 4 + 1)::INT)
        |         WHEN doc_id % 7 = 2 THEN '12345 !?'
        |         ELSE text || repeat('ж', (doc_id % 4)::INT)
        |    END AS t
        |  FROM documents),
        |p AS (SELECT source,
        |    length(regexp_replace(t, '[^A-Za-z]', '', 'g'))::BIGINT
        |      AS lat,
        |    length(regexp_replace(t, '[^Ѐ-ӿ]', '', 'g'))::BIGINT AS cyr,
        |    length(regexp_replace(t, '[^一-鿿]', '', 'g'))::BIGINT
        |      AS cjk
        |  FROM d),
        |c AS (SELECT source, lat, cyr, cjk,
        |    CASE WHEN lat = 0 AND cyr = 0 AND cjk = 0 THEN 'none'
        |         WHEN lat >= cyr AND lat >= cjk THEN 'latin'
        |         WHEN cyr >= cjk THEN 'cyrillic'
        |         ELSE 'cjk' END AS dominant
        |  FROM p)
        |SELECT source, dominant, count(*) AS n_docs,
        |  sum(lat)::BIGINT AS n_latin, sum(cyr)::BIGINT AS n_cyrillic,
        |  sum(cjk)::BIGINT AS n_cjk
        |FROM c GROUP BY 1, 2
        |ORDER BY source, dominant""".stripMargin,


    // Spearman replay: identical rank construction — rx over
    // (x, y, id), ry over (y, rx): ry's tie-break is rx itself, so
    // fully-duplicate rows cannot pair differently across engines
    "q284_spearman_by_flag" ->
      """WITH b AS (SELECT l_returnflag AS k, l_quantity AS x,
        |    l_extendedprice AS y,
        |    l_orderkey * 100 + l_linenumber AS id
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |r1 AS (SELECT k, y,
        |    row_number() OVER (PARTITION BY k
        |      ORDER BY x ASC, y ASC, id ASC)::BIGINT AS rx
        |  FROM b),
        |r AS (SELECT k, rx,
        |    row_number() OVER (PARTITION BY k ORDER BY y ASC, rx ASC)
        |      ::BIGINT AS ry
        |  FROM r1),
        |a AS (SELECT k, count(*)::BIGINT AS n,
        |    sum((rx - ry) * (rx - ry))::BIGINT AS sum_d2
        |  FROM r GROUP BY 1)
        |SELECT k AS l_returnflag, n, sum_d2,
        |  CASE WHEN n < 2 THEN NULL
        |    ELSE round(1.0 - (6.0 * sum_d2::DOUBLE)
        |      / ((n * (n * n - 1))::DOUBLE), 6) END AS rho
        |FROM a ORDER BY l_returnflag""".stripMargin,


    // rendezvous replay: argmax by hex md5 DESC per candidate range —
    // the definitional row_number formulation of the same argmax
    "q283_rendezvous_reshard" ->
      """WITH a AS (SELECT doc_id, s AS shard_8 FROM (
        |    SELECT d.doc_id, r.s, row_number() OVER (
        |      PARTITION BY d.doc_id
        |      ORDER BY md5(d.doc_id::VARCHAR || ':' || r.s::VARCHAR)
        |        DESC, r.s) AS rk
        |    FROM documents d, range(0, 8) r(s)) t WHERE rk = 1),
        |b AS (SELECT doc_id, s AS shard_9 FROM (
        |    SELECT d.doc_id, r.s, row_number() OVER (
        |      PARTITION BY d.doc_id
        |      ORDER BY md5(d.doc_id::VARCHAR || ':' || r.s::VARCHAR)
        |        DESC, r.s) AS rk
        |    FROM documents d, range(0, 9) r(s)) t WHERE rk = 1)
        |SELECT shard_8, shard_9, count(*) AS n_docs
        |FROM a JOIN b USING (doc_id)
        |GROUP BY 1, 2
        |ORDER BY shard_8, shard_9""".stripMargin,


    // decay replay: identical bucket/shift arithmetic — age div
    // half-life clamped at 62, 2^40 >> bucket, BIGINT sum
    "q282_decayed_popularity" ->
      """SELECT event_type, count(*) AS n,
        |  sum(1099511627776::BIGINT >> least(
        |    (1706745600000000 - epoch_us(ts)) // 604800000000,
        |    62))::BIGINT AS decayed
        |FROM events
        |WHERE epoch_us(ts) <= 1706745600000000
        |GROUP BY 1
        |ORDER BY decayed DESC, event_type ASC""".stripMargin,


    // BFS replay: the q222 edge CTEs on host STRINGS (ids are engine-
    // internal — reachability needs no hashing), two unrolled layers:
    // seeds at 0, new dsts at 1, new dsts of layer 1 at 2
    "q281_crawl_frontier" ->
      s"""WITH hh AS (SELECT doc_id,
         |    ${duckFakeHost("doc_id")} AS hsrc,
         |    ${duckFakeHost("doc_id + 1")} AS h1,
         |    ${duckFakeHost("3 * doc_id + 5")} AS h2
         |  FROM documents),
         |le AS (SELECT hsrc AS src_host, h1 AS dst_host FROM hh
         |       UNION ALL SELECT hsrc, h2 FROM hh),
         |e0 AS (SELECT DISTINCT src_host, dst_host
         |       FROM le WHERE src_host <> dst_host),
         |v0 AS (SELECT host FROM (
         |    SELECT src_host AS host FROM e0
         |    UNION SELECT dst_host FROM e0)
         |  WHERE host LIKE 'www.d0.%'),
         |f1 AS (SELECT DISTINCT e0.dst_host AS host
         |  FROM e0 JOIN v0 ON e0.src_host = v0.host
         |  WHERE e0.dst_host NOT IN (SELECT host FROM v0)),
         |f2 AS (SELECT DISTINCT e0.dst_host AS host
         |  FROM e0 JOIN f1 ON e0.src_host = f1.host
         |  WHERE e0.dst_host NOT IN (SELECT host FROM v0)
         |    AND e0.dst_host NOT IN (SELECT host FROM f1))
         |SELECT host, 0::BIGINT AS depth FROM v0
         |UNION ALL SELECT host, 1 FROM f1
         |UNION ALL SELECT host, 2 FROM f2
         |ORDER BY depth, host""".stripMargin,


    // IVM replay: state from the base slice, the signed delta
    // aggregate, and the merge algebra spelled out — the boundary-hit
    // rule (del_min <= min_v OR del_max >= max_v, or a new group with
    // any retraction) nulls min/max and raises needs_rescan
    "q280_incremental_agg_state" ->
      """WITH base AS (SELECT o_custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS v, o_orderkey
        |  FROM orders WHERE o_orderkey % 10 <> 7),
        |st AS (SELECT o_custkey, count(*)::BIGINT AS n, sum(v) AS sum_v,
        |    min(v) AS min_v, max(v) AS max_v FROM base GROUP BY 1),
        |delta AS (
        |  SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
        |    1 AS op FROM orders WHERE o_orderkey % 10 = 7
        |  UNION ALL
        |  SELECT o_custkey, v, -1 FROM base WHERE o_orderkey % 10 = 3),
        |da AS (SELECT o_custkey, sum(op)::BIGINT AS dn,
        |    sum(op * v) AS dsum,
        |    min(CASE WHEN op > 0 THEN v END) AS ins_min,
        |    max(CASE WHEN op > 0 THEN v END) AS ins_max,
        |    min(CASE WHEN op < 0 THEN v END) AS del_min,
        |    max(CASE WHEN op < 0 THEN v END) AS del_max
        |  FROM delta GROUP BY 1),
        |m AS (SELECT coalesce(st.o_custkey, da.o_custkey) AS o_custkey,
        |    (coalesce(st.n, 0) + coalesce(da.dn, 0))::BIGINT AS n,
        |    CASE WHEN st.sum_v IS NULL THEN da.dsum
        |         WHEN da.dsum IS NULL THEN st.sum_v
        |         ELSE st.sum_v + da.dsum END AS sum_v,
        |    (da.del_min IS NOT NULL AND (st.min_v IS NULL
        |      OR da.del_min <= st.min_v
        |      OR da.del_max >= st.max_v)) AS dirty,
        |    st.min_v, st.max_v, da.ins_min, da.ins_max
        |  FROM st FULL OUTER JOIN da ON st.o_custkey = da.o_custkey)
        |SELECT o_custkey, n, CAST(round(sum_v, 2) AS DOUBLE) AS sum_v,
        |  CAST(CASE WHEN dirty THEN NULL
        |    WHEN min_v IS NULL THEN ins_min
        |    WHEN ins_min IS NULL THEN min_v
        |    ELSE least(min_v, ins_min) END AS DOUBLE) AS min_v,
        |  CAST(CASE WHEN dirty THEN NULL
        |    WHEN max_v IS NULL THEN ins_max
        |    WHEN ins_max IS NULL THEN max_v
        |    ELSE greatest(max_v, ins_max) END AS DOUBLE) AS max_v,
        |  dirty AS needs_rescan
        |FROM m WHERE n > 0
        |ORDER BY o_custkey""".stripMargin,


    // k-center replay: seed = min id, then 7 unrolled greedy rounds,
    // each picking the (min max-cosine, min id) candidate — every CTE
    // MATERIALIZED (the q262 discipline: selR is referenced 3x by
    // round R+1, inlined CTEs would re-evaluate exponentially)
    "q279_kcenter_coreset" -> {
      val rounds = (2 to 8).map { r =>
        s"""m$r AS MATERIALIZED (
           |  SELECT c2.id,
           |    max(round(list_cosine_similarity(c2.vec, s.vec), 6))
           |      AS msim
           |  FROM cand c2, cand s
           |  WHERE s.id IN (SELECT id FROM sel${r - 1})
           |    AND c2.id NOT IN (SELECT id FROM sel${r - 1})
           |  GROUP BY c2.id),
           |s$r AS MATERIALIZED (
           |  SELECT $r::BIGINT AS rank, id, msim AS coverage
           |  FROM m$r ORDER BY msim ASC, id ASC LIMIT 1),
           |sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1}
           |          UNION ALL SELECT * FROM s$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH cand AS MATERIALIZED (
         |  SELECT vec_id AS id, embedding::DOUBLE[] AS vec
         |  FROM embeddings WHERE vec_id < 60),
         |s1 AS MATERIALIZED (SELECT 1::BIGINT AS rank, min(id) AS id,
         |    NULL::DOUBLE AS coverage FROM cand),
         |sel1 AS MATERIALIZED (SELECT * FROM s1),
         |$rounds
         |SELECT rank, id, coverage FROM sel8 ORDER BY rank""".stripMargin
    },


    // HITS replay: the q222 edge CTEs + two unrolled (auth, hub)
    // half-round pairs, each L∞-renormalized with `//` (== Spark div
    // on the non-negative lattice); h0 = scale on every node
    "q278_host_hits" ->
      s"""WITH hh AS (SELECT doc_id,
         |    ${duckFakeHost("doc_id")} AS hsrc,
         |    ${duckFakeHost("doc_id + 1")} AS h1,
         |    ${duckFakeHost("3 * doc_id + 5")} AS h2
         |  FROM documents),
         |le AS (SELECT hsrc AS src_host, h1 AS dst_host FROM hh
         |       UNION ALL SELECT hsrc, h2 FROM hh),
         |e0 AS (SELECT src_host, dst_host, count(*)::BIGINT AS weight
         |       FROM le WHERE src_host <> dst_host GROUP BY 1, 2),
         |e AS (SELECT
         |    CAST(('0x' || substr(md5(src_host),1,15)) AS UBIGINT)::BIGINT AS src,
         |    CAST(('0x' || substr(md5(dst_host),1,15)) AS UBIGINT)::BIGINT AS dst,
         |    weight FROM e0),
         |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         |h0 AS (SELECT node, 1000000::BIGINT AS hub FROM nodes),
         |a1r AS (SELECT nd.node, COALESCE(m.m, 0)::BIGINT AS raw
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(h.hub * e.weight)::BIGINT AS m
         |    FROM e JOIN h0 h ON e.src = h.node GROUP BY 1) m
         |  USING (node)),
         |a1 AS (SELECT node, CASE WHEN (SELECT max(raw) FROM a1r) > 0
         |    THEN (raw * 1000000) // (SELECT max(raw) FROM a1r)
         |    ELSE 0 END::BIGINT AS auth FROM a1r),
         |h1r AS (SELECT nd.node, COALESCE(m.m, 0)::BIGINT AS raw
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.src AS node, sum(a.auth * e.weight)::BIGINT AS m
         |    FROM e JOIN a1 a ON e.dst = a.node GROUP BY 1) m
         |  USING (node)),
         |h1 AS (SELECT node, CASE WHEN (SELECT max(raw) FROM h1r) > 0
         |    THEN (raw * 1000000) // (SELECT max(raw) FROM h1r)
         |    ELSE 0 END::BIGINT AS hub FROM h1r),
         |a2r AS (SELECT nd.node, COALESCE(m.m, 0)::BIGINT AS raw
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.dst AS node, sum(h.hub * e.weight)::BIGINT AS m
         |    FROM e JOIN h1 h ON e.src = h.node GROUP BY 1) m
         |  USING (node)),
         |a2 AS (SELECT node, CASE WHEN (SELECT max(raw) FROM a2r) > 0
         |    THEN (raw * 1000000) // (SELECT max(raw) FROM a2r)
         |    ELSE 0 END::BIGINT AS auth FROM a2r),
         |h2r AS (SELECT nd.node, COALESCE(m.m, 0)::BIGINT AS raw
         |  FROM nodes nd LEFT JOIN (
         |    SELECT e.src AS node, sum(a.auth * e.weight)::BIGINT AS m
         |    FROM e JOIN a2 a ON e.dst = a.node GROUP BY 1) m
         |  USING (node)),
         |h2 AS (SELECT node, CASE WHEN (SELECT max(raw) FROM h2r) > 0
         |    THEN (raw * 1000000) // (SELECT max(raw) FROM h2r)
         |    ELSE 0 END::BIGINT AS hub FROM h2r),
         |hosts AS (SELECT host,
         |    CAST(('0x' || substr(md5(host),1,15)) AS UBIGINT)::BIGINT AS node
         |  FROM (SELECT src_host AS host FROM e0
         |        UNION SELECT dst_host FROM e0))
         |SELECT hosts.host, h2.hub, a2.auth
         |FROM hosts JOIN h2 USING (node) JOIN a2 USING (node)
         |ORDER BY auth DESC, host ASC""".stripMargin,


    // the window DEFINITION of graft_topk's bounded heap: row_number
    // over (revenue DESC, zero-padded key ASC), rank <= 3
    "q277_topk_per_nation" ->
      """WITH rev AS (
        |  SELECT n_name, c_custkey,
        |    CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
        |  FROM lineitem
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |r AS (SELECT n_name, c_custkey, revenue,
        |    row_number() OVER (PARTITION BY n_name
        |      ORDER BY revenue DESC,
        |        lpad(c_custkey::VARCHAR, 8, '0') ASC) AS rk
        |  FROM rev)
        |SELECT n_name, rk::BIGINT AS rank, c_custkey, revenue
        |FROM r WHERE rk <= 3
        |ORDER BY n_name, rank""".stripMargin,


    // Q19 shape: OR-of-conjunctions join residual, one row out
    "q276_disjunctive_band_join" ->
      """SELECT
        | CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 50
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,


    // resize replay: the q224 closed form pushed through the box
    // filter — every output pixel is the floor mean of its 2x2 block,
    // generated per (oy, ox, dy, dx) and aggregated per channel.
    "q264_bmp_resize_stats" ->
      """WITH d AS (SELECT doc_id, (doc_id % 8 + 2)::BIGINT AS w,
        |    ((doc_id * 3) % 8 + 2)::BIGINT AS h
        |  FROM documents WHERE doc_id % 7 = 0),
        |o AS (SELECT doc_id, w, h, w // 2 AS ow, h // 2 AS oh FROM d),
        |cells AS (
        |  SELECT o.doc_id, oy.x AS oy, ox.x AS ox,
        |    (sum((o.doc_id*7 + (oy.x*2 + dy.x)*3 + (ox.x*2 + dx.x))
        |      % 256) // 4)::INT AS b,
        |    (sum((o.doc_id*11 + (oy.x*2 + dy.x)*5 + (ox.x*2 + dx.x)*2)
        |      % 256) // 4)::INT AS g,
        |    (sum((o.doc_id*13 + (oy.x*2 + dy.x)*7 + (ox.x*2 + dx.x)*3)
        |      % 256) // 4)::INT AS r
        |  FROM o, range(0, 4) oy(x), range(0, 4) ox(x),
        |       range(0, 2) dy(x), range(0, 2) dx(x)
        |  WHERE oy.x < o.oh AND ox.x < o.ow
        |  GROUP BY 1, 2, 3),
        |st AS (SELECT doc_id, count(*)::BIGINT AS n_px,
        |    min(b)::INT AS b_min, max(b)::INT AS b_max,
        |    sum(b)::BIGINT AS b_sum,
        |    min(g)::INT AS g_min, max(g)::INT AS g_max,
        |    sum(g)::BIGINT AS g_sum,
        |    min(r)::INT AS r_min, max(r)::INT AS r_max,
        |    sum(r)::BIGINT AS r_sum
        |  FROM cells GROUP BY 1)
        |SELECT o.doc_id, o.w, o.h, o.ow, o.oh, st.n_px,
        |  st.b_min, st.b_max, st.b_sum, st.g_min, st.g_max, st.g_sum,
        |  st.r_min, st.r_max, st.r_sum
        |FROM o JOIN st USING (doc_id)
        |ORDER BY o.doc_id""".stripMargin,


    // CM inner-product replay: q231's exact bucket layout on both
    // keys, per-depth-row dot products, min — against the exact
    // keyed-count join.
    "q263_cms_join_size" ->
      """WITH ka AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
        |kb AS (SELECT CAST(o_custkey AS VARCHAR) AS key FROM orders),
        |ga AS (
        |  SELECT r.d,
        |    CAST(CAST(('0x' || substr(md5(key), 8 * r.d + 1, 8))
        |      AS UBIGINT) % 256 AS BIGINT) AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM ka CROSS JOIN range(4) r(d) GROUP BY 1, 2),
        |gb AS (
        |  SELECT r.d,
        |    CAST(CAST(('0x' || substr(md5(key), 8 * r.d + 1, 8))
        |      AS UBIGINT) % 256 AS BIGINT) AS bucket,
        |    count(*)::BIGINT AS cnt
        |  FROM kb CROSS JOIN range(4) r(d) GROUP BY 1, 2),
        |dots AS (
        |  SELECT ga.d, sum(ga.cnt * gb.cnt)::BIGINT AS dot
        |  FROM ga JOIN gb ON ga.d = gb.d AND ga.bucket = gb.bucket
        |  GROUP BY 1),
        |est AS (SELECT min(dot)::BIGINT AS est_join_size FROM dots),
        |truth AS (
        |  SELECT coalesce(sum(na * nb), 0)::BIGINT AS true_join_size
        |  FROM (SELECT key, count(*)::BIGINT AS na FROM ka GROUP BY 1) a
        |  JOIN (SELECT key, count(*)::BIGINT AS nb FROM kb GROUP BY 1) b
        |    USING (key))
        |SELECT est_join_size, true_join_size,
        |  CASE WHEN true_join_size > 0 THEN
        |    round(CAST(est_join_size AS DOUBLE)
        |      / CAST(true_join_size AS DOUBLE), 4) END
        |    AS overestimate_ratio
        |FROM est CROSS JOIN truth""".stripMargin,


    // weighted-quantile replay: identical distinct-value collapse,
    // BIGINT cumulative fold, q*W threshold on exact operands.
    "q261_weighted_quantiles" -> {
      val bpeish =
        """len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))"""
      def pick(q: String, name: String) =
        s"""min(CASE WHEN CAST(cw AS DOUBLE) >= $q * CAST(tw AS DOUBLE)
           |    THEN v END) AS $name""".stripMargin
      s"""WITH vw AS (
         |  SELECT source, n_chars::BIGINT AS v,
         |    sum($bpeish::BIGINT)::BIGINT AS w
         |  FROM documents
         |  WHERE n_chars IS NOT NULL AND $bpeish > 0
         |  GROUP BY 1, 2),
         |cum AS (
         |  SELECT source, v,
         |    sum(w) OVER (PARTITION BY source ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
         |      AS cw,
         |    sum(w) OVER (PARTITION BY source)::BIGINT AS tw
         |  FROM vw)
         |SELECT source, max(tw) AS total_w,
         |  ${pick("0.25", "wq_25")},
         |  ${pick("0.5", "wq_50")},
         |  ${pick("0.75", "wq_75")},
         |  ${pick("0.9", "wq_90")}
         |FROM cum GROUP BY source ORDER BY source""".stripMargin
    },


    // MMR replay: the 10 greedy rounds unrolled — each round the
    // remaining candidates' 6dp max-sim to the selected set, the same
    // lambda*score - (1.0-lambda)*msim tree, argmax with id tie-break.
    "q262_mmr_rerank" -> {
      // every CTE MATERIALIZED: inlined CTEs re-evaluate per reference,
      // and each selR is referenced 3x by round R+1 — unmaterialized,
      // the 10-round ladder explodes 3^9-fold
      val rounds = (2 to 10).map { r =>
        s"""m$r AS MATERIALIZED (
           |  SELECT c2.id,
           |    max(round(list_cosine_similarity(c2.vec, s.vec), 6))
           |      AS msim
           |  FROM cand c2, cand s
           |  WHERE s.id IN (SELECT id FROM sel${r - 1})
           |    AND c2.id NOT IN (SELECT id FROM sel${r - 1})
           |  GROUP BY c2.id),
           |s$r AS MATERIALIZED (
           |  SELECT $r::BIGINT AS rank, c.id,
           |    round(0.7 * c.score - (1.0 - 0.7) * m.msim, 6) AS mmr
           |  FROM cand c JOIN m$r m ON c.id = m.id
           |  ORDER BY mmr DESC, c.id LIMIT 1),
           |sel$r AS MATERIALIZED (SELECT * FROM sel${r - 1}
           |          UNION ALL SELECT * FROM s$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH cand AS MATERIALIZED (
         |  SELECT vec_id AS id,
         |    round(list_cosine_similarity(embedding::DOUBLE[], q.qv), 6)
         |      AS score,
         |    embedding::DOUBLE[] AS vec
         |  FROM embeddings, (SELECT embedding::DOUBLE[] AS qv
         |    FROM embeddings WHERE vec_id = 0) q
         |  WHERE vec_id <> 0
         |  ORDER BY score DESC, id LIMIT 50),
         |s1 AS MATERIALIZED (SELECT 1::BIGINT AS rank, id,
         |    round(0.7 * score, 6) AS mmr
         |  FROM cand ORDER BY mmr DESC, id LIMIT 1),
         |sel1 AS MATERIALIZED (SELECT * FROM s1),
         |$rounds
         |SELECT rank, id, mmr FROM sel10 ORDER BY rank""".stripMargin
    },


    // LPA replay: q220's exact pair CTE, then the three synchronous
    // rounds unrolled (the q218 PageRank-unroll discipline) — weighted
    // neighbor-label argmax with (ws DESC, label ASC) row_number.
    "q260_label_propagation" -> {
      def round(i: Int) =
        s"""c$i AS (SELECT sym.dst AS node, l${i - 1}.label,
           |  sum(sym.w)::BIGINT AS ws
           |  FROM sym JOIN l${i - 1} ON l${i - 1}.node = sym.src
           |  GROUP BY 1, 2),
           |l$i AS (SELECT node, label FROM (
           |  SELECT node, label, row_number() OVER (PARTITION BY node
           |    ORDER BY ws DESC, label ASC) AS rk
           |  FROM c$i) WHERE rk = 1)""".stripMargin
      s"""WITH e0 AS (
         |  SELECT a.l_partkey::BIGINT AS u, b.l_partkey::BIGINT AS v,
         |    count(*)::BIGINT AS w
         |  FROM lineitem a JOIN lineitem b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |sym AS (SELECT u AS src, v AS dst, w FROM e0
         |        UNION ALL SELECT v, u, w FROM e0),
         |l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT label, count(*)::BIGINT AS n_nodes FROM l3
         |GROUP BY 1 ORDER BY label""".stripMargin
    },


    // overlap join replay: the bin machinery is engine-internal — the
    // oracle states the DEFINITION (range predicates over sessions x
    // generated windows), which the bin-expansion plan must reproduce.
    "q259_interval_join_sessions" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |marked AS (SELECT user_id, us,
        |  CASE WHEN lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |      IS NULL
        |    OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |      >= 1800000000
        |  THEN 1 ELSE 0 END AS new_session FROM ev),
        |sess0 AS (SELECT user_id, us,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY us
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked),
        |sess AS (SELECT user_id, sid, min(us) AS s_us, max(us) AS e_us
        |  FROM sess0 GROUP BY 1, 2),
        |bounds AS (SELECT min(us) AS lo, max(us) AS hi FROM ev),
        |wins AS (SELECT w0, w0 + 7199999999 AS w1 FROM (
        |  SELECT unnest(generate_series(
        |    lo // 86400000000 * 86400000000,
        |    hi // 86400000000 * 86400000000,
        |    86400000000)) AS w0 FROM bounds)),
        |pairs AS (SELECT user_id, w0 FROM sess JOIN wins
        |  ON sess.s_us <= wins.w1 AND wins.w0 <= sess.e_us)
        |SELECT w0, count(*)::BIGINT AS n_sessions,
        |  count(DISTINCT user_id)::BIGINT AS n_users
        |FROM pairs GROUP BY 1 ORDER BY w0""".stripMargin,
  )
}
