package etlmudah.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join builders (SURVEY.md §2.3) for the star schema testdata.
  *
  * Design-for-scale notes:
  *  - Dimension tables (nation 25 rows, region 5 rows, and at any realistic
  *    scale factor supplier/part stay orders-of-magnitude below the facts)
  *    are joined with an explicit `broadcast()` hint so the plan is a
  *    BroadcastHashJoin — zero shuffle of the fact side.
  *  - Fact-to-fact joins (lineitem ⋈ orders) are left to Catalyst: with AQE
  *    enabled it picks shuffled hash / sort-merge by size; both sides
  *    shuffle-partition on the join key only once.
  *
  * Reference provenance: the upsert key-join of dags/dag.py:250-266 (J1),
  * the geo/dimension enrichment joins of streamlit/pages/regional_analysis.py:76-95
  * and streamlit/utils/constants.py:2-24 (J2/J3) — re-shaped onto the
  * TPC-H-ish harness tables.
  */
object Joins {

  /** lineitem ⋈ orders ⋈ customer ⋈ nation: the engine's flagship star.
    * nation is broadcast; customer is small relative to the facts but can
    * exceed broadcast thresholds at large SF, so it is joined normally and
    * AQE decides (at sf<=0.1 it auto-broadcasts under the 10 MB default).
    */
  def lineitemStar(lineitem: DataFrame, orders: DataFrame,
                   customer: DataFrame, nation: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))

  /** customer ⋈ nation ⋈ region: dimension enrichment (J2/J3). */
  def customerGeo(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))

  /** Skew-resistant equi-join: salt the skewed (left) side's key into
    * `saltFactor` sub-keys and explode the build (right) side across all
    * salts, so one hot key's rows spread over `saltFactor` tasks instead
    * of melting a single reducer. Use when AQE's skew-join split isn't
    * available/enough (e.g. a single key holding >1 partition budget at
    * 100 TB). Cost: right side replicated x saltFactor — keep it the
    * smaller input. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltFactor)).cast("int"))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    // left-outer is salt-safe too: every right key is replicated across
    // ALL salts, so a left row matches iff the key exists — unmatched
    // rows null-pad exactly as in the unsalted join
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Join-key skew report — the diagnostic run BEFORE reaching for
    * `saltedJoin` or AQE skew splits: the `topK` hottest keys with
    * their row counts, share of the table, and multiple-of-the-average
    * (`x_avg`; a key at x_avg >> shuffle-partition count is the one
    * that melts a reducer). One map-side-combined count aggregate +
    * a broadcast one-row total + a TakeOrderedAndProject of k rows —
    * no global sort, nothing driver-side. */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__tot"),
      count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(tot))
      .select(col(keyCol), col("cnt"),
        round(col("cnt") * 100.0 / col("__tot"), 6).as("share_pct"),
        round(col("cnt").cast("double") * col("__nkeys") / col("__tot"), 6)
          .as("x_avg"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** Referential-integrity (FK coverage) check: how many child rows
    * reference a key actually present in the parent — null FKs, orphan
    * rows, and the coverage ratio. The data-quality gate run after
    * every load. Parent side reduces to its DISTINCT key before the
    * join (|parent keys| rows, never the parent table); one equi-join
    * + one aggregate, both partial-aggregated. */
  def fkCoverage(child: DataFrame, parent: DataFrame,
                 childKey: String, parentKey: String): DataFrame = {
    val p = parent.select(col(parentKey).as("__pk")).distinct()
    child.select(col(childKey).as("__fk"))
      .join(p, col("__fk") === col("__pk"), "left")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("__fk").isNull, 1)).as("n_null_fk"),
        count(when(col("__fk").isNotNull && col("__pk").isNull, 1))
          .as("n_orphans"),
        round(count(col("__pk")).cast("double") / count(lit(1)), 6)
          .as("coverage"))
  }

  /** INTERVAL OVERLAP join on a non-negative integer axis (epoch
    * micros, positions): every (left, right) pair whose closed
    * intervals intersect — lStart <= rEnd AND rStart <= lEnd. The
    * temporal/range join shape Spark has no native operator for, and
    * whose naive forms are a BroadcastNestedLoopJoin (quadratic scan)
    * or a theta-join Catalyst cannot hash.
    *
    * Scale-correct BIN EXPANSION form (the standard overlap-join
    * technique in interval libraries and geospatial range joins):
    * each interval explodes to the fixed-width bins it covers
    * (integral `div`, exact on the integer axis — no float boundary),
    * candidates meet by bin EQUI-join, the true-overlap residual
    * filters false bin neighbors, and each pair is emitted EXACTLY
    * ONCE at the FIRST bin both intervals share
    * (bin == greatest(firstBin_l, firstBin_r)) — no global dedup pass.
    *
    * Fan-out dial: rows explode to ceil(length/binWidth) bins — size
    * `binWidth` near the typical interval length (too small → bin
    * explosion; too large → few giant bins and the residual filter
    * does the work). Column names of the two inputs must be disjoint;
    * rows with null or inverted bounds drop. */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   lStart: String, lEnd: String,
                   rStart: String, rEnd: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def binned(df: DataFrame, s: String, e: String, b0: String,
               bin: String) = df
      .where(col(s).isNotNull && col(e).isNotNull && col(s) <= col(e))
      .withColumn(b0, expr(s"$s div ${binWidth}L"))
      .withColumn(bin,
        explode(sequence(col(b0), expr(s"$e div ${binWidth}L"))))
    val l = binned(left, lStart, lEnd, "__lb0", "__bin")
    val r = binned(right, rStart, rEnd, "__rb0", "__bin")
    l.join(r, Seq("__bin"))
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(col("__lb0"), col("__rb0")))
      .select((left.columns ++ right.columns).map(col): _*)
  }

  /** AS-OF join: for each left row, the single most recent right row with
    * the same key and right.ts <= left.ts (inclusive) — last-touch
    * attribution, point-in-time feature lookup, slowly-changing-dimension
    * reads.
    *
    * Spark has no native as-of join; the naive forms are a per-row
    * correlated subquery (not plannable) or a range join + row_number
    * (shuffles |matches| rows, quadratic for long histories). This is the
    * scale-correct UNION + SORTED WINDOW form: tag both inputs, union,
    * and take a running `last(..., ignoreNulls)` of the right payload
    * over (key, ts, side) — ONE shuffle of |left| + |right| rows total,
    * each row carried exactly once regardless of history length. Right
    * rows order before left rows at equal ts, giving the inclusive <=
    * semantics of DuckDB/kdb ASOF. Unmatched left rows keep null payload
    * (left-outer semantics).
    *
    * `payload` maps right-side columns to their output names (which must
    * not collide with left column names). Rows with null key or ts on
    * either side are dropped (no meaningful as-of position).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payload: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val leftCols = left.columns.toSeq
    val rTagged = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol) +: col(tsCol) +:
        payload.map { case (c, out) => col(c).as(out) }: _*)
      .withColumn("__side", lit(0))
    val lTagged = payload.foldLeft(
      left.filter(col(keyCol).isNotNull && col(tsCol).isNotNull)) {
      case (df, (_, out)) => df.withColumn(out, lit(null))
    }.withColumn("__side", lit(1))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged, allowMissingColumns = true)
      .select((col(keyCol) +: col(tsCol) +: col("__side") +:
        (leftCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
          payload.map { case (_, out) => last(col(out), ignoreNulls = true).over(w).as(out) })): _*)
      .filter(col("__side") === 1)
      .select((leftCols ++ payload.map(_._2)).map(col): _*)
  }

  /** Band join (J4/F5): equi-keys plus a bounded numeric residual, e.g.
    * "same brand, size within ±tolerance". Spark plans the equi-part as a
    * hash join and evaluates the band predicate as a post-join filter, so
    * the cost is |pairs within equi-buckets|, never a full cross product.
    */
  def bandJoin(left: DataFrame, right: DataFrame,
               equiKeys: Seq[(String, String)],
               bandCol: (String, String), tolerance: Double): DataFrame = {
    val equi = equiKeys.map { case (l, r) => left(l) === right(r) }
    val band = abs(left(bandCol._1) - right(bandCol._2)) <= tolerance
    left.join(right, (equi :+ band).reduce(_ && _))
  }

  /** Blocked fuzzy record linkage: candidate pairs come from an
    * EQUI-join on a cheap blocking key (first name token here — the
    * census-linkage classic), then the native `graft_jaro_winkler`
    * expression refines each candidate and pairs at or above `minSim`
    * survive. Returns (id_a, id_b, name_a, name_b, jw_sim) with
    * id_a < id_b, ordered
    * (sim DESC, id_a, id_b); jw_sim is rounded to 6 decimals BEFORE the
    * threshold so the cross-engine oracle (DuckDB's own
    * `jaro_winkler_similarity`, same blocking SQL) keeps the identical
    * row set — a 1-ulp engine difference cannot flip a comparison
    * against the rounded value except exactly at a rounding midpoint.
    *
    * Scale shape: the block join is an equi hash join — |block|²
    * candidates per block, NEVER corpus-quadratic — and the JW refine
    * is a codegen'd per-row expression on the joined stream. Blocks
    * larger than `maxBlockSize` are dropped whole (mirrored in the
    * oracle): a blocking key shared by a giant fraction of the corpus
    * carries no linkage signal, and the cap bounds per-block fan-out by
    * construction — the same absolute-cap discipline as the winnow
    * tier's `maxDf`. Dropped mass is observable: run `skewReport` on
    * the blocking key to see what the cap excluded.
    *
    * Link DISTINCT entities: pre-aggregate exact duplicates to a
    * canonical id first (collapsing exact dupes is the exact-dedup
    * tier's job) — linking raw rows re-compares every identical name
    * pair, |dup-class|² times the work for zero information. */
  /** Great-circle distance in km (haversine, R = 6371): the geo-join
    * primitive under nearest-dim-fetch / radius-gate shapes (S13's
    * distance leg). A pure codegen'd trig chain per row — both
    * engines evaluate the identical expression tree, and callers
    * round the result (3dp ~ meter precision) so a last-ulp libm
    * difference cannot flip a value. */
  def haversineKm(lat1: Column, lon1: Column,
                  lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** Blocked EDIT-DISTANCE record linkage — [[fuzzyLinkPairs]]'s
    * Levenshtein sibling for typo-class matching (JW favors shared
    * prefixes; edit distance counts actual keystrokes). Same
    * first-token blocking and block-size cap; two pruning tiers the
    * JW metric cannot offer run BEFORE the O(n·m) DP: the length
    * lower bound (|len_a − len_b| ≤ maxDist — a cheap codegen'd
    * comparison that kills most candidates) and the engine's
    * threshold-bounded `levenshtein(a, b, maxDist)` (banded DP that
    * abandons a pair the moment its distance exceeds the cap,
    * returning −1). Both engines implement classic Levenshtein, so
    * the distances — and the row set — replay exactly. */
  def editLinkPairs(df: DataFrame, idCol: String, nameCol: String,
                    maxDist: Int, maxBlockSize: Long = 10000L): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      split(col(nameCol), " ").getItem(0).as("block"))
    val small = keyed.join(
      keyed.groupBy("block").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBlockSize).select("block"),
      Seq("block"))
    val a = small.select(col("block"), col("id").as("id_a"), col("name").as("name_a"))
    val b = small.select(col("block"), col("id").as("id_b"), col("name").as("name_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .filter(abs(length(col("name_a")) - length(col("name_b"))) <= maxDist)
      .withColumn("edit_dist",
        levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("edit_dist").cast("long").as("edit_dist"))
      .orderBy(col("edit_dist"), col("id_a"), col("id_b"))
  }

  def fuzzyLinkPairs(df: DataFrame, idCol: String, nameCol: String,
                     minSim: Double, maxBlockSize: Long = 10000L): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      split(col(nameCol), " ").getItem(0).as("block"))
    val small = keyed.join(
      keyed.groupBy("block").agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBlockSize).select("block"),
      Seq("block"))
    val a = small.select(col("block"), col("id").as("id_a"), col("name").as("name_a"))
    val b = small.select(col("block"), col("id").as("id_b"), col("name").as("name_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jw_sim",
        round(call_function("graft_jaro_winkler", col("name_a"), col("name_b")), 6))
      .filter(col("jw_sim") >= minSim)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("jw_sim"))
      .orderBy(desc("jw_sim"), col("id_a"), col("id_b"))
  }
}
