package etlmudah

import graft.SparkSpec
import org.apache.spark.sql.functions._

import etlmudah.analytics.Analytics
import etlmudah.expr.Exprs
import etlmudah.load.Upsert
import etlmudah.scale.{Dedup, Sampling}
import etlmudah.text.TextStats

/** Empty-input and degenerate-value behavior of the core operators —
  * the surface where Spark 4's default ANSI mode turns silent pandas
  * NaNs into hard job failures. Every operator here must return a
  * well-formed (possibly empty) result, never throw. */
class EdgeCasesSpec extends SparkSpec {

  import spark.implicits._

  private def emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private def emptySales = Seq.empty[(String, Double)].toDF("k", "v")

  test("aggregation operators return empty/zero-row results on empty input") {
    assert(Analytics.statsBy(emptySales, col("k"), "k", col("v")).count() == 0)
    assert(Analytics.freqTable(emptySales, "k").count() == 0)
    assert(Analytics.topKByCount(emptySales, "k", 5).count() == 0)
    assert(Analytics.histogram(emptySales, col("v"), 10.0).count() == 0)
    assert(Analytics.quartilesBy(emptySales, "k", col("v")).count() == 0)
    assert(Analytics.shareOfTotal(emptySales, "k").count() == 0)
    assert(Analytics.distinctDomain(emptySales, "k").count() == 0)
  }

  test("headlineMetrics on empty input: one row of nulls/zero count, no throw") {
    val r = Analytics.headlineMetrics(emptySales, "v").collect().head
    assert(r.getLong(r.fieldIndex("n")) == 0L)
  }

  test("dedup operators tolerate empty corpora") {
    assert(Dedup.exactDedup(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.nearDupPairs(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.simhashNearDups(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.crossCorpusNearDups(emptyDocs, emptyDocs, "text", "doc_id")
      .count() == 0)
    assert(Dedup.segmentDedup(emptyDocs, "text", "doc_id").count() == 0)
    val emptySrc = emptyDocs.withColumn("source", lit("s"))
    assert(Dedup.sourceOverlap(emptySrc, "text", "doc_id", "source")
      .count() == 0)
    assert(Dedup.boilerplateShingles(emptySrc, "text", "doc_id", "source")
      .count() == 0)
    assert(TextStats.lexicalDivergence(emptySrc, "text", "doc_id", "source")
      .count() == 0)
  }

  test("winnowScreenAgainstRef: empty sides, self-screen, and sub-threshold sharing") {
    import spark.implicits._
    val fps = Dedup.winnowFingerprints(
      Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
          (2L, "one two three four five six seven eight"))
        .toDF("doc_id", "text"), "text", "doc_id")
    val none = Dedup.winnowFingerprints(emptyDocs, "text", "doc_id")
    // empty reference / empty arriving side: empty result, no throw
    assert(Dedup.winnowScreenAgainstRef(fps, none).count() == 0)
    assert(Dedup.winnowScreenAgainstRef(none, fps).count() == 0)
    // self-screen: every doc matches itself with all its fingerprints
    val self = Dedup.winnowScreenAgainstRef(fps, fps, minShared = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(self.contains((1L, 1L)) && self.contains((2L, 2L)))
    assert(!self.contains((1L, 2L)), self.toString) // disjoint texts
    // minShared above any overlap: empty verdict, never a throw
    assert(Dedup.winnowScreenAgainstRef(fps, fps, minShared = 1000L)
      .count() == 0)
  }

  test("text operators on empty and whitespace-only strings") {
    val weird = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b c d"))
      .toDF("doc_id", "text")
    // per-row expression forms: no ANSI divide-by-zero, no crash
    val r = weird.select(
      TextStats.tokenCount(col("text")).as("n"),
      TextStats.stopwordRatio(col("text"), Seq("a")).as("sr"),
      TextStats.qualityScore(col("text"), Seq("a")).as("q"),
      TextStats.fingerprint(col("text")).as("fp")).collect()
    assert(r.length == 4)
    assert(r.forall(row => !row.isNullAt(1) && !row.isNullAt(2)))
    // explode-form profile keeps every non-null doc (empty split -> [""]
    // is one token)
    val prof = TextStats.docTokenProfile(weird, "text", "doc_id",
      Seq("a"), Seq("en" -> Seq("a")))
    assert(prof.count() == 4)
    // shingles of sub-n docs fall back to the whole token string
    assert(Dedup.shingleRows(weird, "text", "doc_id", 3).count() > 0)
  }

  test("stripBoilerplate on empty/whitespace/degenerate corpora") {
    // empty corpus: empty output, no throw
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.stripBoilerplate(empty, "text", "doc_id").count() == 0)
    // empty/whitespace/short docs: every row survives untouched
    // (no n-gram exists, so nothing can be covered)
    val weird = Seq((1L, ""), (2L, "   "), (3L, "one"), (4L, "a b"))
      .toDF("doc_id", "text")
    val out = Dedup.stripBoilerplate(weird, "text", "doc_id",
        shingleN = 3, minDf = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(out.map(_._1) == Set(1L, 2L, 3L, 4L))
    assert(out.forall(_._3 == 0L), out.toString)
    // minDf = 1 drops EVERY gram: all long-enough docs empty out, rows kept
    val all = Seq((1L, "x y z w"), (2L, "p q r"))
      .toDF("doc_id", "text")
    val stripped = Dedup.stripBoilerplate(all, "text", "doc_id",
        shingleN = 3, minDf = 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    assert(stripped == Set((1L, "", 4L), (2L, "", 3L)))
  }

  test("upsert with an empty batch or empty base is the other side") {
    val base = Seq((1L, "a", 1L), (2L, "b", 1L)).toDF("id", "v", "batch_ts")
    val none = Seq.empty[(Long, String, Long)].toDF("id", "v", "batch_ts")
    val keepBase = Upsert.upsert(base, none, Seq("id"), Seq(col("batch_ts").desc))
    assert(keepBase.select("id", "v").collect().toSet ==
      base.select("id", "v").collect().toSet)
    val fromBatch = Upsert.upsert(none, base, Seq("id"), Seq(col("batch_ts").desc))
    assert(fromBatch.count() == 2)
  }

  test("partial upsert with empty batch keeps the base; empty base inserts the batch") {
    val base = Seq((1L, "a", "keep", 1L), (2L, "b", "keep", 1L))
      .toDF("id", "v", "extra", "batch_ts")
    val none = Seq.empty[(Long, String, String, Long)]
      .toDF("id", "v", "extra", "batch_ts")
    val keep = Upsert.upsert(base, none, Seq("id"),
      Seq(col("batch_ts").desc), Seq("v", "batch_ts"))
    assert(keep.collect().toSet == base.collect().toSet)
    val ins = Upsert.upsert(none, base, Seq("id"),
      Seq(col("batch_ts").desc), Seq("v", "batch_ts"))
    assert(ins.collect().toSet == base.collect().toSet)
  }

  test("new round-4 operators tolerate empty input") {
    // quantileBuckets: no rows -> null boundaries -> no buckets, no throw
    val emptyVals = Seq.empty[Option[Double]].toDF("v")
    assert(Analytics.quantileBuckets(emptyVals, col("v"), 4).count() == 0)
    // tokenBudgetSample / dupSurvivorsBy on empty frames
    val emptySized = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "lang", "n_tokens")
    assert(Sampling.tokenBudgetSample(emptySized, "doc_id", "lang",
      "n_tokens", 100L).count() == 0)
    val emptyPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val clusters = Dedup.dupClusters(emptyPairs)
    assert(clusters.count() == 0)
    val scores = Seq((1L, 2L)).toDF("doc_id", "score")
    assert(Dedup.dupSurvivorsBy(clusters, scores, "doc_id", "score").count() == 0)
  }

  test("round-12 operators tolerate empty and degenerate input") {
    import etlmudah.graph.Centrality
    import etlmudah.analytics.Analytics
    val noEdges = Seq.empty[(Long, Long)].toDF("u", "v")
    // graph family on empty/self-loop-only graphs: empty, no throw
    assert(Centrality.coreness(noEdges).count() == 0)
    assert(Centrality.corenessHIndex(noEdges).count() == 0)
    assert(Centrality.kCoreAdaptive(noEdges, 3).count() == 0)
    assert(Centrality.kTruss(noEdges, 3).count() == 0)
    val selfOnly = Seq((1L, 1L), (2L, 2L)).toDF("u", "v")
    assert(Centrality.coreness(selfOnly).count() == 0)
    assert(Centrality.kTruss(selfOnly, 3).count() == 0)
    // one edge: both nodes coreness 1, adaptive serves k=1, truss empty
    val one = Seq((1L, 2L)).toDF("u", "v")
    assert(Centrality.coreness(one).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 1L, 2L -> 1L))
    assert(Centrality.kCoreAdaptive(one, 3).collect()
      .map(_.getLong(2)).toSeq == Seq(1L, 1L))
    assert(Centrality.kTruss(one, 3).count() == 0)
    // concentration dials on tiny frames: single entity, uniform ties
    val solo = Seq((1L, 10.0)).toDF("id", "v")
    val gs = Analytics.giniCoefficientBucketed(solo, "id", col("v"), 4)
      .collect()(0)
    assert(gs.getLong(0) == 1L && gs.getDouble(2) == 0.0)
    val ties = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("id", "v")
    assert(Analytics.giniCoefficientBucketed(ties, "id", col("v"), 8)
      .collect()(0).getDouble(2) == 0.0)
    assert(Analytics.lorenzBinned(ties, "id", col("v"), 10).count() >= 1)
  }

  test("round-13 operators tolerate empty and degenerate input") {
    import etlmudah.graph.Centrality
    import etlmudah.expr.{GifFn, JpegFn, Mp3L1Fn}
    val noEdges = Seq.empty[(Long, Long)].toDF("u", "v")
    val selfOnly = Seq((1L, 1L), (2L, 2L)).toDF("u", "v")
    val one = Seq((1L, 2L)).toDF("u", "v")
    // oriented truss on empty/self-loop/single-edge graphs: empty
    assert(Centrality.kTrussOriented(noEdges, 3).count() == 0)
    assert(Centrality.kTrussOriented(selfOnly, 3).count() == 0)
    assert(Centrality.kTrussOriented(one, 3).count() == 0)
    // a lone triangle survives k=3 with support 1 on every edge
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    assert(Centrality.kTrussOriented(tri, 3).collect()
      .map(_.getLong(2)).toSeq == Seq(1L, 1L, 1L))
    // degenerate media: 1x1 images through every new synth/decode
    assert(JpegFn.stats(JpegFn.synth420(0L, 1, 1, 1), 16) != null)
    assert(GifFn.stats(GifFn.synthInterlaced(0L, 1, 1), 16) != null)
    val anim1 = GifFn.synthAnim(0L, 1, 1, 1)
    assert(GifFn.animMeta(anim1, 16).getLong(2) == 1L)
    assert(GifFn.frameStats(anim1, 0, 16) != null)
    // single Layer I frame, and the smallest nontrivial restart grid
    assert(Mp3L1Fn.stats(Mp3L1Fn.synth(0L, 1), 4096) != null)
    assert(JpegFn.stats(JpegFn.synth420(3L, 17, 17, 1), 4096) != null)
    // late-session tiers: 1x1 through every layout, depth, frame
    // count, byte order and compression mode
    import etlmudah.expr.{PngFn, TiffFn}
    for (ct <- Seq(0L, 2L, 3L, 4L, 6L))
      assert(PngFn.stats(PngFn.synthTyped(0L, 1, 1, ct), 16) != null)
    for (ct <- Seq(0L, 2L, 4L, 6L))
      assert(PngFn.stats(PngFn.synth16(0L, 1, 1, ct), 16) != null)
    val ap1 = PngFn.synthApng(0L, 1, 1, 1)
    assert(PngFn.apngMeta(ap1, 16).getLong(2) == 1L)
    assert(PngFn.apngFrameStats(ap1, 0, 16) != null)
    for (mode <- 0L to 5L)
      assert(TiffFn.stats(TiffFn.synth(0L, 1, 1, mode), 16) != null)
  }

  test("this session's operators tolerate empty and degenerate input") {
    import etlmudah.analytics.Events
    import java.sql.Timestamp
    val emptyEvents = Seq.empty[(Long, Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    // cohort/rolling/funnel/anomaly on an empty log: empty, no throw
    assert(Events.cohortRetention(emptyEvents, "ts", "user_id").count() == 0)
    assert(Events.rollingActive(emptyEvents, "ts", "user_id").count() == 0)
    val fu = Events.funnel(emptyEvents, "ts", "user_id", "event_type",
      Seq("view", "click")).collect()
    assert(fu.length == 2 && fu.forall(_.getLong(2) == 0L))
    assert(Analytics.anomalyZ(emptyEvents, "ts", "event_type").count() == 0)
    // text ops: empty corpus -> empty reports, no divide-by-zero
    val ed = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextStats.tokenEntropy(ed, "text", "doc_id", "source").count() == 0)
    assert(TextStats.bigramScore(ed, "text", "doc_id", "source").count() == 0)
    assert(TextStats.collocations(ed, "text", "doc_id").count() == 0)
    assert(TextStats.vocabCoverage(ed, "text", "doc_id", "source").count() == 0)
    // single-token docs: bigram scoring has no transitions -> empty
    val one = Seq((1L, "solo", "s")).toDF("doc_id", "text", "source")
    assert(TextStats.bigramScore(one, "text", "doc_id", "source").count() == 0)
    // round-5 operators: empty corpus -> empty result, no throw
    assert(TextStats.bm25(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.minhashPortablePairs(emptyDocs, "text", "doc_id").count() == 0)
    // single doc: no pair, bm25 still scores (avgdl = own length)
    val soloDoc = Seq((1L, "alpha beta alpha")).toDF("doc_id", "text")
    assert(Dedup.minhashPortablePairs(soloDoc, "text", "doc_id").count() == 0)
    val soloBm = TextStats.bm25(soloDoc, "text", "doc_id").collect()
    assert(soloBm.length == 2 && soloBm.forall(_.getDouble(3) > 0))
    // normalization ladder: empty corpus still yields its 4 level rows
    // (one aggregate row with n=0) and the dup_pct share must not
    // DIVIDE_BY_ZERO under ANSI mode
    val ladder = Dedup.normalizationLadder(emptyDocs, "text", "doc_id").collect()
    assert(ladder.length == 4)
    assert(ladder.forall(r => r.getLong(2) == 0L && r.getDouble(5) == 0.0))
    // prefix Jaccard: empty corpus and a corpus with no qualifying pair
    assert(Dedup.prefixJaccardPairs(emptyDocs, "text", "doc_id").count() == 0)
    val solo = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    assert(Dedup.prefixJaccardPairs(solo, "text", "doc_id").count() == 0)
    // proportionCI: zero successes and all successes stay inside [0,100]
    val allFail = Seq(("g", 0), ("g", 0)).toDF("k", "ok")
    val lo = Analytics.proportionCI(allFail, "k", col("ok") === 1)
      .collect().head
    assert(lo.getDouble(3) == 0.0 && lo.getDouble(4) >= 0.0)
  }

  test("round-7 operators tolerate empty and degenerate input") {
    // portable cross tiers: empty on either side -> no pairs, no throw
    val solo = Seq((2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    assert(Dedup.minhashPortableCrossPairs(emptyDocs, solo,
      "text", "doc_id").count() == 0)
    assert(Dedup.minhashPortableCrossPairs(solo, emptyDocs,
      "text", "doc_id").count() == 0)
    // dup-span strip: empty corpus empty; sub-k and unique docs intact
    assert(Dedup.stripDupSpans(emptyDocs, "text", "doc_id").count() == 0)
    val short = Seq((1L, "tiny doc")).toDF("doc_id", "text")
    val sRow = Dedup.stripDupSpans(short, "text", "doc_id").collect().head
    assert(sRow.getString(1) == "tiny doc" && sRow.getLong(3) == 0L)
    // sequence packing: empty input -> no spans; all-zero sizes vanish
    val emptySized = Seq.empty[(Long, Long)].toDF("id", "tok")
    assert(Sampling.packSequences(emptySized, "id", "tok", 8L).count() == 0)
    val zeros = Seq((1L, 0L), (2L, 0L)).toDF("id", "tok")
    assert(Sampling.packSequences(zeros, "id", "tok", 8L).count() == 0)
    // a single doc smaller than ctx -> exactly one partial span
    val tiny = Seq((7L, 3L)).toDF("id", "tok")
    val span = Sampling.packSequences(tiny, "id", "tok", 8L).collect()
    assert(span.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))) == Seq((7L, 0L, 0L, 3L)))
    // BPE: empty corpus -> empty merge table; single repeated char
    // corpus learns its one merge then stops early
    assert(TextStats.bpeMerges(emptyDocs, "text").count() == 0)
    val aa = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    val m = TextStats.bpeMerges(aa, "text", nMerges = 5).collect()
    assert(m.length == 1 &&
      m.head.getString(1) == "a" && m.head.getString(2) == "a")
    // BPE encode with an empty merge list is character segmentation;
    // segment report on an empty corpus is empty
    val enc = TextStats.bpeEncodeWords(Seq("ab").toDF("w"), Nil).collect()
    assert(enc.head.getSeq[String](1) == Seq("a", "b"))
    val edSrc = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(TextStats.bpeSegmentReport(edSrc, "text", "source", Nil).count() == 0)
    // portable IVF assignment: corpus smaller than nlist still assigns
    // every vector (to itself among the <= nlist centroids)
    import etlmudah.scale.Similarity
    val twoVecs = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val asg = Similarity.ivfAssignPortable(twoVecs, "vec_id", "embedding",
      nlist = 8).collect()
    assert(asg.length == 2 && asg.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("winnowing and portable SemDeDup tolerate empty and degenerate input") {
    import etlmudah.scale.Similarity
    // empty corpus -> no fingerprints, no pairs, no throw
    assert(Dedup.winnowFingerprints(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.winnowSharedPairs(emptyDocs, "text", "doc_id").count() == 0)
    // a whitespace-only doc has one (empty) token < k -> no fingerprints
    val blank = Seq((1L, "   ")).toDF("doc_id", "text")
    assert(Dedup.winnowFingerprints(blank, "text", "doc_id").count() == 0)
    // a doc of exactly k tokens yields exactly one fingerprint at pos 0
    val exact = Seq((1L, "x y z")).toDF("doc_id", "text")
    val one = Dedup.winnowFingerprints(exact, "text", "doc_id").collect()
    assert(one.length == 1 && one.head.getInt(1) == 0)
    // identical twin docs pair through every selected fingerprint
    val twins = Seq((1L, "p q r s t u v w"), (2L, "p q r s t u v w"))
      .toDF("doc_id", "text")
    val tp = Dedup.winnowSharedPairs(twins, "text", "doc_id",
      minShared = 1L).collect()
    assert(tp.length == 1 && tp.head.getLong(0) == 1L)
    // portable SemDeDup: empty corpus empty; a single vector never drops
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.semanticDedupPortable(noVecs, "vec_id", "embedding",
      simThreshold = 0.3).count() == 0)
    val oneVec = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    assert(Similarity.semanticDedupPortable(oneVec, "vec_id", "embedding",
      simThreshold = 0.3).count() == 0)
  }

  test("rank-profile and tf-idf cosine tiers tolerate empty and degenerate input") {
    import etlmudah.text.TextStats
    val emptyLabeled = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    assert(TextStats.rankProfileClassify(emptyLabeled, "text", "doc_id",
      "source").count() == 0)
    // a single doc/class self-classifies at distance 0; a doc under 3
    // chars has no trigram and drops out without throwing
    val solo = Seq((1L, "alpha beta gamma", "A"), (2L, "ab", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextStats.rankProfileClassify(solo, "text", "doc_id", "source")
      .collect()
    assert(out.length == 1 && out.head.getLong(0) == 1L &&
      out.head.getString(2) == "A" && out.head.getLong(3) == 0L)
    assert(TextStats.tfidfCosinePairs(emptyDocs, "text", "doc_id")
      .count() == 0)
    // a lone document can never pair
    assert(TextStats.tfidfCosinePairs(
      Seq((1L, "only doc here")).toDF("doc_id", "text"),
      "text", "doc_id").count() == 0)
  }

  test("curation/export operators tolerate empty and zero-size input") {
    import etlmudah.analytics.{Events, Profile}
    import java.sql.Timestamp
    val emptySized = Seq.empty[(Long, String, Long)]
      .toDF("doc_id", "source", "n_chars")
    // mixture plan: empty corpus -> empty plan; zero-size stratum ->
    // null epochs/share, never an ANSI DIVIDE_BY_ZERO
    assert(Sampling.mixturePlan(emptySized, "source", "n_chars",
      Map("a" -> 1.0), 100L).count() == 0)
    val zeroStratum = Seq((1L, "z", 0L), (2L, "z", 0L))
      .toDF("doc_id", "source", "n_chars")
    val zp = Sampling.mixturePlan(zeroStratum, "source", "n_chars",
      Map("z" -> 1.0), 100L).collect().head
    assert(zp.isNullAt(zp.fieldIndex("epochs")) &&
      zp.isNullAt(zp.fieldIndex("natural_share")))
    // shard assignment / quantile drop / weighted cap / kfold on empty
    assert(Sampling.shardAssign(emptySized, "doc_id", "n_chars", 100L)
      .count() == 0)
    assert(Sampling.bottomQuantileDrop(emptySized, "n_chars", "doc_id",
      "source", 0.5).count() == 0)
    assert(Sampling.weightedCapPerStratum(emptySized, "doc_id", "source",
      "n_chars", 5).count() == 0)
    assert(Sampling.kFold(emptySized, "doc_id", 5).count() == 0)
    assert(Sampling.leakageSafeSplit(emptySized, "doc_id",
      Seq(("train", 1.0)),
      Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")).count() == 0)
    // PSI: both sides empty -> empty; one side empty -> eps-clamped
    // shares, no DIVIDE_BY_ZERO
    val emptyV = Seq.empty[Double].toDF("v")
    val someV = Seq(1.0, 2.0).toDF("v")
    assert(Profile.driftPsi(emptyV, emptyV, "v", 10.0).count() == 0)
    val oneSided = Profile.driftPsi(emptyV, someV, "v", 10.0).collect().head
    assert(oneSided.getDouble(3) == 1e-6 && oneSided.getDouble(4) == 1.0)
    // containment pairs / transition matrix on empty input
    assert(Dedup.containmentPairs(emptyDocs, "text", "doc_id").count() == 0)
    val emptyEv = Seq.empty[(Long, Long, String, Timestamp)]
      .toDF("event_id", "user_id", "event_type", "ts")
    assert(Events.transitionMatrix(emptyEv, "ts", "user_id", "event_type",
      "event_id").count() == 0)
    // schema diff of a frame with itself: all unchanged
    assert(Profile.schemaDiff(emptySized, emptySized).collect()
      .forall(_.getString(1) == "unchanged"))
  }

  test("round-8 operators tolerate empty and degenerate input") {
    import etlmudah.scale.Similarity
    import etlmudah.web.Web
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // fuzzy refine: empty corpus, single doc (no pairs)
    assert(Dedup.editSimilarityPairs(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.editSimilarityPairs(Seq((1L, "only one doc here"))
      .toDF("doc_id", "text"), "text", "doc_id").count() == 0)
    // web: empty corpus; hosts with no scheme fall into the '' domain
    assert(Web.domainStats(Seq.empty[(Long, String, String)]
      .toDF("id", "url", "text"), "url", "text").count() == 0)
    val junk = Web.domainStats(Seq((1L, "not a url", "some text"))
      .toDF("id", "url", "text"), "url", "text").collect()
    assert(junk.length == 1 && junk.head.getString(0) == "")
    // cleanText on pure garbage collapses to the empty string
    val cleaned = Seq("\u0001\u0002", "   ").toDF("t")
      .select(TextStats.cleanText(col("t")).as("c"))
      .collect().map(_.getString(0))
    assert(cleaned.forall(_ == ""))
    // PQ: corpus SMALLER than the codebook (limit under-fills) and
    // smaller than nprobe — both must degrade, not throw
    val tiny = Seq(
      (1L, Array.fill(16)(0.25f)),
      (2L, Array.fill(16)(-0.5f)),
      (3L, Array.tabulate(16)(i => i * 0.01f))).toDF("vec_id", "embedding")
    val enc = Similarity.pqEncodePortable(tiny, "vec_id", "embedding",
      m = 4, codes = 16, dims = 16)
    assert(enc.count() == 3 * 4)   // 3 codes exist; every vector encodes
    val adc = Similarity.pqAdcTopK(tiny, "vec_id", "embedding",
      nprobe = 5, k = 10, m = 4, codes = 16, dims = 16)
    assert(adc.count() == 3 * 3)   // 3 probes x 3 ranked vectors
    assert(Similarity.pqEncodePortable(emptyVecs, "vec_id", "embedding",
      m = 4, codes = 16, dims = 16).count() == 0)
    val ivfpq = Similarity.ivfPqTopK(tiny, "vec_id", "embedding",
      nlist = 8, nprobeLists = 2, nprobe = 2, k = 5, m = 4, codes = 16,
      dims = 16)
    assert(ivfpq.count() > 0)
    // scorer: empty corpus and empty text
    assert(TextStats.hashedLinearScore(emptyDocs, "text", "doc_id")
      .count() == 0)
    val sc = TextStats.hashedLinearScore(Seq((1L, "")).toDF("doc_id", "text"),
      "text", "doc_id").collect()
    assert(sc.length == 1 && sc.head.getLong(1) == 1L)
  }

  test("round-8 web/media/export/train operators tolerate empty and degenerate input") {
    import etlmudah.web.Web
    import etlmudah.sinks.Writers
    import etlmudah.multimodal.Multimodal
    // htmlToText: empty, whitespace-only, entity-only, tag-only
    val h = Seq(("e", ""), ("w", "   "), ("t", "<p></p><div></div>"),
      ("a", "&amp;&lt;&gt;"))
      .toDF("id", "h")
      .select(col("id"), Web.htmlToText(col("h")).as("t"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(h("e") == "" && h("w") == "" && h("t") == "")
    assert(h("a") == "&<>")
    // metaRobots on empty input
    assert(Seq("").toDF("h").select(Web.metaRobots(col("h")))
      .collect().head.getString(0) == "")
    // blocklist tiers on an empty corpus
    assert(TextStats.blocklistScan(emptyDocs, "text", "doc_id",
      Seq("x")).count() == 0)
    assert(TextStats.blocklistScanLarge(emptyDocs, "text", "doc_id",
      Seq("x")).count() == 0)
    // shard manifest of an empty frame: zero rows, and the assigned-
    // frame manifest likewise
    val emptySized = Seq.empty[(Long, Long)].toDF("doc_id", "n_chars")
    assert(Writers.shardManifest(emptySized, "doc_id", "n_chars",
      100L).count() == 0)
    // oggMeta on empty binary
    val ogg = Seq(Array.empty[Byte]).toDF("m")
      .select(Multimodal.oggMeta(col("m")).as("x")).collect().head.getStruct(0)
    assert(ogg.getString(0) == "unknown")
    // LR training on a single-class corpus: still converges to finite
    // weights (all-zero gradient direction is fine), never throws
    val oneClass = Seq((1L, 1, "a b c"), (2L, 1, "a c d")).toDF("doc_id", "y", "text")
    val w = TextStats.trainHashedLogReg(oneClass, "text", "doc_id", "y",
      buckets = 4, steps = 2, lr = 0.1).collect()
    assert(w.length == 4 && w.forall(r => !r.isNullAt(1)))
    // and scoring with those weights stays total
    val wDf = TextStats.trainHashedLogReg(oneClass, "text", "doc_id", "y",
      buckets = 4, steps = 2, lr = 0.1)
    assert(TextStats.scoreWithWeights(oneClass, "text", "doc_id", wDf,
      buckets = 4).count() == 2)
  }

  test("sampling on empty input and clipUpper on all-null column") {
    assert(Sampling.hashSplit(emptyDocs, "doc_id",
      Seq(("train", 1.0))).count() == 0)
    val nulls = Seq.empty[Option[Double]].toDF("v")
      .union(Seq(Option.empty[Double], Option.empty[Double]).toDF("v"))
    val clipped = nulls.select(Exprs.clipUpper(col("v"), 5.0).as("c")).collect()
    assert(clipped.forall(_.isNullAt(0)))
  }

  test("round-8 session-2 operators tolerate empty and degenerate input") {
    import etlmudah.scale.{Sampling, Similarity}
    import etlmudah.analytics.Events
    val emptyVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    // triplets: empty corpus and a single doc both yield no triplets
    assert(Dedup.contrastiveTriplets(emptyDocs, "text", "doc_id").count() == 0)
    assert(Dedup.contrastiveTriplets(Seq((1L, "a b c d e"))
      .toDF("doc_id", "text"), "text", "doc_id").count() == 0)
    // recall curve: empty and single-doc corpora have no pairs -> no rows
    assert(Dedup.bandedRecallReport(emptyDocs, "text", "doc_id").count() == 0)
    // rank ensemble on empty input
    assert(TextStats.rankEnsemble(
      Seq.empty[(Long, String, Long)].toDF("doc_id", "src", "s"),
      "doc_id", "src", Seq("s")).count() == 0)
    // cluster-balanced sample / matryoshka / drift on empty embeddings
    assert(Sampling.clusterBalancedSample(emptyVecs, "vec_id", "embedding")
      .count() == 0)
    assert(Similarity.matryoshkaRecall(emptyVecs, "vec_id", "embedding",
      dPrime = 16).count() == 0)
    assert(Similarity.semanticDriftPsi(emptyVecs, emptyVecs,
      "vec_id", "embedding").count() == 0)
    // dPrime beyond the vector width degrades to the full-dim ranking
    val tiny = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, Array(0f, 1f)),
      (4L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val over = Similarity.matryoshkaRecall(tiny, "vec_id", "embedding",
      dPrime = 99, k = 2, nProbes = 2).collect()
    assert(over.nonEmpty && over.forall(_.getDouble(3) == 1.0))
    // mojibake: empty corpus (with the slice column present)
    assert(TextStats.mojibakeScan(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source"),
      "text", "doc_id", "source").count() == 0)
    // event paths: one event per user -> no complete path
    val lonely = Seq((1L, 1L, "a", java.sql.Timestamp.valueOf(
      "2024-01-01 00:00:01"))).toDF("event_id", "user_id", "et", "ts")
    assert(Events.eventPaths(lonely, "ts", "user_id", "et", "event_id")
      .count() == 0)
    // epoch plan: empty corpus -> empty plan; readability on empty text
    assert(Sampling.epochPlan(Seq.empty[(Long, String, Long)]
        .toDF("doc_id", "src", "n"), "src", "n", Map.empty, 1000L)
      .count() == 0)
    val fre = TextStats.readability(Seq((1L, "")).toDF("doc_id", "text"),
      "text", "doc_id").collect()
    assert(fre.length == 1 && fre.head.getLong(2) == 1L) // sentences floor
  }

  test("round-10 operators tolerate empty/degenerate input") {
    import etlmudah.scale.{Sketches, Spectral}
    import etlmudah.quality.Validate
    // CMS / HLL over nothing: zero grid, zero observed registers
    assert(Sketches.cmsSketch(emptySales, "k", 2, 8)
      .collect()(0).getSeq[Long](0).sum == 0L)
    val hll = Sketches.hllReport(emptySales, "k", 6).collect()(0)
    assert(hll.getLong(1) == 64L, "all 64 registers still zero")
    // PCA over nothing: a well-formed zero component, no ANSI throw
    val vecs = Seq.empty[Tuple1[Array[Float]]].toDF("vec")
    val comp = Spectral.pcaTopComponent(vecs, "vec", 4).collect()
    assert(comp.length == 4 && comp.forall(_.getLong(1) == 0L))
    // bootstrap over nothing: empty report, never a crash
    assert(Sampling.bootstrapMeanCi(emptySales, "k", "v", 40).count() == 0)
    // benford over nothing / all sub-1 values: empty report
    assert(Analytics.benfordReport(emptySales, "v").count() == 0)
    assert(Analytics.benfordReport(
      Seq(("a", 0.25)).toDF("k", "v"), "v").count() == 0)
    // linear fit needs >= 2 distinct x to have var_x > 0: degenerate
    // single-point input yields nulls (0/0 guarded by ANSI-safe
    // division semantics on doubles), not a throw
    val lf = Analytics.linearFit(
      Seq((1.0, 2.0)).toDF("x", "y"), "x", "y").collect()(0)
    assert(lf.getLong(0) == 1L)
    // validation over nothing: zero checked, rate 0.0, null witness
    val vr = Validate.report(emptySales, "k",
      rowRules = Seq(Validate.RowRule("v_pos", col("v") > 0)),
      uniqueRules = Seq(Validate.UniqueRule("k_unique", Seq("k"))))
      .collect()
    assert(vr.length == 2)
    vr.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L &&
        r.getDouble(4) == 0.0 && r.isNullAt(5), r.toString)
    }
  }
}
