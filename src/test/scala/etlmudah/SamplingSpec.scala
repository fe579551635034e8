package etlmudah.scale

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001).select("doc_id", "lang")
  private val bounds = Seq(("train", 0.8), ("val", 0.9), ("test", 1.0))

  test("hashSplit: labels partition the corpus, proportions near bounds") {
    val split = Sampling.hashSplit(docs, "doc_id", bounds)
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == docs.count())
    assert(counts.keySet.subsetOf(Set("train", "val", "test")))
    // 500 docs: binomial noise ~2%; just sanity-band the 80/10/10
    assert(counts("train") > 350 && counts("train") < 450, counts.toString)
    assert(counts("val") > 20 && counts("test") > 20, counts.toString)
  }

  test("hashSplit: membership is a function of the key alone (stable under corpus growth)") {
    val full = Sampling.hashSplit(docs, "doc_id", bounds)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val subset = Sampling.hashSplit(docs.filter(col("doc_id") < 100), "doc_id", bounds)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(subset.nonEmpty)
    subset.foreach { case (id, s) => assert(full(id) == s) }
  }

  test("hashSplit: different salts decorrelate") {
    val a = Sampling.hashSplit(docs, "doc_id", bounds, salt = "a")
      .filter(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSplit(docs, "doc_id", bounds, salt = "b")
      .filter(col("split") === "train").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a != b)
    // overlap ~ 0.8*0.8 of corpus, not ~0.8 (which correlation would give)
    val overlap = a.intersect(b).size.toDouble / docs.count()
    assert(overlap > 0.5 && overlap < 0.75, overlap.toString)
  }

  test("packIntoBins: bins hold ~capacity tokens, overflow bounded by one doc") {
    val sized = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        etlmudah.text.TextStats.tokenCount(col("text")).as("n_tokens"))
    val packed = Sampling.packIntoBins(sized, "doc_id", "n_tokens",
      capacity = 256L, buckets = 4)
    // every doc assigned exactly once
    assert(packed.count() == sized.count())
    val bins = packed.groupBy("bucket", "bin")
      .agg(sum(col("n_tokens")).as("t"), max(col("n_tokens")).as("m"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // a bin exceeds capacity only by (part of) its last doc: t < cap + m
    bins.foreach { case (t, m, _) => assert(t < 256L + m, s"t=$t m=$m") }
    // non-final bins are at least half full on this data (sanity, not a
    // tight bound: next-fit-by-cumsum wastes at most one doc per cut)
    assert(bins.count(_._1 >= 128L) >= bins.length / 2)
    // deterministic
    assert(packed.collect().toSeq ==
      Sampling.packIntoBins(sized, "doc_id", "n_tokens", 256L, 4).collect().toSeq)
  }

  test("stratifiedSample: per-stratum fractions, deterministic, subset of input") {
    val fr = Map("en" -> 1.0, "de" -> 0.5, "zh" -> 0.0)
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang", fr,
      defaultFraction = 0.25)
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang", fr,
      defaultFraction = 0.25)
    assert(s1.collect().toSeq == s2.collect().toSeq)
    val kept = s1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") == orig("en"))          // fraction 1.0 keeps all
    assert(!kept.contains("zh"))              // fraction 0.0 drops all
    val deRatio = kept("de").toDouble / orig("de")
    assert(deRatio > 0.3 && deRatio < 0.7, deRatio.toString)
  }

  test("temperatureSample: flattens the mixture toward uniform, deterministic") {
    val t1 = Sampling.temperatureSample(docs, "doc_id", "lang",
      alpha = 0.5, targetTotal = 200)
    val t2 = Sampling.temperatureSample(docs, "doc_id", "lang",
      alpha = 0.5, targetTotal = 200)
    assert(t1.collect().toSeq.sortBy(_.getAs[Long]("doc_id")) ==
      t2.collect().toSeq.sortBy(_.getAs[Long]("doc_id")))
    // the operator must not permute the input's column order
    assert(t1.columns.toSeq == docs.columns.toSeq)
    val kept = t1.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val orig = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // temperature sampling narrows the head/tail spread: the kept share
    // of the rarest stratum must exceed the kept share of the commonest
    val maxLang = orig.maxBy(_._2)._1
    val minLang = orig.minBy(_._2)._1
    val shareMax = kept.getOrElse(maxLang, 0L).toDouble / orig(maxLang)
    val shareMin = kept.getOrElse(minLang, 0L).toDouble / orig(minLang)
    assert(shareMin >= shareMax,
      s"rare stratum share $shareMin < common stratum share $shareMax")
    // total lands near the target (binomial noise at n=200)
    val total = kept.values.sum
    assert(total > 140 && total < 260, total.toString)
  }

  test("tokenBudgetSample: per-stratum totals near budget, overshoot <= one doc") {
    val sized = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"),
        etlmudah.text.TextStats.tokenCount(col("text")).as("n_tokens"))
    val kept = Sampling.tokenBudgetSample(sized, "doc_id", "lang",
      "n_tokens", budget = 1500L)
    val stats = kept.groupBy("lang")
      .agg(sum(col("n_tokens")).as("t"), max(col("n_tokens")).as("m"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.nonEmpty)
    // total stays under budget + (part of) the straddling doc
    stats.foreach { case (lang, t, m) =>
      assert(t < 1500L + m, s"$lang t=$t m=$m")
    }
    // each stratum actually uses its budget (corpus has plenty of tokens)
    stats.foreach { case (lang, t, _) => assert(t >= 1500L / 2, s"$lang t=$t") }
    // deterministic
    val again = Sampling.tokenBudgetSample(sized, "doc_id", "lang",
      "n_tokens", budget = 1500L)
    assert(kept.collect().toSeq.sortBy(_.getAs[Long]("doc_id")) ==
      again.collect().toSeq.sortBy(_.getAs[Long]("doc_id")))
    // membership is the stratum's uniform-order prefix: every kept doc's
    // exclusive running total is under budget, every dropped doc's is not
    assert(kept.count() < sized.count())
  }

  test("temperatureSample: alpha=1 keeps natural proportions (uniform global rate)") {
    val orig = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Sampling.temperatureSample(docs, "doc_id", "lang",
        alpha = 1.0, targetTotal = 250)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=1: every stratum gets the same keep fraction (here 0.5), so
    // per-stratum keep ratios concentrate around it
    orig.foreach { case (lang, n) =>
      val ratio = kept.getOrElse(lang, 0L).toDouble / n
      assert(ratio > 0.25 && ratio < 0.75, s"$lang ratio $ratio")
    }
  }

  test("capPerStratum: count quota per stratum, deterministic, column order kept") {
    val full = Tables.documents(spark, sf0001)
    val capped = Sampling.capPerStratum(full, "doc_id", "source", cap = 7,
      salt = "t")
    val per = capped.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // 25 docs per source at sf0.001: every source saturates the cap
    assert(per.length == 20 && per.forall(_._2 == 7L), per.toSeq.toString)
    val ids = capped.select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.capPerStratum(full, "doc_id", "source", cap = 7,
      salt = "t").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == again)
    assert(capped.columns.toSeq == full.columns.toSeq)
  }

  test("weightedSample: matches a local replay of the A-Res key exactly") {
    val sized = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    val got = Sampling.weightedSample(sized, "doc_id", "n_chars", k = 25,
      salt = "t").select("doc_id").collect().map(_.getLong(0)).toSet
    // local replay of the identical md5-uniform + ln(u)/w + 12-dp key
    val expect = sized.collect().map { r =>
      val (id, w) = (r.getLong(0), r.getLong(1))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + "t").getBytes("UTF-8"))
      val u32 = md.take(4).map(b => (b & 0xff).toLong)
        .foldLeft(0L)((acc, b) => (acc << 8) | b)
      val u = math.max(u32.toDouble / 4294967296.0, 1e-12)
      val key = BigDecimal(math.log(u) / w)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, key)
    }.sortBy { case (id, key) => (-key, id) }.take(25).map(_._1).toSet
    assert(got == expect)
  }

  test("mixturePlan: shares sum to 1, epochs realize the target, clamp at 1") {
    val sized = Tables.documents(spark, sf0001)
    val plan = Sampling.mixturePlan(sized, "source", "n_chars",
      Map("src0" -> 0.5, "src1" -> 0.25), budget = 100000L,
      defaultWeight = 0.0125).collect()
    assert(plan.length == sized.select("source").distinct().count())
    val shares = plan.map(_.getAs[Double]("natural_share")).sum
    assert(math.abs(shares - 1.0) < 1e-3, s"shares=$shares")
    plan.foreach { r =>
      val tokens = r.getAs[Long]("tokens")
      val epochs = r.getAs[Double]("epochs")
      val target = r.getAs[Double]("target_tokens")
      assert(math.abs(epochs * tokens - target) <= tokens * 1e-4,
        s"epochs*tokens=$target mismatch on ${r.getAs[String]("source")}")
      assert(r.getAs[Double]("sampling_fraction") <= 1.0)
      assert(r.getAs[Double]("sampling_fraction") == math.min(epochs, 1.0))
    }
  }

  test("shardAssign: matches a local single-order cumsum replay; shards contiguous") {
    val sized = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    val budget = 5000L
    val got = Sampling.shardAssign(sized, "doc_id", "n_chars", budget,
        buckets = 7)
      .select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    val expect = sized.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).map { case (id, n) =>
        val shard = cum / budget; cum += n; (id, shard)
      }.toMap
    assert(got == expect)
    // shard ids are dense from 0
    val ids = got.values.toSet
    assert(ids == (0L until ids.size).toSet, ids.toString)
  }

  test("shardAssign: every shard but the last stops within one doc of budget") {
    val sized = Tables.documents(spark, sf0001).select("doc_id", "n_chars")
    val budget = 5000L
    val assigned = Sampling.shardAssign(sized, "doc_id", "n_chars", budget)
    val perShard = assigned.groupBy("shard")
      .agg(sum("n_chars").as("chars"), max("n_chars").as("biggest"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val maxDoc = sized.agg(max("n_chars")).head().getLong(0)
    perShard.dropRight(1).foreach { case (id, chars, _) =>
      // a shard closes only once cumsum crosses the budget, so it holds
      // at least budget - (its last doc could start just under it)
      assert(chars <= budget + maxDoc, s"shard $id chars=$chars")
      assert(chars + maxDoc >= budget, s"shard $id underfull: $chars")
    }
  }

  test("bottomQuantileDrop: per-stratum kept = n - floor(q*n), worst rows gone") {
    val sized = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val kept = Sampling.bottomQuantileDrop(sized, "n_chars", "doc_id",
      "source", q = 0.2)
    val n = sized.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nKept = kept.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (src, total) =>
      assert(nKept.getOrElse(src, 0L) ==
        total - math.floor(0.2 * total).toLong, src)
    }
    // survivors' min >= dropped max is false in general (ties), but the
    // dropped set must be exactly the rank-lowest per stratum: replay
    val local = sized.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._3, r._1))
        sorted.drop(math.floor(0.2 * rows.length).toInt).toSeq
      }.map(_._1).toSet
    val got = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == local)
  }

  test("leakageSafeSplit: cluster members co-assigned, loners keep their own label") {
    import spark.implicits._
    val ids = Tables.documents(spark, sf0001).select("doc_id")
    // synthetic dup families: {1,2,3} and {10,11}; everything else solo
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.leakageSafeSplit(ids, "doc_id", bounds, clusters)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getString(2))).toMap
    // one label per family
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size == 1)
    assert(out(10L)._2 == out(11L)._2)
    // loners carry the plain hashSplit label
    val own = Sampling.hashSplit(ids, "doc_id", bounds).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(_._2._1.isEmpty).foreach { case (id, (_, s)) =>
      assert(s == own(id), s"doc $id")
    }
    // family label IS the head's own label
    assert(out(1L)._2 == own(1L) && out(10L)._2 == own(10L))
  }

  test("kFold: folds partition the corpus, assignment stable under subsetting") {
    val ids = Tables.documents(spark, sf0001).select("doc_id")
    val folds = Sampling.kFold(ids, "doc_id", k = 5, salt = "t")
    val byFold = folds.groupBy("fold").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byFold.keySet.subsetOf((0 until 5).toSet))
    assert(byFold.values.sum == ids.count())
    // ~100 docs/fold at 500 docs; just sanity-band
    byFold.values.foreach(n => assert(n > 50 && n < 160, byFold.toString))
    // growth-stability: the subset sees identical assignments
    val full = folds.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    Sampling.kFold(ids.filter(col("doc_id") < 100), "doc_id", 5, "t")
      .collect().foreach(r => assert(full(r.getLong(0)) == r.getInt(1)))
  }

  test("weightedCapPerStratum: matches a local replay of per-stratum A-Res top-k") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "n_chars")
    val got = Sampling.weightedCapPerStratum(docs, "doc_id", "lang",
      "n_chars", cap = 5, salt = "t").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expect = docs.collect().map { r =>
      val (id, lang, w) = (r.getLong(0), r.getString(1), r.getLong(2))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest((id.toString + "t").getBytes("UTF-8"))
      val u32 = md.take(4).map(b => (b & 0xff).toLong)
        .foldLeft(0L)((acc, b) => (acc << 8) | b)
      val u = math.max(u32.toDouble / 4294967296.0, 1e-12)
      val key = BigDecimal(math.log(u) / w)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      (lang, id, key)
    }.groupBy(_._1).values.flatMap(rows =>
      rows.sortBy(r => (-r._3, r._2)).take(5)).map(_._2).toSet
    assert(got == expect)
  }

  test("bottomQuantileDrop: q=0 keeps everything") {
    val sized = Tables.documents(spark, sf0001).select("doc_id", "source")
      .withColumn("s", col("doc_id") % 7)
    assert(Sampling.bottomQuantileDrop(sized, "s", "doc_id", "source", 0.0)
      .count() == sized.count())
  }

  test("packSequences: matches a serial replay; full packs exact, spans tile each doc") {
    import spark.implicits._
    val ctx = 7L
    // sizes exercise every case: straddling docs, a doc spanning >2
    // packs (20 > 2*7), an exact-boundary doc, and zero-size drops
    val docs = Seq((1L, 3L), (2L, 5L), (3L, 0L), (4L, 20L), (5L, 7L),
      (6L, 1L), (7L, 6L)).toDF("id", "tok")
    val got = Sampling.packSequences(docs, "id", "tok", ctx, buckets = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    // serial replay: walk the docs in id order, cut at every ctx tokens
    val sizes = Seq((1L, 3L), (2L, 5L), (4L, 20L), (5L, 7L), (6L, 1L),
      (7L, 6L))
    var cursor = 0L
    val expect = sizes.flatMap { case (id, tok) =>
      val spans = (cursor until cursor + tok).groupBy(_ / ctx).toSeq
        .sortBy(_._1).map { case (p, toks) =>
          (id, p, toks.min - cursor, toks.size.toLong)
        }
      cursor += tok
      spans
    }
    assert(got == expect)
    // invariants: token conservation, every non-final pack exactly ctx
    val totalTok = sizes.map(_._2).sum
    assert(got.map(_._4).sum == totalTok)
    val perPack = got.groupBy(_._2).map { case (p, g) => p -> g.map(_._4).sum }
    val lastPack = perPack.keys.max
    assert(perPack.filter(_._1 != lastPack).values.forall(_ == ctx))
    // spans tile each doc: offsets start at 0 and are contiguous
    got.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._3 + a._4 == b._3)
        case _ =>
      }
    }
  }

  test("clusterBalancedSample: per-cluster cap holds, assignment matches the portable tier, ranks are contiguous") {
    val emb = Tables.embeddings(spark, sf0001)
    val rows = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        nlist = 4, perCluster = 5, salt = "t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    assert(byCluster.values.forall(_.length <= 5))
    // at sf0.001 (50 vectors / 4 clusters) at least one cluster must cap
    assert(byCluster.values.exists(_.length == 5))
    // kept rows carry exactly the portable tier's assignment
    val assign = Similarity.ivfAssignPortable(emb, "vec_id", "embedding",
        nlist = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (v, c, _) => assert(assign(v) == c) }
    // pick_rank is 1..n within each cluster
    byCluster.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq) }
  }

  test("clusterBalancedSample: degenerate-quantizer rehearsal — nlist=1 pushes everything through one cluster and the cap still holds exactly") {
    val emb = Tables.embeddings(spark, sf0001)
    val total = emb.count()
    val rows = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        nlist = 1, perCluster = 7, salt = "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(total > 7, "fixture must exceed the cap")
    assert(rows.length == 7)
    assert(rows.map(_._2).distinct.length == 1)
    assert(rows.map(_._3).sorted.toSeq == (1L to 7L).toSeq)
  }

  test("epochPlan: hand-checkable water-filling, cap semantics, budget conservation, degenerate budgets") {
    import spark.implicits._
    // A: 10 tokens w=4 (cap 20); B: 100 tokens w=1 (cap 200); budget 60
    // -> A saturates (alloc 20), B gets the remaining 40 (0.4 epochs)
    val docs = (Seq.fill(10)("A") ++ Seq.fill(100)("B")).zipWithIndex
      .map { case (s0, i) => (i.toLong, s0, 1L) }
      .toDF("doc_id", "src", "n_tok")
    def plan(budget: Long, maxE: Int) =
      Sampling.epochPlan(docs, "src", "n_tok",
          Map("A" -> 4L, "B" -> 1L), budget, maxEpochs = maxE)
        .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(5),
          r.getLong(6), r.getDouble(7)))
    val p60 = plan(60L, 2)
    assert(p60.toSeq == Seq(("A", 10L, true, 20L, 2.0),
      ("B", 100L, false, 40L, 0.4)), p60.toSeq.toString)
    // budget beyond all caps: everything saturates at exactly maxEpochs
    val pBig = plan(100000L, 2)
    assert(pBig.forall(t => t._3 && t._4 == t._2 * 2 && t._5 == 2.0))
    // zero budget: nothing allocated, nothing saturated
    val p0 = plan(0L, 2)
    assert(p0.forall(t => !t._3 && t._4 == 0L && t._5 == 0.0))
    // conservation: allocations never exceed the budget
    assert(p60.map(_._4).sum <= 60L)
  }

  test("poissonLaneWeight: JVM md5-lane replay; empirical mean ~ 1 (the bootstrap contract)") {
    import spark.implicits._
    // 500 keys x 8 lanes = 4000 draws off 500 hashes
    val keys = (0 until 500).map(i => s"k$i#0")
    val got = keys.toDF("k")
      .select(col("k") +: (0 until 8).map(l =>
        Sampling.poissonLaneWeight(
          conv(substring(md5(col("k").cast("binary")), l * 4 + 1, 4),
            16, 10).cast("long")).as(s"w$l")): _*)
      .collect().map(r => r.getString(0) ->
        (1 to 8).map(r.getLong(_))).toMap
    keys.foreach { k =>
      val hex = etlmudah.expr.CountMinSketchAgg.md5Hex(k)
      (0 until 8).foreach { l =>
        val lane = java.lang.Long.parseLong(
          hex.substring(l * 4, l * 4 + 4), 16)
        val want = Sampling.poissonThresholds16.count(lane >= _).toLong
        assert(got(k)(l) == want, s"$k lane $l")
      }
    }
    val all = got.values.flatten
    val mean = all.sum.toDouble / all.size
    assert(math.abs(mean - 1.0) < 0.05, s"Poisson(1) mean drifted: $mean")
    assert(all.max <= 8L && all.min == 0L)
  }

  test("bootstrapMeanCi: full serial replay on a small frame; partition-invariant") {
    import spark.implicits._
    val rows = (1 to 50).map(i => (i.toLong, (i * 37 % 100) + 0.25))
    val df = rows.toDF("id", "v")
    val reps = 60
    val got = Sampling.bootstrapMeanCi(df, "id", "v", reps).collect()(0)
    val got2 = Sampling.bootstrapMeanCi(df.repartition(7), "id", "v", reps)
      .collect()(0)
    assert(got == got2, "resampling must be partition-invariant")
    // serial replay: exact decimal folds, double division, nearest rank
    def weight(id: Long, rep: Int): Long = {
      val hex = etlmudah.expr.CountMinSketchAgg.md5Hex(s"$id#${rep / 8}")
      val l = rep % 8
      val lane = java.lang.Long.parseLong(
        hex.substring(l * 4, l * 4 + 4), 16)
      Sampling.poissonThresholds16.count(lane >= _).toLong
    }
    val mus = (0 until reps).map { rep =>
      val (num, den) = rows.foldLeft((0L, 0L)) {
        case ((n, d), (id, v)) =>
          val w = weight(id, rep)
          val cents = BigDecimal.valueOf(v * 100)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue
          (n + cents * w, d + w)
      }
      (num.toDouble / (100.0 * den.toDouble), rep)
    }.sortBy(identity)
    val rnLo = math.ceil(0.025 * reps).toInt
    val rnHi = math.ceil(0.975 * reps).toInt
    def r6(d: Double) = BigDecimal.valueOf(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 50L)
    assert(got.getDouble(2) == r6(mus(rnLo - 1)._1), "ci_lo")
    assert(got.getDouble(3) == r6(mus(rnHi - 1)._1), "ci_hi")
    assert(got.getDouble(2) <= got.getDouble(1) &&
      got.getDouble(1) <= got.getDouble(3),
      "the point estimate sits inside its own bootstrap CI")
  }

  test("rendezvousShard: minimal-movement invariant on reshard, JVM argmax replay") {
    import spark.implicits._
    val keys = (0L until 2000L).toDF("k")
    val assigned = keys.select(col("k"),
        Sampling.rendezvousShard(col("k"), 8).as("s8"),
        Sampling.rendezvousShard(col("k"), 9).as("s9"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // THE rendezvous property: on 8 -> 9 a key stays or moves to the
    // NEW shard 8 — never laterally between survivors
    assert(assigned.forall { case (_, s8, s9) => s9 == s8 || s9 == 8L })
    val moved = assigned.count { case (_, s8, s9) => s9 != s8 }
    // expected ~ 2000/9 ≈ 222; generous deterministic bounds
    assert(moved > 100 && moved < 400, s"moved=$moved")
    // all 8 old shards used; assignment matches a serial argmax replay
    assert(assigned.map(_._2).distinct.sorted.toSeq == (0L until 8L))
    def serial(k: Long, n: Int): Long =
      (0 until n).maxBy(s =>
        etlmudah.expr.CountMinSketchAgg.md5Hex(s"$k:$s")).toLong
    assigned.take(50).foreach { case (k, s8, s9) =>
      assert(s8 == serial(k, 8) && s9 == serial(k, 9), s"k=$k")
    }
    // n = 1 is total: everything on shard 0
    val one = keys.select(Sampling.rendezvousShard(col("k"), 1).as("s"))
      .distinct().collect()
    assert(one.length == 1 && one.head.getLong(0) == 0L)
  }
}
