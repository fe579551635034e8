package etlmudah.scale

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine: identity = 1, orthogonal = 0, zero vector = 0") {
    import spark.implicits._
    val df = Seq(
      (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
      (Array(1f, 0f), Array(0f, 1f)),
      (Array(0f, 0f), Array(1f, 1f))
    ).toDF("a", "b")
    val out = df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1) == 0.0 && out(2) == 0.0)
  }

  test("native graft_cosine expression is bit-identical to the HOF cosine") {
    val emb = Tables.embeddings(spark, sf0001).limit(100)
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("vb")))
      .filter(col("ia") < col("ib"))
    val diffs = pairs.select(
        Similarity.cosine(col("va"), col("vb")).as("hof"),
        Similarity.cosineFast(col("va"), col("vb")).as("native"))
      .filter(col("hof") =!= col("native"))
      .count()
    assert(diffs == 0)
    // and it resolves from SQL via the session extension
    emb.createOrReplaceTempView("emb_cos_test")
    val sqlVal = spark.sql(
      """SELECT graft_cosine(a.embedding, a.embedding) FROM emb_cos_test a
        | WHERE a.vec_id = 0""".stripMargin).collect().head.getDouble(0)
    assert(math.abs(sqlVal - 1.0) < 1e-12)
  }

  test("bruteForceTopK: k rows, descending, excludes the query row") {
    val emb = Tables.embeddings(spark, sf0001)
    val out = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10).collect()
    assert(out.length == 10)
    assert(!out.map(_.getLong(0)).contains(0L))
    val sims = out.map(_.getDouble(1))
    assert(sims.zip(sims.tail).forall { case (x, y) => x >= y })
  }

  test("ivfTopKAll: recall vs brute force on sf0.001") {
    val emb = Tables.embeddings(spark, sf0001)
    val k = 10
    val queries = Seq(0L, 7L, 42L, 99L)
    val ann = Similarity.ivfTopKAll(emb, "vec_id", "embedding", k,
        nlist = 8, nprobe = 4)
      .filter(col("qid").isin(queries: _*))
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = queries.map { q =>
      val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k)
        .collect().map(_.getLong(0)).toSet
      ann.getOrElse(q, Set.empty).intersect(truth).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    // nprobe/nlist = 1/2 of the corpus scanned; unclustered uniform
    // noise makes this the worst case — real embeddings cluster and
    // recall rises sharply with structure
    assert(mean >= 0.35, s"mean recall@$k = $mean (per-query: $recalls)")
  }

  test("embeddingNearDups: symmetric pairs above threshold, none below") {
    val emb = Tables.embeddings(spark, sf0001)
    val pairs = Similarity.embeddingNearDups(emb, "vec_id", "embedding",
      minCosine = 0.3).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
    assert(pairs.forall(_.getDouble(2) >= 0.3))
  }

  test("lshTopKAll: recall vs brute force on sf0.001") {
    val emb = Tables.embeddings(spark, sf0001)
    val k = 10
    val queries = Seq(0L, 7L, 42L, 99L)
    // testdata embeddings are unclustered uniform noise (top-10 cosine
    // ~0.3-0.48, i.e. ~65-72 deg), the hardest case for angular LSH —
    // widen buckets: 16 tables x 6 bits. Real embedding corpora have far
    // stronger neighbor structure and take more bits.
    val ann = Similarity.lshTopKAll(emb, "vec_id", "embedding", k,
        tables = 16, bits = 6)
      .filter(col("qid").isin(queries: _*))
      .select("qid", "nid").collect()
      .groupBy(_.getLong(0)).map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = queries.map { q =>
      val truth = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k)
        .collect().map(_.getLong(0)).toSet
      val got = ann.getOrElse(q, Set.empty)
      got.intersect(truth).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.35, s"mean recall@$k = $mean (per-query: $recalls)")
  }

  test("annRecallReport: per-method bounds; exhaustive LSH config hits recall 1") {
    val emb = Tables.embeddings(spark, sf0001)
    // bits = 0 would be degenerate; 1 bit x 16 tables makes buckets so
    // wide that candidates ~ corpus -> LSH recall must be exactly 1.0
    val report = Similarity.annRecallReport(emb, "vec_id", "embedding",
        k = 5, maxProbeId = 10L, tables = 16, bits = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(report.keySet == Set("lsh", "ivf"))
    val (nLsh, avgLsh, minLsh) = report("lsh")
    assert(nLsh == 10L && avgLsh == 1.0 && minLsh == 1.0)
    val (nIvf, avgIvf, minIvf) = report("ivf")
    assert(nIvf == 10L)
    assert(avgIvf >= minIvf && minIvf >= 0.0 && avgIvf <= 1.0)
  }

  test("quantizeInt8Report: error bounded by scale/2, q within [-127,127]") {
    val emb = etlmudah.Tables.embeddings(spark, sf0001)
    val rows = Similarity.quantizeInt8Report(emb, "vec_id", "embedding", "label")
      .collect()
    assert(rows.nonEmpty)
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val nVecs = emb.count()
    // every element of every vector is accounted for exactly once
    assert(rows.map(_.getLong(1)).sum == nVecs * dim)
    rows.foreach { r =>
      val (avgErr, maxErr, avgQ) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(avgErr >= 0 && maxErr >= avgErr, r.toString)
      // symmetric rounding: per-element error <= scale/2, and scale =
      // max|x|/127 <= ~max-norm/127; with unit-ish floats that is << 1
      assert(maxErr < 0.5, s"max_abs_err $maxErr")
      assert(avgQ >= 0 && avgQ <= 127, s"avg_abs_q $avgQ")
    }
  }

  test("kmeansRefine: full-corpus Lloyd rounds improve a starved quantizer") {
    import spark.implicits._
    // three well-separated axis blobs, deterministic jitter (no RNG);
    // a sampleCap of 3 starves the initial quantizer so refinement has
    // real work to do
    val blobs = (0 until 60).map { i =>
      val c = i % 3
      val jit = 0.05f * ((i * 37) % 10) / 10f
      val v = Array.fill(4)(jit)
      v(c) = 1.0f
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    def pooled(rounds: Int): Double = {
      val rows = Similarity.kmeansRefine(blobs, "vec_id", "embedding",
        nlist = 3, rounds = rounds, sampleCap = 3).collect()
      assert(rows.map(_.getLong(2)).sum == 60L)
      assert(rows.length <= 3 && rows.nonEmpty)
      rows.map(r => r.getLong(2) * r.getDouble(3)).sum / 60.0
    }
    val before = pooled(0)
    val after = pooled(4)
    // Lloyd is monotone-ish but only locally optimal: demand no
    // regression and a sane absolute level, not global optimality
    assert(after >= before - 1e-9, s"cohesion fell: $before -> $after")
    assert(after >= 0.5, s"refined pooled cohesion $after")
    // deterministic: same seed + data -> identical report
    assert(pooled(4) == after)
  }

  test("semanticDedup: precision, min-id survivor rule, determinism") {
    val emb = etlmudah.Tables.embeddings(spark, sf0001)
    val tau = 0.35
    val drops = Similarity.semanticDedup(emb, "vec_id", "embedding",
      simThreshold = tau, nlist = 8).collect()
    assert(drops.nonEmpty)
    // survivor rule: kept_by is always an earlier id
    drops.foreach(r => assert(r.getLong(1) < r.getLong(0), r.toString))
    // precision: every reported (vec_id, kept_by) really sits at/above
    // the threshold, and max_cos matches a recompute
    val byId = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    drops.foreach { r =>
      val c = cos(byId(r.getLong(0)), byId(r.getLong(1)))
      assert(c >= tau - 1e-6, s"reported pair below threshold: $r ($c)")
      assert(math.abs(c - r.getDouble(2)) < 1e-5, s"max_cos drifted: $r vs $c")
    }
    // determinism: same seed + data -> identical drop list
    val again = Similarity.semanticDedup(emb, "vec_id", "embedding",
      simThreshold = tau, nlist = 8).collect()
    assert(drops.toSeq == again.toSeq)
  }

  test("semanticDedup: single cluster equals the brute-force greedy rule") {
    val emb = etlmudah.Tables.embeddings(spark, sf0001)
    val tau = 0.35
    // nlist = 1 removes the cluster restriction, so the drop list must
    // equal the global greedy min-id rule computed by brute force
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
        simThreshold = tau, nlist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val a = emb.select(col("vec_id").as("ia"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("ib"), col("embedding").as("vb"))
    val want = a.crossJoin(b).filter(col("ia") < col("ib"))
      .select(col("ib").as("vec_id"), col("ia").as("keep_id"),
        round(Similarity.cosineFast(col("va"), col("vb")), 6).as("c"))
      .filter(col("c") >= tau)
      .groupBy(col("vec_id"))
      .agg(max_by(col("keep_id"), struct(col("c"), -col("keep_id")))
        .as("kept_by"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == want)
  }

  test("semanticDedupPortable: nlist=1 equals the trained tier; survivor rule holds") {
    val emb = etlmudah.Tables.embeddings(spark, sf0001)
    val tau = 0.35
    // single cluster removes the only difference between the portable
    // and trained tiers (the centroid pick), so the drop lists must be
    // identical — the portable twin is the same dedup rule, not a
    // lookalike
    val portable = Similarity.semanticDedupPortable(emb, "vec_id",
        "embedding", simThreshold = tau, nlist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val trained = Similarity.semanticDedup(emb, "vec_id", "embedding",
        simThreshold = tau, nlist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(portable.nonEmpty && portable == trained)
    // at q164's production nlist the survivor rule still holds: kept_by
    // is an earlier id and every reported pair really clears the
    // threshold on a recompute
    val drops = Similarity.semanticDedupPortable(emb, "vec_id",
      "embedding", simThreshold = tau, nlist = 8).collect()
    assert(drops.nonEmpty)
    val byId = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    drops.foreach { r =>
      assert(r.getLong(1) < r.getLong(0), r.toString)
      val c = cos(byId(r.getLong(0)), byId(r.getLong(1)))
      assert(c >= tau - 1e-6, s"reported pair below threshold: $r ($c)")
    }
  }

  test("exactEmbeddingPairs: equals the brute-force cross join on the probe slice") {
    val emb = etlmudah.Tables.embeddings(spark, sf0001)
    val got = Similarity.exactEmbeddingPairs(emb, "vec_id", "embedding",
        minCosine = 0.2, probeMaxId = 50L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Similarity.cosineFast(col("va"), col("vb")), 6).as("c"))
      .filter(col("c") >= 0.2).orderBy(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("lshPortablePairs: subset of exact pairs with identical scores; identical vectors always pair") {
    val emb = etlmudah.Tables.embeddings(spark, sf0001)
    val portable = Similarity.lshPortablePairs(emb, "vec_id", "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // every emitted pair must appear in the all-pairs exact tier with
    // the SAME 6dp score (the refine is exact; only recall is banded)
    val exact = Similarity.exactEmbeddingPairs(emb, "vec_id", "embedding",
        minCosine = 0.3, probeMaxId = Long.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(portable.nonEmpty)
    assert(portable.forall { case (k, v) => exact.get(k).contains(v) })
    // identical vectors agree on every sign bit -> same bucket in every
    // table -> candidacy is CERTAIN, not probabilistic
    import spark.implicits._
    val v = (0 until 64).map(_.toFloat / 64f).toArray
    val w = (0 until 64).map(i => ((i * 37 % 64) - 32).toFloat / 64f).toArray
    val planted = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val got = Similarity.lshPortablePairs(planted, "vec_id", "embedding",
        minCosine = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("ivfAssignPortable: total assignment, self-assignment of centroids, argmax correctness") {
    val emb = etlmudah.Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val assigned = Similarity.ivfAssignPortable(emb, "vec_id", "embedding",
      nlist = 8)
    val rows = assigned.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every vector assigned exactly once, to one of exactly 8 centroids
    assert(rows.length == n)
    assert(rows.map(_._1).distinct.length == n)
    val cids = rows.map(_._2).distinct.sorted
    assert(cids.length <= 8)
    // a centroid's own vector scores cosine 1.0 against itself, so it
    // must self-assign (no other centroid can beat 1.0; ties break to
    // min cid, and duplicate-vector centroids would share the score)
    val selfRows = rows.filter(r => cids.contains(r._1))
    assert(selfRows.forall(_._3 == 1.0))
    // argmax verified against a driver-side replay on a slice: for the
    // first 50 vectors, no centroid may score strictly above the
    // emitted 6dp cosine
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val centVecs = cids.map(c => c -> vecs(c))
    rows.filter(_._1 < 50).foreach { case (id, cid, cs) =>
      val best = centVecs.map { case (c, cv) =>
        (BigDecimal(cos(vecs(id), cv))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, c)
      }.max
      assert(best._1 <= cs + 1e-9,
        s"vec $id assigned $cid@$cs but ${best._2}@${best._1} is better")
    }
  }
  test("pqEncodePortable: full codebook encodes every vector to itself; ADC equals exact integer L2") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 12; val dims = 16; val m = 4
    val vecs = (0 until n).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    // codes = n: every vector's own subvectors sit in the codebook, so
    // every argmin lands at squared distance 0
    val enc = Similarity.pqEncodePortable(df, "vec_id", "embedding",
      m = m, codes = n, dims = dims)
    assert(enc.count() == n.toLong * m)
    assert(enc.filter(col("sqd") =!= 0L).count() == 0L)
    // full-codebook ADC degenerates to the exact lattice L2^2 — the
    // approximation error is EXACTLY the codebook error, nothing else
    def q(x: Float): Long = math.floor(x.toDouble * 1e6).toLong
    val lat = vecs.map { case (id, v) => id -> v.map(q) }.toMap
    val adc = Similarity.pqAdcTopK(df, "vec_id", "embedding",
        nprobe = 2, k = n, m = m, codes = n, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(adc.size == 2 * n)
    adc.foreach { case ((p, v), d) =>
      val want = lat(p).zip(lat(v)).map { case (a, b) =>
        (a - b) * (a - b) }.sum
      assert(d == want, s"probe=$p vec=$v got=$d want=$want")
    }
  }

  test("pqEncodePortable: md5 pick, argmin, and ties equal a local replay at codes < n") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val n = 30; val dims = 16; val m = 4; val codes = 4
    val d = dims / m
    val vecs = (0 until n).map(i =>
      (i.toLong, Array.fill(dims)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqEncodePortable(df, "vec_id", "embedding",
        m = m, codes = codes, dims = dims)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // local replay: same md5 rank pick, same integer lattice, same
    // lowest-code tie-break
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def q(x: Float): Long = math.floor(x.toDouble * 1e6).toLong
    val lat = vecs.map { case (id, v) => id -> v.map(q) }.toMap
    val pickIds = vecs.map(_._1).sortBy(id => (md5hex(id.toString), id))
      .take(codes)
    val truth = (for {
      (id, _) <- vecs
      sub <- 0 until m
    } yield {
      val sv = lat(id).slice(sub * d, sub * d + d)
      val best = pickIds.zipWithIndex.map { case (cid, code) =>
        val cv = lat(cid).slice(sub * d, sub * d + d)
        (sv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum, code)
      }.min   // (sqd, code) lexicographic == argmin with lowest-code ties
      (id, sub.toLong) -> (best._2.toLong, best._1)
    }).toMap
    assert(got == truth)
  }

  test("ivfPqTopK: probing every list equals flat ADC; partial probes stay within probed lists") {
    val emb = Tables.embeddings(spark, sf0001)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "rank", "vec_id", "adc_dist").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // nprobeLists == nlist: candidates are the whole corpus, so the
    // composition must reproduce the flat ADC ranking exactly
    val full = rows(Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      nlist = 4, nprobeLists = 4, nprobe = 3, k = 8))
    val flat = rows(Similarity.pqAdcTopK(emb, "vec_id", "embedding",
      nprobe = 3, k = 8))
    assert(full == flat, "full-probe IVF-PQ must equal flat ADC")
    // nprobeLists == 1: every result row's list must BE a probed list —
    // the pruning property the composition exists for
    val pruned = Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      nlist = 4, nprobeLists = 1, nprobe = 3, k = 8)
    val assign = Similarity.ivfAssignPortable(emb, "vec_id", "embedding",
        nlist = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = pruned.select("probe_id", "vec_id", "list_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    // list_id recorded per row matches the vector's coarse assignment
    got.foreach { case (_, v, lid) => assert(assign(v) == lid) }
    // and per probe only ONE distinct list appears
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).distinct.length == 1)
    }
  }

  test("matryoshkaRecall: full-width prefix gives recall 1; truncation can only lose overlap") {
    val emb = Tables.embeddings(spark, sf0001)
    // dPrime = the full 64 dims -> truncated ranking IS the full ranking
    val full = Similarity.matryoshkaRecall(emb, "vec_id", "embedding",
      dPrime = 64, k = 5, nProbes = 4).collect()
    assert(full.length == 4)
    assert(full.forall(_.getDouble(3) == 1.0),
      full.map(_.toString).mkString(","))
    val trunc = Similarity.matryoshkaRecall(emb, "vec_id", "embedding",
      dPrime = 8, k = 5, nProbes = 4).collect()
    assert(trunc.length == 4)
    trunc.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= 5L)
      assert(r.getDouble(3) == r.getLong(2).toDouble / 5.0)
    }
  }

  test("semanticDriftPsi: identical snapshots score zero; a skewed snapshot scores positive") {
    val emb = Tables.embeddings(spark, sf0001)
    val same = Similarity.semanticDriftPsi(emb, emb, "vec_id", "embedding",
        nlist = 4).collect()
    assert(same.nonEmpty)
    // identical corpora: every cluster share matches -> every term is 0
    same.foreach { r =>
      assert(r.getLong(1) == r.getLong(2))
      assert(r.getDouble(5) == 0.0, r.toString)
    }
    // drop one cluster's members from the current side: shares shift,
    // summed PSI must be positive
    val assign = Similarity.ivfAssignPortable(emb, "vec_id", "embedding",
        nlist = 4)
    val dropCid = assign.groupBy("centroid_id").count()
      .orderBy(col("count").desc, col("centroid_id"))
      .collect().head.getLong(0)
    val keepIds = assign.filter(col("centroid_id") =!= dropCid)
      .select(col("vec_id"))
    val cur = emb.join(keepIds, Seq("vec_id"), "left_semi")
    val drift = Similarity.semanticDriftPsi(emb, cur, "vec_id", "embedding",
        nlist = 4).collect()
    assert(drift.map(_.getDouble(5)).sum > 0.1, drift.mkString(","))
  }

  test("binaryHammingTopK: sign packing JVM-replayed; full-candK rerank == brute force") {
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count().toInt
    // candK = corpus: the Hamming cut admits everyone, so the rerank
    // must reproduce the exact brute-force top-k per probe — isolates
    // the packing/candidate machinery from recall concerns
    val out = Similarity.binaryHammingTopK(emb, "vec_id", "embedding",
      dims = 64, nprobe = 3, candK = n, k = 5).collect()
    assert(out.length == 15)
    out.groupBy(_.getLong(0)).foreach { case (p, rows) =>
      val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding", p, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = rows.sortBy(_.getLong(4))
        .map(r => (r.getLong(1), r.getDouble(3)))
      assert(got.toSeq == bf.toSeq, s"probe $p")
    }
    assert(out.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 64),
      "hamming out of the 64-bit range")
    // packing replay: recompute one signature in the JVM from the raw
    // floats and compare against the expression-packed words
    import org.apache.spark.sql.functions._
    val first = emb.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding")).collect()(0)
    val vec = first.getSeq[Float](1)
    val expect = (0 until 2).map { wi =>
      (0 until 32).map(j => if (vec(wi * 32 + j) > 0f) 1L << j else 0L).sum
    }
    val ex = emb.filter(col("vec_id") === first.getLong(0))
      .select(posexplode(col("embedding")).as(Seq("d0", "x")))
      .agg(
        sum(when(col("d0") < 32 && col("x") > 0f,
          expr("shiftleft(1L, int(d0))")).otherwise(0L)),
        sum(when(col("d0") >= 32 && col("x") > 0f,
          expr("shiftleft(1L, int(d0 - 32))")).otherwise(0L)))
      .collect()(0)
    assert(Seq(ex.getLong(0), ex.getLong(1)) == expect)
  }

  test("mmrSelect: diversity beats a redundant higher score; k caps at n") {
    import spark.implicits._
    val a = Array(1f, 0f)
    val aDup = Array(0.999f, 0.01f)   // near-duplicate of a
    val ortho = Array(0f, 1f)
    val cand = Seq((1L, 0.9, a), (2L, 0.89, aDup), (3L, 0.5, ortho))
      .toDF("id", "score", "vec")
    val r = Similarity.mmrSelect(cand, k = 5, lambda = 0.7).collect()
    // round 1: best score (id 1). round 2: id 2 pays ~0.3 redundancy
    // (sim~1 to id 1) -> 0.323; id 3 pays nothing -> 0.35 wins.
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 3L, 2L))
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), "ranks 1..n")
    assert(r.head.getAs[Double]("mmr") == 0.63)   // 0.7 * 0.9
    assert(r(1).getAs[Double]("mmr") == 0.35)     // 0.7*0.5 - 0.3*0
    // exact-duplicate scores tie-break by id — on BOTH loop drivers
    val ties = Seq((7L, 0.5, a), (5L, 0.5, a)).toDF("id", "score", "vec")
    for (thr <- Seq(65536L, 0L)) {
      val t = Similarity.mmrSelect(ties, k = 1,
        driverCandThreshold = thr).collect()
      assert(t.head.getLong(1) == 5L, s"threshold=$thr")
    }
    // empty candidates -> empty result, no crash
    assert(Similarity.mmrSelect(cand.where(col("id") > 99), k = 3)
      .count() == 0)
  }

  test("mmrSelect: driver fast path equals the distributed loop bit for bit") {
    import spark.implicits._
    // deterministic pseudo-random candidates: enough rows, repeated
    // scores (forcing id tie-breaks) and non-trivial vectors so the
    // greedy trajectory exercises real redundancy trade-offs
    val cand = (1L to 40L).map { i =>
      val vec = Array.tabulate(8)(j =>
        (((i * 31 + j * 17) % 13) - 6).toFloat / 7f)
      (i, ((i * 37) % 10).toDouble / 10.0, vec)
    }.toDF("id", "score", "vec")
    def run(threshold: Long) = Similarity.mmrSelect(cand, k = 10,
        lambda = 0.7, driverCandThreshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(run(65536L) == run(0L))
  }

  test("kCenterSelect: greedy farthest-point replay; clusters covered before depth") {
    import spark.implicits._
    // three tight clusters along axes; ids chosen so the min-id seed
    // (1) sits in cluster X — greedy must visit Y and Z before any
    // second pick inside X
    val cand = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f)), (4L, Array(0.1f, 0.99f, 0f)),
      (5L, Array(0f, 0f, 1f)), (6L, Array(0f, 0.1f, 0.99f))
    ).toDF("id", "vec")
    val r = Similarity.kCenterSelect(cand, k = 4).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L), "ranks")
    val picks = r.map(_.getLong(1)).toSeq
    assert(picks.head == 1L, "seed = min id")
    // picks 2 and 3 land in the two other clusters (order: both are
    // orthogonal to the seed, msim 0 ties -> min id first)
    assert(picks(1) == 3L && picks(2) == 5L, picks.toString)
    assert(r.head.isNullAt(2), "seed coverage is null")
    // coverage non-decreasing down the ranks
    val cov = r.tail.map(_.getDouble(2)).toSeq
    assert(cov == cov.sorted, cov.toString)
    // k caps at n; empty input -> empty output
    assert(Similarity.kCenterSelect(cand, k = 99).count() == 6L)
    assert(Similarity.kCenterSelect(cand.where(col("id") > 99), k = 3)
      .count() == 0L)
  }

  test("rrfFuse: dual-hit doc tops both single-hit docs; null ranks preserved") {
    import spark.implicits._
    val a = Seq((1L, 0.9), (2L, 0.8)).toDF("id", "score")
    val b = Seq((2L, 0.7), (3L, 0.6)).toDF("id", "score")
    val r = Similarity.rrfFuse(a, b, k = 10).collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(2L, 1L, 3L))
    val top = r.head
    assert(top.getAs[Long]("rank_a") == 2L &&
      top.getAs[Long]("rank_b") == 1L)
    val exp = BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(top.getAs[Double]("rrf") == exp)
    // id 1 appears only in ranking a -> rank_b null, half-score
    val one = r(1)
    assert(one.isNullAt(one.fieldIndex("rank_b")))
    assert(one.getAs[Double]("rrf") ==
      BigDecimal(1.0 / 61).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rrfFuse: equal-score ties rank by id, deterministically") {
    import spark.implicits._
    val a = Seq((5L, 0.5), (4L, 0.5), (3L, 0.5)).toDF("id", "score")
    val b = Seq.empty[(Long, Double)].toDF("id", "score")
    val r = Similarity.rrfFuse(a, b, k = 3).collect()
    // ties broken id asc -> ranks 3,4,5; fusion re-sorts by rrf desc
    assert(r.map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
  }
}
