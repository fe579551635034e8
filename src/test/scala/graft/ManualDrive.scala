package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

import etlmudah.streaming.Streaming

/** Dev-only drive harness: exercises library operators end-to-end on the
  * testdata. Run with `sbt "Test/runMain graft.ManualDrive"`.
  * Not a ScalaTest suite — a manual smoke surface for quick verification.
  */
object ManualDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("drive_r7").toString

    // 1. bucketed upsertSink: two micro-batch runs; second touches few keys
    println("== upsertSink (bucketed)")
    val src = s"$out/events"
    spark.read.parquet(s"$sf/events.parquet").repartition(2)
      .write.mode("overwrite").parquet(src)
    val base = s"$out/base"
    val q1 = Streaming.upsertSink(
        Streaming.readEvents(spark, src, maxFilesPerTrigger = 1),
        base, s"$out/cp_up", numBuckets = 8)
      .trigger(Trigger.AvailableNow()).start()
    q1.awaitTermination(120000)
    val baseDf = spark.read.parquet(base)
    println(s"base rows=${baseDf.count()} distinct=${baseDf.select("event_id").distinct().count()}")
    println("bucket dirs: " + new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).sorted.mkString(","))
    baseDf.orderBy("event_id").show(3)

    // 2. userProfiles with TTL — batch-accumulation drive (no timeout fires
    // on a single batch; eviction is covered in StreamingSpec)
    println("== userProfiles(stateTtl=7 days)")
    val q2 = Streaming.userProfiles(
        Streaming.readEvents(spark, src),
        stateTtl = Some("7 days"), lateness = "1 hour")
      .writeStream.format("memory").queryName("drive_profiles")
      .outputMode("update")
      .option("checkpointLocation", s"$out/cp_prof")
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(120000)
    spark.table("drive_profiles").orderBy("userId").show(5)

    // 3. anomalySink with compaction every 1 batch (forces the swap path)
    println("== anomalySink (compactEvery=1)")
    val q3 = Streaming.anomalySink(
        Streaming.readEvents(spark, src, maxFilesPerTrigger = 1),
        s"$out/anom_state", s"$out/anom_report", s"$out/cp_anom",
        compactEvery = 1)
      .trigger(Trigger.AvailableNow()).start()
    q3.awaitTermination(120000)
    println("state partitions: " + new java.io.File(s"$out/anom_state").listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted.mkString(","))
    spark.read.parquet(s"$out/anom_report").orderBy("event_type", "hour_us").show(3)

    // 4. stagedClusterPairs: cold mine then warm re-read (same key)
    println("== stagedClusterPairs cold+warm")
    val t0 = System.nanoTime()
    val p1 = SparkEntry.stagedClusterPairs(spark, sf).count()
    val t1 = System.nanoTime()
    val p2 = SparkEntry.stagedClusterPairs(spark, sf).count()
    val t2 = System.nanoTime()
    println(f"pairs=$p1 cold=${(t1 - t0) / 1e9}%.2fs warm=${(t2 - t1) / 1e9}%.2fs (p2=$p2)")

    // 5. lshTopKAll with probe pushdown (the no-longer-checkpointed path)
    println("== lshTopKAll probeFilter")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    etlmudah.scale.Similarity.lshTopKAll(emb, "vec_id", "embedding",
        k = 3, probeFilter = Some(col("id") < 5))
      .show(10)

    // 5b. packExportSink: incremental sequence packing over micro-batches
    println("== packExportSink (ctx=4096, compactEvery=1)")
    val docsSrc = s"$out/docs"
    spark.read.parquet(s"$sf/documents.parquet").repartition(3)
      .write.mode("overwrite").parquet(docsSrc)
    val q5b = Streaming.packExportSink(
        Streaming.readDocuments(spark, docsSrc), "doc_id", "n_chars",
        4096L, s"$out/pack_state", s"$out/packs", s"$out/cp_pack",
        compactEvery = 1)
      .trigger(Trigger.AvailableNow()).start()
    q5b.awaitTermination(120000)
    val packsDf = spark.read.parquet(s"$out/packs")
    println(s"span rows=${packsDf.count()} packs=${packsDf.select("pack_id").distinct().count()}")
    packsDf.groupBy("pack_id").agg(sum("n_tokens").as("tok"))
      .orderBy("pack_id").show(5)

    // 6. portable decontamination (q157): even-id train vs odd-id ref
    println("== minhashPortableCrossPairs (q157)")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    etlmudah.scale.Dedup.minhashPortableCrossPairs(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "text", "doc_id", k = 128, bands = 32, minJaccard = 0.8)
      .show(5, truncate = false)

    // 7. portable IVF assignment (q158)
    println("== ivfAssignPortable (q158)")
    etlmudah.scale.Similarity.ivfAssignPortable(emb, "vec_id", "embedding",
        nlist = 8)
      .show(5)

    // 8b. staged winnow fingerprints: cold mine then warm re-read,
    // feeding the q166/q168/q170 consumers
    println("== stagedWinnowFps cold+warm -> q166/q168/q170 consumers")
    val w0 = System.nanoTime()
    val wf1 = SparkEntry.stagedWinnowFps(spark, sf).count()
    val w1 = System.nanoTime()
    val wf2 = SparkEntry.stagedWinnowFps(spark, sf).count()
    val w2 = System.nanoTime()
    println(f"fps=$wf1 cold=${(w1 - w0) / 1e9}%.2fs warm=${(w2 - w1) / 1e9}%.2fs (p2=$wf2)")
    val fps = SparkEntry.stagedWinnowFps(spark, sf)
    etlmudah.scale.Dedup.winnowSharedPairsFromFps(fps, minShared = 2L,
      maxDf = 50L).show(5, truncate = false)
    etlmudah.scale.Dedup.winnowCrossPairsFromFps(
        fps.filter(col("id") % 2 === 0), fps.filter(col("id") % 2 === 1),
        minShared = 2L, maxDf = 50L)
      .show(5, truncate = false)
    etlmudah.scale.Dedup.dupClusters(
        etlmudah.scale.Dedup.winnowSharedPairsFromFps(fps)
          .select(col("id_a"), col("id_b")))
      .show(5, truncate = false)

    // 8e. sparse tf-idf cosine pairs (q169) — now Bayardo prefix-filtered
    println("== tfidfCosinePairs (q169, prefix-filtered)")
    etlmudah.text.TextStats.tfidfCosinePairs(docs, "text", "doc_id")
      .show(5, truncate = false)

    // 8g. batched BPE: merges + held-out segment report (q161/q162)
    println("== bpeMerges batched (q161) + segment report (q162)")
    val bb0 = System.nanoTime()
    val merges16 = etlmudah.text.TextStats.bpeMerges(
      docs.filter(col("doc_id") % 2 === 0), "text", nMerges = 16)
    merges16.show(16, truncate = false)
    println(f"batched 16 merges in ${(System.nanoTime() - bb0) / 1e9}%.2fs")
    etlmudah.text.TextStats.bpeSegmentReport(
        docs.filter(col("doc_id") % 2 === 1), "text", "source",
        merges16.collect().map(r => (r.getString(1), r.getString(2))).toSeq)
      .show(5, truncate = false)

    // 8h. 64-bit portable lanes (the 100 TB dial)
    println("== minhashPortablePairs laneHex=16 + winnow laneHex=16")
    etlmudah.scale.Dedup.minhashPortablePairs(docs, "text", "doc_id",
        k = 128, bands = 32, minJaccard = 0.8, laneHex = 16)
      .show(5, truncate = false)
    etlmudah.scale.Dedup.winnowFingerprints(docs, "text", "doc_id",
        k = 3, w = 4, laneHex = 16)
      .show(3, truncate = false)

    // 8i. WebP round trip (q171) + hostile WAV (ADVICE crash fix)
    println("== WebP encode->decode (q171) + hostile WAV")
    SparkEntry.queries("q171_webp_meta_roundtrip")(spark, sf).show(6)
    import spark.implicits._
    val hostileWav = ("52494646" + "24080000" + "57415645" +
      "4C495354" + "F0FFFFFF" + "0000000000000000")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    Seq((1L, hostileWav)).toDF("id", "media")
      .select(col("id"),
        etlmudah.multimodal.Multimodal.audioMeta(col("media")).as("m"))
      .show(1, truncate = false)

    // 8j. online decontamination sink: screen arriving docs against a
    // static benchmark fingerprint index; quarantine carries evidence
    println("== decontaminationSink (clean/quarantine split)")
    val refDocs = docs.filter(col("doc_id") < 10)
    val refFps = etlmudah.scale.Dedup.winnowFingerprints(
      refDocs, "text", "doc_id")
    val qDecon = Streaming.decontaminationSink(
        Streaming.readDocuments(spark, docsSrc), refFps,
        s"$out/decon_clean", s"$out/decon_quarantine", s"$out/cp_decon")
      .trigger(Trigger.AvailableNow()).start()
    qDecon.awaitTermination(120000)
    println(s"clean=${spark.read.parquet(s"$out/decon_clean").count()} " +
      s"quarantined=${spark.read.parquet(s"$out/decon_quarantine").count()}")
    spark.read.parquet(s"$out/decon_quarantine")
      .orderBy("doc_id", "ref_id").show(5)

    // 8k. online quality-gate sink: clean + model-score each arriving
    // doc; keep/reject split, scores on both sides for audit
    println("== qualityGateSink (keep/reject split)")
    val qGate = Streaming.qualityGateSink(
        Streaming.readDocuments(spark, docsSrc),
        s"$out/gate_keep", s"$out/gate_reject", s"$out/cp_gate",
        minScore = 0.0)
      .trigger(Trigger.AvailableNow()).start()
    qGate.awaitTermination(120000)
    println(s"keep=${spark.read.parquet(s"$out/gate_keep").count()} " +
      s"reject=${spark.read.parquet(s"$out/gate_reject").count()}")
    spark.read.parquet(s"$out/gate_reject")
      .select("doc_id", "score").orderBy("doc_id").show(5)

    // 8. portable SemDeDup (q164)
    println("== semanticDedupPortable (q164)")
    etlmudah.scale.Similarity.semanticDedupPortable(emb, "vec_id",
        "embedding", simThreshold = 0.35, nlist = 8)
      .show(5)

    // 9. contrastive triplet mining (q206) + rank ensemble (q207)
    println("== contrastiveTriplets (q206)")
    val docs9 = spark.read.parquet(s"$sf/documents.parquet")
    etlmudah.scale.Dedup.contrastiveTriplets(docs9, "text", "doc_id",
        posMin = 0.8, negLo = 0.005)
      .show(5)
    println("== rankEnsemble (q207)")
    etlmudah.text.TextStats.rankEnsemble(
        docs9.withColumn("n_tokens",
            etlmudah.text.TextStats.tokenCount(col("text")))
          .withColumn("n_chars", length(col("text")).cast("long")),
        "doc_id", "source", Seq("n_tokens", "n_chars"))
      .show(5)

    // R11. BucketedBase batch MERGE: measured rewritten fraction at
    // three batch sizes against a 256-bucket orders base (sf0.01)
    println("== BucketedBase rewritten-fraction measurement")
    locally {
      import etlmudah.load.BucketedBase
      val sf01 = "/root/testdata/sf0.01"
      val root = Files.createTempDirectory("bb_measure").toString
      val base = s"$root/orders"
      val orders = etlmudah.Tables.orders(spark, sf01)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val nb = 256
      val t0 = System.nanoTime
      BucketedBase.merge(orders.withColumn("batch_ts", lit(1L)), base,
        Seq("o_orderkey"), Seq(col("batch_ts").desc), nb)
      println(f"seed 15k rows into $nb buckets: ${(System.nanoTime-t0)/1e9}%.2f s")
      Seq(1000, 100, 10).foreach { mod =>
        val batch = orders.filter(col("o_orderkey") % mod === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1)
          .withColumn("batch_ts", lit(2L))
        val n = batch.count()
        val t1 = System.nanoTime
        val st = BucketedBase.merge(batch, base, Seq("o_orderkey"),
          Seq(col("batch_ts").desc), nb)
        println(f"batch keys=$n%5d -> touched ${st.touchedBuckets.size}%3d/$nb buckets " +
          f"(rewritten fraction ${st.rewrittenFraction}%.3f, ${(System.nanoTime-t1)/1e9}%.2f s)")
      }

    spark.stop()

    }

  }
}
