package etlmudah.streaming

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

class StreamingSpec extends SparkSpec {

  /** File-stream sources need a directory; stage the events file into one. */
  private def stageEvents(tag: String): String = {
    val dir = Files.createTempDirectory(tag).toString + "/events"
    spark.read.parquet(s"$sf0001/events.parquet")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("hourlyCounts stream == batch twin on the same input (exactly-once contract)") {
    val out = Files.createTempDirectory("stream_out").toString
    val q = Streaming.hourlyCounts(
        Streaming.readEvents(spark, stageEvents("src_hourly")))
      .writeStream
      .format("memory").queryName("hourly")
      .outputMode("complete")
      .option("checkpointLocation", s"$out/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("hourly")
      .orderBy("hour_us", "event_type").collect()
    val batch = Tables.eventsTyped(spark, sf0001)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_us"), col("event_type"),
        col("cnt"), col("sum_value"))
      .orderBy("hour_us", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("userSessions stream == batch session_window on the same input") {
    val out = Files.createTempDirectory("stream_sess").toString
    val q = Streaming.userSessions(
        Streaming.readEvents(spark, stageEvents("src_sess")))
      .writeStream
      .format("memory").queryName("sessions")
      .outputMode("complete")
      .option("checkpointLocation", s"$out/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions")
      .orderBy("user_id", "session_start_us").collect()
    val batch = Tables.eventsTyped(spark, sf0001)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("events_in_session"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("events_in_session"))
      .orderBy("user_id", "session_start_us").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("dedupEvents drops duplicate event_ids within the watermark") {
    val out = Files.createTempDirectory("stream_dedup").toString
    val src = s"$out/src"
    new java.io.File(src).mkdirs()
    // duplicate the events file -> every event_id arrives twice
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    events.write.mode("overwrite").parquet(src)
    val extra = spark.read.parquet(src)
    extra.write.mode("append").parquet(src)

    val q = Streaming.dedupEvents(Streaming.readEvents(spark, src))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append")
      .option("checkpointLocation", s"$out/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val n = spark.table("dedup").count()
    val distinct = events.select("event_id").distinct().count()
    assert(n == distinct, s"expected $distinct deduped rows, got $n")
  }

  test("userProfiles: mapGroupsWithState accumulates across batches == batch aggregate") {
    val out = Files.createTempDirectory("stream_state").toString
    val src = stageEvents("src_state")
    val q = Streaming.userProfiles(Streaming.readEvents(spark, src))
      .writeStream.format("memory").queryName("profiles")
      .outputMode("update")
      .option("checkpointLocation", s"$out/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("profiles")
      .groupBy("userId")   // keep the LAST update per user
      .agg(max("events").as("events"), max("valueSum").as("valueSum"))
      .orderBy("userId").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    val batch = etlmudah.Tables.eventsTyped(spark, sf0001)
      .groupBy(col("user_id")).agg(
        count(lit(1)).as("events"), sum("value").as("valueSum"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 100)))
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("clickAttribution stream-stream interval join == batch interval join") {
    val out = Files.createTempDirectory("stream_attr").toString
    val src = stageEvents("src_attr")
    val q = Streaming.clickAttribution(Streaming.readEvents(spark, src))
      .writeStream.format("memory").queryName("attr")
      .outputMode("append")
      .option("checkpointLocation", s"$out/cp")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("attr")
      .orderBy("purchase_id", "click_id").collect()
    val ev = Tables.eventsTyped(spark, sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
    val batch = p.join(c, Seq("user_id"))
      .filter(col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 hour"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
      .orderBy("purchase_id", "click_id").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
  }

  test("dedupIngestSink: one survivor per fingerprint across batches, re-run converges") {
    val out = Files.createTempDirectory("stream_dedup").toString
    val src = s"$out/src"
    // two files -> two micro-batches (maxFilesPerTrigger=1); plant a dup
    // within batch 1, a cross-batch dup in batch 2, and a fresh doc
    import spark.implicits._
    // the file source lists FLAT files: write each batch to a temp dir
    // and move its single part-file into the source dir
    def stageFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("stage_dedup").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      new java.io.File(src).mkdirs()
      Files.move(part.toPath, java.nio.file.Paths.get(s"$src/$name"))
    }
    stageFile(Seq((1L, "alpha beta gamma", "en", "s", 16L),
        (2L, "alpha beta gamma", "en", "s", 16L),     // in-batch dup of 1
        (3L, "delta epsilon zeta", "en", "s", 18L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "f1.parquet")
    Thread.sleep(100)   // file source orders by modTime: keep f1 < f2
    stageFile(Seq((4L, "ALPHA   beta gamma", "en", "s", 18L),  // dup of 1
        (5L, "eta theta iota", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"), "f2.parquet")
    val base = s"$out/base"
    val fps = s"$out/fps"
    def runOnce(cp: String): Unit = {
      val q = Streaming.dedupIngestSink(
          Streaming.readDocuments(spark, src), base, fps, cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce(s"$out/cp1")
    val ids = spark.read.parquet(base).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // survivors: 1 (min id of the in-batch pair), 3, 5; 4 is a corpus dup
    assert(ids == Set(1L, 3L, 5L))
    assert(spark.read.parquet(fps).distinct().count() == 3)
    runOnce(s"$out/cp2")   // full re-delivery against standing state
    val again = spark.read.parquet(base).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == Set(1L, 3L, 5L))

    // crash-torn swap states: the live fingerprint table is absent only
    // between the two swap renames — simulate both torn layouts and
    // prove replay recovers the state instead of re-admitting the corpus
    def torn(suffix: String, cp: String): Unit = {
      Files.move(java.nio.file.Paths.get(fps),
        java.nio.file.Paths.get(fps + suffix))
      runOnce(cp)
      val ids2 = spark.read.parquet(base).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids2 == Set(1L, 3L, 5L), s"$suffix recovery: $ids2")
      assert(spark.read.parquet(fps).distinct().count() == 3)
    }
    torn("__tmp", s"$out/cp3")   // crashed after table moved aside
    torn("__old", s"$out/cp4")   // crashed before tmp moved in
  }

  test("anomalySink: standing-state scores == batch anomalyZ, re-run converges") {
    import etlmudah.analytics.Analytics
    val out = Files.createTempDirectory("stream_anom").toString
    val src = stageEvents("src_anom")
    def runOnce(cp: String): Unit = {
      val q = Streaming.anomalySink(Streaming.readEvents(spark, src),
          s"$out/state", s"$out/report", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce(s"$out/cp1")
    val streamed = spark.read.parquet(s"$out/report")
      .orderBy("event_type", "hour_us").collect()
    val batch = Analytics.anomalyZ(Tables.eventsTyped(spark, sf0001),
      "ts", "event_type").collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
    runOnce(s"$out/cp2")   // re-delivery: counts re-sum, report identical
    val again = spark.read.parquet(s"$out/report")
      .orderBy("event_type", "hour_us").collect()
    assert(streamed.zip(again).forall { case (a, b) => a == b })
  }

  test("driftSink: report == batch driftPsi(ref, streamed), re-run converges") {
    import etlmudah.analytics.Profile
    val out = Files.createTempDirectory("stream_drift").toString
    val src = stageEvents("src_drift")
    val all = spark.read.parquet(src)
    val ref = all.filter(col("event_id") % 2 === 0)
    def runOnce(cp: String): Unit = {
      val q = Streaming.driftSink(Streaming.readEvents(spark, src), ref,
          "value", 10.0, s"$out/state", s"$out/report", cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce(s"$out/cp1")
    val streamed = spark.read.parquet(s"$out/report").orderBy("bin").collect()
    val batch = Profile.driftPsi(ref, all, "value", binWidth = 10.0).collect()
    assert(streamed.length == batch.length && streamed.length > 0)
    assert(streamed.zip(batch).forall { case (a, b) => a == b })
    runOnce(s"$out/cp2")   // fresh checkpoint -> same batches re-delivered
    val again = spark.read.parquet(s"$out/report").orderBy("bin").collect()
    assert(streamed.zip(again).forall { case (a, b) => a == b })
  }

  test("shardExportSink: contiguous shards across batches, budget bounds, re-run converges") {
    val out = Files.createTempDirectory("stream_shard").toString
    val src = s"$out/src"
    // three files -> three micro-batches (readDocuments maxFilesPerTrigger=1)
    spark.read.parquet(s"$sf0001/documents.parquet").repartition(3)
      .write.mode("overwrite").parquet(src)
    def runOnce(cp: String): Unit = {
      // compactEvery=2 forces a mid-stream ledger compaction cycle
      val q = Streaming.shardExportSink(
          Streaming.readDocuments(spark, src), "doc_id", "n_chars",
          shardBudget = 3000L, s"$out/state", s"$out/shards", cp,
          compactEvery = 2)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce(s"$out/cp1")
    val assigned = spark.read.parquet(s"$out/shards")
    val corpus = spark.read.parquet(src)
    // every doc assigned exactly once; the ledger accounts for all bytes
    assert(assigned.count() == corpus.count())
    assert(assigned.select("doc_id").distinct().count() == assigned.count())
    assert(spark.read.parquet(s"$out/state")
      .agg(sum("batch_bytes")).head().getLong(0) ==
      corpus.agg(sum("n_chars")).head().getLong(0))
    // batch count really was > 1 (the continuation path was exercised:
    // the OUTPUT keeps one partition per batch; the LEDGER does not)
    assert(assigned.select("batch_id").distinct().count() >= 3)
    // compaction really fired: batches below the last collapsed into a
    // single running-total row, so the ledger holds exactly 2 rows
    assert(spark.read.parquet(s"$out/state").count() == 2)
    // shard ids contiguous from 0; every non-last shard lands within one
    // doc of the budget (the q138 invariant over the concatenated stream)
    val per = assigned.groupBy("shard").agg(sum("n_chars").as("chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    assert(per.map(_._1).toSeq == (0L until per.length).toSeq)
    val maxDoc = corpus.agg(max("n_chars")).head().getLong(0)
    per.dropRight(1).foreach { case (id, chars) =>
      assert(chars <= 3000L + maxDoc && chars + maxDoc >= 3000L,
        s"shard $id: $chars")
    }
    // fresh checkpoint -> same batches re-delivered -> identical output
    val first = assigned.select("doc_id", "shard").orderBy("doc_id").collect()
    runOnce(s"$out/cp2")
    val again = spark.read.parquet(s"$out/shards")
      .select("doc_id", "shard").orderBy("doc_id").collect()
    assert(first.zip(again).forall { case (a, b) => a == b })

    // crash-torn ledger compaction: the ledger is absent only between
    // swapIn's renames. A LATER batch must see the recovered running
    // totals — a fresh-checkpoint replay would rebuild the ledger from
    // batch 0 and prove nothing, so the torn layout is exercised
    // against the COMMITTED checkpoint with one new source file: only
    // the new batch runs, and its start offset exists only in the
    // recovered ledger (an unrecovered ledger restarts offsets at 0 and
    // re-uses low shard ids).
    import spark.implicits._
    val maxShard = first.map(_.getLong(1)).max
    val ledgerBytes = corpus.agg(sum("n_chars")).head().getLong(0)
    Files.move(java.nio.file.Paths.get(s"$out/state"),
      java.nio.file.Paths.get(s"$out/state__tmp"))
    val extra = Seq((900001L, "tail doc after crash", "en", "t", 3000L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmpd = Files.createTempDirectory("stage_shard").toString
    extra.coalesce(1).write.mode("overwrite").parquet(tmpd)
    val part = new java.io.File(tmpd).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.move(part.toPath, java.nio.file.Paths.get(s"$src/f_extra.parquet"))
    runOnce(s"$out/cp2")   // committed checkpoint: ONLY the new batch runs
    val tail = spark.read.parquet(s"$out/shards")
      .filter(col("doc_id") === 900001L).select("shard").head().getLong(0)
    assert(tail >= maxShard, s"shard restarted: $tail < $maxShard")
    assert(spark.read.parquet(s"$out/state")
      .agg(sum("batch_bytes")).head().getLong(0) == ledgerBytes + 3000L)
  }

  test("upsertSink: micro-batch merge is idempotent (re-running converges)") {
    val out = Files.createTempDirectory("stream_upsert").toString
    val base = s"$out/base"
    val src = stageEvents("src_upsert")
    def runOnce(cp: String): Unit = {
      val q = Streaming.upsertSink(
          Streaming.readEvents(spark, src),
          base, cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce(s"$out/cp1")
    val first = spark.read.parquet(base)
      .select("event_id", "value").orderBy("event_id").collect()
    runOnce(s"$out/cp2")   // fresh checkpoint -> same batch re-delivered
    val second = spark.read.parquet(base)
      .select("event_id", "value").orderBy("event_id").collect()
    assert(first.length > 0)
    assert(first.zip(second).forall { case (a, b) => a == b })

    // crash-torn swap states: the base table is absent only between the
    // two swapIn renames — simulate both torn layouts and prove the next
    // batch RECOVERS the base rather than rebuilding from its own rows
    // alone. The recovery source streams only a subset, so the rows it
    // lacks can only come from the recovered base.
    val subSrc = s"$out/sub_src"
    spark.read.parquet(src).filter(col("event_id") % 5 === 0)
      .write.mode("overwrite").parquet(subSrc)
    def torn(suffix: String, cp: String): Unit = {
      Files.move(java.nio.file.Paths.get(base),
        java.nio.file.Paths.get(base + suffix))
      val q = Streaming.upsertSink(
          Streaming.readEvents(spark, subSrc), base, cp)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val rec = spark.read.parquet(base)
        .select("event_id", "value").orderBy("event_id").collect()
      assert(rec.length == first.length, suffix)
      assert(first.zip(rec).forall { case (a, b) => a == b }, suffix)
    }
    torn("__tmp", s"$out/cp3")   // crashed after base moved aside
    torn("__old", s"$out/cp4")   // crashed before tmp moved in
  }
}
