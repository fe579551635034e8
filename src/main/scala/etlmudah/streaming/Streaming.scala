package etlmudah.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import etlmudah.load.Upsert
import etlmudah.text.TextStats

/** Structured Streaming slice (SURVEY.md §2.9): the reference's 12-hour
  * micro-batch ingest (dags/dag.py:288, catchup=False) made
  * streaming-native — file-source stream, watermarked tumbling-window
  * aggregation, keyed dedup, and an idempotent foreachBatch upsert.
  *
  * State is bounded by the watermark (the reference sidesteps unbounded
  * state by full-merge every 12 h; here late data past the watermark is
  * dropped and documented). The batch twin of `hourlyCounts` is
  * SparkEntry q20 — the DuckDB-oracled query — and StreamingSpec asserts
  * stream==batch on the same input, which is the exactly-once contract.
  */
object Streaming {

  /** Batch-begin recovery for the [[swapIn]] protocol: the live table is
    * absent ONLY between swapIn's two renames — at that point `__tmp`
    * was fully written (it is renamed aside only after its write
    * completes), so it is the newest complete state; `__old` is the
    * pre-swap fallback. With the live table present, any `__tmp` is a
    * torn partial write and any `__old` a finished swap's leftover —
    * drop both. Every crash point therefore replays to a complete
    * table; a plain delete-then-rename would lose the table to a crash
    * between the delete and the rename. */
  private[streaming] def recoverSwap(fs: org.apache.hadoop.fs.FileSystem,
                                     targetStr: String): Unit = {
    val target = new org.apache.hadoop.fs.Path(targetStr)
    val tmp = new org.apache.hadoop.fs.Path(targetStr + "__tmp")
    val old = new org.apache.hadoop.fs.Path(targetStr + "__old")
    if (!fs.exists(target)) {
      if (fs.exists(tmp)) fs.rename(tmp, target)
      else if (fs.exists(old)) fs.rename(old, target)
    }
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Recoverable three-step table swap: write the new state to `__tmp`,
    * rename the live table ASIDE to `__old` (never delete it), rename
    * `__tmp` in, then drop `__old`. Paired with [[recoverSwap]] at the
    * next batch's start, no crash point loses the table. */
  private[streaming] def swapIn(fs: org.apache.hadoop.fs.FileSystem,
                                targetStr: String)
                               (writeTmp: String => Unit): Unit = {
    val target = new org.apache.hadoop.fs.Path(targetStr)
    val tmp = new org.apache.hadoop.fs.Path(targetStr + "__tmp")
    val old = new org.apache.hadoop.fs.Path(targetStr + "__old")
    writeTmp(tmp.toString)
    if (fs.exists(target)) fs.rename(target, old)
    fs.rename(tmp, target)
    if (fs.exists(old)) fs.delete(old, true)
  }

  /** FALLBACK schema of the events parquet (current data generation:
    * ts stored as timestamp[us], isAdjustedToUTC=false = TIMESTAMP_NTZ).
    * [[readEvents]] prefers the schema of the files actually present —
    * the ts physical type has already flipped once between data
    * generations (nanos-long -> NTZ), and a pinned schema would break
    * the streaming path while the adaptive batch path (Tables
    * .eventsTyped) kept working; this constant is used only when the
    * source directory has no files to sniff yet. */
  val eventsFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Schema of the documents parquet (for file-source document streams). */
  val documentsFileSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source stream over a documents directory — the arriving-crawl
    * side of [[dedupIngestSink]]. */
  def readDocuments(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(documentsFileSchema)
      .option("pathGlobFilter", "*.parquet")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** File-source stream over an events directory with ts normalized to
    * a UTC instant for event-time semantics (sessions pin timeZone=UTC,
    * so the NTZ cast is the identity on the underlying micros).
    *
    * The file schema is SNIFFED from a batch read of the directory and
    * the ts normalization branches on the observed type exactly like
    * the batch path (Tables.eventsTyped) — the events ts encoding has
    * already flipped between data generations (nanos-long vs NTZ), and
    * a hardcoded schema would silently break only the streaming path.
    * An empty source directory falls back to [[eventsFileSchema]]. */
  def readEvents(spark: SparkSession, dir: String,
                 maxFilesPerTrigger: Int = 0): DataFrame = {
    val fileSchema = scala.util.Try(spark.read.parquet(dir).schema)
      .getOrElse(eventsFileSchema)
    val reader = spark.readStream
      .schema(fileSchema)
      .option("pathGlobFilter", "*.parquet")
    val bounded =
      if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader
    val raw = bounded.parquet(dir)
    val ts = fileSchema("ts").dataType match {
      case LongType => timestamp_micros(expr("ts div 1000"))
      case TimestampNTZType => col("ts").cast("timestamp")
      case _ => col("ts")
    }
    raw.withColumn("ts", ts)
  }

  /** Watermarked tumbling-window counts per event type — the streaming
    * twin of SparkEntry q20. Late events beyond `lateness` are dropped;
    * state per open window is O(|event types|). */
  def hourlyCounts(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_us"), col("event_type"),
        col("cnt"), col("sum_value"))

  /** Watermarked session windows per user (the streaming twin of
    * SparkEntry q42's batch session_window): sessions close `gap` after
    * their last event; state per open session is O(1) and bounded by
    * the watermark. */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
                   lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("events_in_session"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("events_in_session"))

  /** Keyed dedup with watermark-bounded state (D1 made streaming):
    * duplicates of event_id within the lateness horizon are dropped. */
  def dedupEvents(events: DataFrame, lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Arbitrary-stateful aggregation via mapGroupsWithState: a running
    * per-user profile (event count, value sum, last-seen micros) that
    * survives across micro-batches — state the built-in windowed aggs
    * can't express.
    *
    * Without `stateTtl` the state grows with the key domain forever —
    * fine for a bounded dimension (user ids in a warehouse), a leak on
    * an unbounded one (session tokens, crawl URLs). With `stateTtl`
    * set, an EventTimeTimeout evicts any key idle past the TTL: the
    * input must be watermarked (`lateness`), each update re-arms the
    * timeout at lastSeen + TTL, and when the watermark passes it the
    * group fires once more (emitting its final profile) and the state
    * is REMOVED — a later event for the same key restarts from zero.
    * Eviction + restart are exercised in StreamingSpec. */
  final case class UserProfile(userId: Long, events: Long, valueSum: Double,
                               lastSeenUs: Long)

  def userProfiles(events: DataFrame, stateTtl: Option[String] = None,
                   lateness: String = "2 hours"):
      org.apache.spark.sql.Dataset[UserProfile] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val spark = events.sparkSession
    import spark.implicits._
    val src = stateTtl match {
      case Some(_) => events.withWatermark("ts", lateness)
      case None => events
    }
    // the watermarked ts column must SURVIVE into the grouped Dataset —
    // event-time timeout is rejected if the child projects the
    // watermark attribute away (only its unix_micros copy is consumed
    // by the state function)
    val typed = src
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("ts_us"),
        col("ts"))
      .as[(Long, Double, Long, java.sql.Timestamp)]
    val ttlMs = stateTtl.map(t =>
      org.apache.spark.sql.catalyst.util.IntervalUtils
        .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(t)))
      .map(i => i.months * 2592000000L + i.days * 86400000L +
        i.microseconds / 1000L)
    val timeoutConf = if (ttlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    typed.groupByKey(_._1)
      .mapGroupsWithState[UserProfile, UserProfile](timeoutConf) {
        (userId: Long, rows: Iterator[(Long, Double, Long, java.sql.Timestamp)],
         state: GroupState[UserProfile]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: emit the final profile and drop the state
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0, 0L))
            val batch = rows.toSeq
            val next = UserProfile(
              userId,
              prev.events + batch.size,
              prev.valueSum + batch.map(_._2).sum,
              math.max(prev.lastSeenUs,
                if (batch.isEmpty) 0L else batch.map(_._3).max))
            state.update(next)
            ttlMs.foreach { ttl =>
              // re-arm at lastSeen + TTL; never behind the watermark
              // (setTimeoutTimestamp rejects already-passed instants)
              state.setTimeoutTimestamp(
                math.max(next.lastSeenUs / 1000L + ttl,
                  state.getCurrentWatermarkMs() + 1L))
            }
            next
          }
      }
  }

  /** Stream-stream INTERVAL join — windowed click->purchase attribution
    * candidates: each purchase joins the same user's clicks within
    * `horizon` before it. Both sides carry watermarks and the join
    * condition bounds event-time distance, so Spark can evict state: a
    * buffered click is dropped once the purchase-side watermark passes
    * `c_ts + horizon`, a purchase when its own side's passes. Append
    * mode; the as-of (last-touch) refinement of these candidates is the
    * batch `Joins.asofJoin` (q68) — a stream cannot argmax over a
    * not-yet-closed candidate set without waiting out the watermark. */
  def clickAttribution(events: DataFrame, horizon: String = "1 hour",
                       lateness: String = "2 hours"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", lateness)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", lateness)
    purchases.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("c_ts")).as("c_us"))
  }

  /** Web-curation GATE as a stream transform — the q202/q223 funnel's
    * stateless front end (robots policy -> HTML->text extraction ->
    * blocklist gate) applied to a stream of crawled pages, the
    * reference's 12-h ingest loop (`dags/dag.py:288`) carried to the
    * web tier. Emits the surviving rows with `etext` (extracted text)
    * and `n_tok` added.
    *
    * Stateless by construction — every step is a per-row projection or
    * filter — so it composes with ANY downstream sink without changing
    * that sink's crash contract: a replayed micro-batch re-gates to
    * the identical row set (all three steps are deterministic), which
    * is exactly what the downstream dedup/pack recovery protocols
    * assume of their input. Rehearsed end-to-end (crash inside the
    * gated ingest stage, pack spanning the restart) in StreamingSpec. */
  def curationGate(pages: DataFrame, htmlCol: String,
                   blocklist: Seq[String] = Seq("slow"),
                   maxBlocklistHits: Int = 2): DataFrame = {
    import etlmudah.web.Web
    pages
      .filter(!Web.metaNoindex(col(htmlCol)))
      .withColumn("etext", Web.htmlToText(col(htmlCol)))
      .filter(TextStats.blocklistHitCount(col("etext"), blocklist)
        <= maxBlocklistHits)
      .withColumn("n_tok", TextStats.tokenCount(col("etext")))
  }

  /** Continuous dedup ingest — `Dedup.incrementalDedup` as a stream
    * sink: every micro-batch classifies its documents against the
    * standing FINGERPRINT table (never the raw corpus — the only state
    * a 100 TB dedup needs is 16 bytes per distinct document), appends
    * only first sightings, and advances the fingerprint set.
    *
    * Idempotency without a transaction log: survivors land in a
    * `batch_id=<n>` partition via DYNAMIC partition overwrite, so a
    * re-delivered batch rewrites exactly its own partition (or touches
    * nothing when it now classifies as all-duplicate); the fingerprint
    * table is a distinct set union — re-applying it is a no-op — and
    * swaps in via a RECOVERABLE three-step rename (write `__tmp`,
    * rename live table aside to `__old`, rename `__tmp` in): the live
    * path is only ever absent between the two renames, at which point
    * `__tmp` is known-complete, so batch-begin recovery (restore from
    * `__tmp`, else `__old`) plus the set-union no-op makes every crash
    * point replay to the same converged state — a plain
    * delete-then-rename would lose the whole fingerprint state to a
    * crash between the delete and the rename. Crash-torn layouts are
    * exercised in StreamingSpec. */
  def dedupIngestSink(docs: DataFrame, basePath: String, fpPath: String,
                      checkpoint: String, textCol: String = "text",
                      idCol: String = "doc_id"):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val conf = spark.sparkContext.hadoopConfiguration
        val fpTarget = new org.apache.hadoop.fs.Path(fpPath)
        val fs = fpTarget.getFileSystem(conf)
        recoverSwap(fs, fpPath)
        val batchFp = batch.withColumn("__fp",
          TextStats.fingerprint(col(textCol)))
        val corpusFp =
          if (fs.exists(fpTarget)) spark.read.parquet(fpPath)
          else batchFp.select(col("__fp")).limit(0)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__fp")).orderBy(col(idCol).asc)
        val survivors = batchFp
          .join(corpusFp.select(col("__fp")).distinct()
            .withColumn("__in", lit(true)), Seq("__fp"), "left")
          .withColumn("__rn", row_number().over(w))
          .filter(col("__in").isNull && col("__rn") === 1)
          .drop("__in", "__rn", "__fp")
        survivors.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(basePath)
        val advanced = batchFp.select(col("__fp"))
          .union(corpusFp.select(col("__fp"))).distinct()
        swapIn(fs, fpPath)(tmp =>
          advanced.write.mode("overwrite").parquet(tmp))
        ()
      }

  /** Continuous DECONTAMINATION ingest — the winnow screening tier as a
    * stream sink: arriving documents are fingerprinted per micro-batch
    * and screened against a STATIC reference fingerprint set (the
    * benchmark/eval corpora — winnowed once, here reduced to its
    * df-capped inverted index at sink construction and reused every
    * batch). Clean documents append under `cleanPath/batch_id=<n>`,
    * contaminated ones land under `quarantinePath/batch_id=<n>` with
    * their (ref_id, shared) evidence — quarantined, never silently
    * dropped, so a human can audit the screen.
    *
    * Idempotency needs NO cross-batch state: the reference index is
    * immutable and per-doc screening is batch-local, so a re-delivered
    * batch recomputes the identical clean/quarantine split and its
    * dynamic `batch_id` partition overwrite converges — the simplest
    * recovery contract of the sink family, and exactly why the
    * reference-side-only df cap matters (a union-df cap would make the
    * verdict depend on which batch a document arrived in).
    *
    * At 100 TB: the capped reference index is benchmark-sized and
    * broadcast; per-batch cost is one fingerprint pass over the batch
    * plus a broadcast join — no shuffle of the corpus, no state to
    * compact. */
  def decontaminationSink(docs: DataFrame, refFps: DataFrame,
                          cleanPath: String, quarantinePath: String,
                          checkpoint: String, textCol: String = "text",
                          idCol: String = "doc_id", k: Int = 3, w: Int = 4,
                          minShared: Long = 2L, maxDf: Long = 50L):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // the df-capped inverted index built ONCE per sink and persisted
    // WITH lineage: persist (not localCheckpoint) because this table
    // lives for the sink's whole lifetime — lineage-severed
    // unreplicated checkpoint blocks would kill the stream permanently
    // on any executor loss, while persisted partitions just recompute.
    // The sibling sinks' per-batch localCheckpoints are exposed for
    // seconds; this one would be exposed indefinitely.
    val refIndex = etlmudah.scale.Dedup.winnowRefIndex(refFps, maxDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // both output writes scan the source batch; persist it once
        val b = batch.persist()
        try {
          val fps = etlmudah.scale.Dedup.winnowFingerprints(
            b, textCol, idCol, k, w)
          // unsorted screen (the sink only joins on the result; q172's
          // registry path adds the deterministic sort for its oracle)
          val hits = etlmudah.scale.Dedup.winnowScreenAgainstIndex(
              fps, refIndex, minShared)
            .localCheckpoint(true) // feeds the quarantine join AND the anti
          b.join(hits.select(col("id").as(idCol)), Seq(idCol), "left_anti")
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cleanPath)
          b.join(hits.withColumnRenamed("id", idCol), Seq(idCol))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(quarantinePath)
        } finally b.unpersist()
        ()
      }
  }

  /** Continuous QUALITY-GATE ingest — the q182 model gate as a stream
    * sink: each arriving document is normalized (`cleanText`) and
    * scored by the hashed linear classifier; keepers append under
    * `keepPath/batch_id=<n>` carrying (clean_text, score), rejects
    * land under `rejectPath/batch_id=<n>` with their score — never
    * silently dropped, so the gate's calibration can be audited from
    * the reject stream (the decontaminationSink audit contract).
    *
    * Per-document scoring is stateless and deterministic (md5-lattice
    * weights, BIGINT sum, one rounded division), so verdicts are
    * independent of how documents batch and a re-delivered batch
    * rewrites its `batch_id` partitions with identical content — the
    * decontaminationSink recovery contract verbatim, no cross-batch
    * state to compact or corrupt.
    *
    * At sustained crawl volume: the whole batch computation is a
    * per-row projection plus ONE id-keyed aggregate; nothing joins
    * corpus-sized state. A trained model swaps in as a broadcast
    * (bucket, weight) table against the same movement
    * (`hashedLinearScore`'s contract). */
  def qualityGateSink(docs: DataFrame, keepPath: String, rejectPath: String,
                      checkpoint: String, textCol: String = "text",
                      idCol: String = "doc_id", minScore: Double = 0.0,
                      buckets: Int = 1024, salt: String = "q",
                      trainedWeights: Option[DataFrame] = None):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // both output writes scan the batch; persist the cleaned form once
        val b = batch
          .withColumn("clean_text", TextStats.cleanText(col(textCol)))
          .persist()
        try {
          // the scaladoc's promised model swap made concrete: a TRAINED
          // (bucket, w6) frame (trainHashedLogReg output) replaces the
          // md5-lattice expression on the identical movement — train
          // offline on the standing corpus, deploy on the live gate
          val scored = trainedWeights.fold(
              TextStats.hashedLinearScore(b, "clean_text", idCol, buckets,
                salt))(w =>
              TextStats.scoreWithWeights(b, "clean_text", idCol, w, buckets))
            .select(col("id").as(idCol), col("score"))
            .localCheckpoint(true)   // feeds the keep AND reject splits
          // LEFT join: a null-text document produces no score row (the
          // scorer's explode emits nothing), and an inner join would
          // silently drop it from BOTH outputs — it must land in the
          // reject stream with a null score, honoring the audit contract
          val joined = b.join(scored, Seq(idCol), "left")
          def out(df: DataFrame, path: String): Unit =
            df.withColumn("batch_id", lit(batchId))
              .write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("batch_id")
              .parquet(path)
          out(joined.filter(col("score").isNotNull &&
            col("score") >= minScore), keepPath)
          out(joined.filter(col("score").isNull ||
            col("score") < minScore), rejectPath)
        } finally b.unpersist()
        ()
      }

  /** Continuous anomaly monitoring — `Analytics.anomalyZ` as a stream
    * sink: each micro-batch's events fold into a standing HOURLY COUNT
    * table (batches may split an hour — the merge re-sums per (key,
    * hour)), and the full z-score report recomputes over that state.
    * The state is the aggregated bucket frame, bounded by |keys| x
    * time horizon — never raw events — so recomputing the keyed
    * window over it is cheap at any event volume; a deployment that
    * wants incremental scoring would window only the tail, same
    * state.
    *
    * Idempotency: a naive "re-sum state + batch" would DOUBLE-count a
    * re-delivered batch, so the state is per-batch hourly partials in
    * a `batch_id=<n>` partition (dynamic overwrite — the
    * [[dedupIngestSink]] pattern): re-delivery rewrites exactly its
    * own partition, and the scoring pass re-aggregates partials
    * across batches (batches that split an hour sum correctly). Every
    * `compactEvery` batches the partitions below the checkpoint
    * frontier collapse into one (the [[shardExportSink]] scheme), so
    * the state listing stays bounded instead of growing one directory
    * per batch forever. The report is a wholesale overwrite. Verified
    * stream==batch and re-run-convergent in StreamingSpec. */
  def anomalySink(events: DataFrame, statePath: String, outPath: String,
                  checkpoint: String, keyCol: String = "event_type",
                  lookback: Int = 24, compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stateFs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(stateFs, statePath)
        batch
          .groupBy(col(keyCol), date_trunc("hour", col("ts")).as("__hour"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        // rows are bounded (hourly partials), but one partition DIR per
        // batch makes the state listing grow O(#batches) — every
        // compactEvery batches, rows below the current batch collapse
        // into the batchId-1 partition (greatest keeps the current row
        // its own partition, so a re-delivered compaction batch's
        // dynamic overwrite replaces rather than double-counts — the
        // shardExportSink scheme) behind the recoverable swap
        if (batchId > 0 && batchId % compactEvery == 0) {
          val compacted = spark.read.parquet(statePath)
            .withColumn("batch_id",
              greatest(col("batch_id"), lit(batchId - 1)))
            .groupBy(col(keyCol), col("__hour"), col("batch_id"))
            .agg(sum(col("cnt")).as("cnt"))
            .select(col(keyCol), col("__hour"), col("cnt"), col("batch_id"))
            .localCheckpoint(true)   // sever lineage from the live path
          swapIn(stateFs, statePath)(tmp =>
            compacted.write.mode("overwrite")
              .partitionBy("batch_id").parquet(tmp))
        }
        // score the standing bucket frame via the SAME code path as the
        // batch operator (Analytics.scoreHourly: per-key hour
        // densification + exact-integer window sums), so stream==batch
        // holds by construction. The report swaps in recoverably so a
        // reader never observes a torn rewrite.
        val fs = new org.apache.hadoop.fs.Path(outPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(fs, outPath)
        val report = etlmudah.analytics.Analytics.scoreHourly(
          spark.read.parquet(statePath)
            .groupBy(col(keyCol), col("__hour"))
            .agg(sum(col("cnt")).as("cnt")),
          keyCol, lookback)
        swapIn(fs, outPath)(tmp =>
          report.write.mode("overwrite").parquet(tmp))
        ()
      }

  /** Continuous distribution-drift monitoring — `Profile.driftPsi` as
    * a stream sink: a REFERENCE histogram of `valueCol` is materialized
    * once at sink construction; each micro-batch folds its binned
    * counts into a standing state table, and the PSI report of
    * (reference vs everything streamed so far) is rewritten per batch.
    * The ingestion-time "did the new crawl shift the distribution"
    * gate.
    *
    * Same idempotency scheme as [[anomalySink]]: per-batch bin partials
    * live in a `batch_id=<n>` partition (dynamic overwrite), so a
    * re-delivered batch rewrites exactly its own partition and the
    * report re-aggregates partials — re-runs converge; every
    * `compactEvery` batches the partitions below the checkpoint
    * frontier collapse into one so the listing stays bounded. The
    * report goes through `Profile.psiFromCounts`, the SAME code path
    * as the batch operator, so stream == batch by construction
    * (verified in StreamingSpec). State is the binned frame — bounded
    * by |bins|, never raw rows. */
  def driftSink(rows: DataFrame, ref: DataFrame, valueCol: String,
                binWidth: Double, statePath: String, outPath: String,
                checkpoint: String, eps: Double = 1e-6,
                compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // reference histogram written once, driver-side, before the stream
    // starts; deterministic so a restart rewrites the identical frame
    etlmudah.analytics.Profile.binCounts(ref, valueCol, binWidth)
      .write.mode("overwrite").parquet(statePath + "__ref")
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stateFs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(stateFs, statePath)
        etlmudah.analytics.Profile.binCounts(batch, valueCol, binWidth)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        // same O(#batches) partition-listing fix as [[anomalySink]]:
        // collapse rows below the current batch into batchId-1 behind
        // the recoverable swap; re-delivered compaction batches converge
        if (batchId > 0 && batchId % compactEvery == 0) {
          val compacted = spark.read.parquet(statePath)
            .withColumn("batch_id",
              greatest(col("batch_id"), lit(batchId - 1)))
            .groupBy(col("bin"), col("batch_id"))
            .agg(sum(col("cnt")).as("cnt"))
            .select(col("bin"), col("cnt"), col("batch_id"))
            .localCheckpoint(true)   // sever lineage from the live path
          swapIn(stateFs, statePath)(tmp =>
            compacted.write.mode("overwrite")
              .partitionBy("batch_id").parquet(tmp))
        }
        val refBins = spark.read.parquet(statePath + "__ref")
          .select(col("bin"), col("cnt").as("n_base"))
        val streamBins = spark.read.parquet(statePath)
          .groupBy(col("bin")).agg(sum(col("cnt")).as("n_next"))
        val counts = refBins.join(streamBins, Seq("bin"), "full_outer")
          .select(col("bin"),
            coalesce(col("n_base"), lit(0L)).as("n_base"),
            coalesce(col("n_next"), lit(0L)).as("n_next"))
        // recoverable report swap — readers never observe a torn rewrite
        val fs = new org.apache.hadoop.fs.Path(outPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(fs, outPath)
        val report = etlmudah.analytics.Profile.psiFromCounts(counts, eps)
        swapIn(fs, outPath)(tmp =>
          report.write.mode("overwrite").parquet(tmp))
        ()
      }
  }

  /** Continuous HEAVY-HITTER monitoring — the count-min sketch
    * ([[etlmudah.scale.Sketches]], q231) as a stream sink, exercising
    * the property the sketch exists for: MERGEABILITY. Each
    * micro-batch folds its own graft_cms grid (one partial-aggregated
    * pass over the batch) and lands it EXPLODED to nonzero (pos, cnt)
    * rows in a batch_id partition; the standing grid is then plain
    * addition over partials — re-delivered batches rewrite exactly
    * their own partition (dynamic overwrite), so re-runs converge.
    * Exact per-key counts ride a second partial frame the same way
    * (the certification side; a sketch-only deployment drops it — the
    * q231 trade dial). The report rebuilds the single-row sketch from
    * partials ([[etlmudah.scale.Sketches.cmsFromParts]] — map lookup,
    * no ordering anywhere) and goes through Sketches.cmsReport, the
    * SAME code path as the batch operator, so stream == batch by
    * construction. Same compaction + recoverable-swap scheme as
    * [[driftSink]]; state stays bounded by |keys| + depth*width. */
  /** Streaming DISTINCT-COUNT sink over the portable HLL registers —
    * the union algebra q240 proves, run as a stream: each micro-batch
    * folds its OWN ≤ m register rows (`Sketches.hllRegisterTable`, the
    * only corpus-sized work) into a batch_id-partitioned state
    * partition (dynamic overwrite → re-delivered batches converge
    * exactly), and the standing sketch is the per-bucket MAX across
    * partitions — so the streamed estimate equals the one-shot batch
    * HLL of everything seen, REGISTER-FOR-REGISTER (merge is exact;
    * approximation lives only between sketch and truth). State is
    * ≤ m × batches-since-compaction rows and max-collapses every
    * `compactEvery` batches (current batch keeps its own partition so
    * idempotent re-delivery survives compaction). The report swaps in
    * atomically ([[recoverSwap]]/[[swapIn]]). */
  def hllDistinctSink(rows: DataFrame, keyCol: String, statePath: String,
                      outPath: String, checkpoint: String, b: Int = 6,
                      compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import etlmudah.scale.Sketches
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stateFs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(stateFs, statePath)
        Sketches.hllRegisterTable(batch, keyCol, b)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(statePath)
        if (batchId > 0 && batchId % compactEvery == 0) {
          val compacted = spark.read.parquet(statePath)
            .withColumn("batch_id",
              greatest(col("batch_id"), lit(batchId - 1)))
            .groupBy(col("batch_id"), col("bucket"))
            .agg(max(col("reg")).as("reg"))
            .select(col("bucket"), col("reg"), col("batch_id"))
            .localCheckpoint(true)
          swapIn(stateFs, statePath)(tmp =>
            compacted.write.mode("overwrite")
              .partitionBy("batch_id").parquet(tmp))
        }
        val regs = spark.read.parquet(statePath)
          .groupBy(col("bucket")).agg(max(col("reg")).as("reg"))
        val report = Sketches.hllReportFromRegs(regs, b)
        val fs = new org.apache.hadoop.fs.Path(outPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(fs, outPath)
        swapIn(fs, outPath)(tmp =>
          report.write.mode("overwrite").parquet(tmp))
        ()
      }
  }

  def heavyHitterSink(rows: DataFrame, keyCol: String, statePath: String,
                      outPath: String, checkpoint: String,
                      depth: Int = 4, width: Int = 256, topN: Int = 10,
                      compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import etlmudah.scale.Sketches
    val keysPath = statePath + "__keys"
    val gridPath = statePath + "__grid"
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stateFs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(stateFs, keysPath)
        recoverSwap(stateFs, gridPath)
        batch.groupBy(col(keyCol).cast("string").as("key"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(keysPath)
        Sketches.cmsSketch(batch, keyCol, depth, width)
          .select(posexplode(col("sketch")).as(Seq("pos", "cnt")))
          .where(col("cnt") > 0)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(gridPath)
        if (batchId > 0 && batchId % compactEvery == 0) {
          def compact(path: String, keyCols: Seq[String]): Unit = {
            val compacted = spark.read.parquet(path)
              .withColumn("batch_id",
                greatest(col("batch_id"), lit(batchId - 1)))
              .groupBy(col("batch_id") +: keyCols.map(col): _*)
              .agg(sum(col("cnt")).as("cnt"))
              .select(keyCols.map(col) :+ col("cnt") :+ col("batch_id"): _*)
              .localCheckpoint(true)
            swapIn(stateFs, path)(tmp =>
              compacted.write.mode("overwrite")
                .partitionBy("batch_id").parquet(tmp))
          }
          compact(keysPath, Seq("key"))
          compact(gridPath, Seq("pos"))
        }
        val keyCounts = spark.read.parquet(keysPath)
          .groupBy(col("key")).agg(sum(col("cnt")).as("n_exact"))
        val sketch = Sketches.cmsFromParts(
          spark.read.parquet(gridPath).select(col("pos"), col("cnt")),
          depth, width)
        val report = Sketches.cmsReport(keyCounts, sketch,
          depth, width, topN)
        val fs = new org.apache.hadoop.fs.Path(outPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(fs, outPath)
        swapIn(fs, outPath)(tmp =>
          report.write.mode("overwrite").parquet(tmp))
        ()
      }
  }

  /** STREAM–STREAM event-time interval join — last-click attribution
    * computed between two LIVE streams (the q68/q84 as-of shape moved
    * to the streaming tier): each purchase joins the clicks of the
    * same user that happened within `windowUs` BEFORE it. Both sides
    * carry watermarks, and the join condition bounds event-time
    * distance from BOTH directions, which is exactly what lets Spark
    * expire state: a click older than (purchase watermark − window)
    * can never match again and drops from the state store — bounded
    * state on unbounded streams, the thing an unconstrained
    * stream-stream join cannot promise.
    *
    * Returns the joined frame (one row per qualifying click-purchase
    * pair; downstream picks last-touch with a batch window if needed).
    * Inner join: late rows beyond the watermark drop on arrival, so
    * re-delivery converges. Timestamps compare as TimestampType on the
    * micros lattice — no float time anywhere. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      userCol: String, tsCol: String,
                      windowUs: Long, lateness: String = "10 minutes")
      : DataFrame = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    val c = clicks
      .select(col(userCol).as("c_user"), col(tsCol).as("c_ts"))
      .withWatermark("c_ts", lateness)
    val p = purchases
      .select(col(userCol).as("p_user"), col(tsCol).as("p_ts"))
      .withWatermark("p_ts", lateness)
    c.join(p,
      col("c_user") === col("p_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowUs MICROSECOND"))
  }

  /** WATERMARKED LEFT-OUTER stream-stream interval join — the
    * "purchases with or without a preceding click" readout
    * [[attributionJoin]] cannot express: every purchase emits, either
    * joined to each qualifying click of the same user within
    * `windowUs` BEFORE it, or exactly once NULL-PADDED when the
    * engine proves no click can arrive anymore (the null row is
    * emitted ON STATE EVICTION — once the watermark passes the
    * purchase's match window, not speculatively, so a late-but-
    * in-watermark click can never contradict an already-emitted null).
    *
    * Same bounded-state story as the inner form: both sides carry
    * watermarks and the condition bounds event-time distance from
    * both directions, so click state older than (watermark − window)
    * and purchase state older than the watermark expire. The
    * OPERATIONAL caveat the spec pins: null-padded results for a
    * purchase surface only AFTER a later batch advances the watermark
    * past its window — a drained stream holds the tail's verdicts
    * until more data (or a heartbeat event) arrives. That is the
    * engine's correctness guarantee, not a defect: emitting the null
    * early could be contradicted by an in-watermark click.
    *
    * Returns (p_user, p_ts, c_ts nullable); timestamps compare as
    * TimestampType on the micros lattice. */
  def attributionJoinLeftOuter(purchases: DataFrame, clicks: DataFrame,
                               userCol: String, tsCol: String,
                               windowUs: Long,
                               lateness: String = "10 minutes")
      : DataFrame = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    val p = purchases
      .select(col(userCol).as("p_user"), col(tsCol).as("p_ts"))
      .withWatermark("p_ts", lateness)
    val c = clicks
      .select(col(userCol).as("c_user"), col(tsCol).as("c_ts"))
      .withWatermark("c_ts", lateness)
    p.join(c,
        col("c_user") === col("p_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") -
            expr(s"INTERVAL $windowUs MICROSECOND"),
        "left_outer")
      .select(col("p_user"), col("p_ts"), col("c_ts"))
  }

  /** WATERMARKED FULL-OUTER stream-stream interval join — the last
    * standard join shape beside the inner (q84 twin) and left-outer
    * forms: every purchase emits (joined or null-padded once its
    * match window closes) AND every click emits (joined or
    * null-padded once no future purchase can reach back to it —
    * its own window end is c_ts + windowUs). BOTH eviction
    * directions null-pad, so the output carries both key columns:
    * (p_user, p_ts, c_user, c_ts), exactly one side null on an
    * unmatched row.
    *
    * Same bounded-state argument as [[attributionJoinLeftOuter]]:
    * watermarks on both sides + a condition bounding event-time
    * distance in both directions lets the engine expire click state
    * older than (watermark − window) and purchase state older than
    * the watermark. Same operational caveat, now in BOTH directions:
    * a null verdict surfaces only after a LATER batch advances the
    * watermark past the row's window — early emission could be
    * contradicted by an in-watermark arrival on the other side. */
  def attributionJoinFullOuter(purchases: DataFrame, clicks: DataFrame,
                               userCol: String, tsCol: String,
                               windowUs: Long,
                               lateness: String = "10 minutes")
      : DataFrame = {
    require(windowUs > 0, s"windowUs must be > 0, got $windowUs")
    val p = purchases
      .select(col(userCol).as("p_user"), col(tsCol).as("p_ts"))
      .withWatermark("p_ts", lateness)
    val c = clicks
      .select(col(userCol).as("c_user"), col(tsCol).as("c_ts"))
      .withWatermark("c_ts", lateness)
    p.join(c,
        col("c_user") === col("p_user") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") -
            expr(s"INTERVAL $windowUs MICROSECOND"),
        "full_outer")
      .select(col("p_user"), col("p_ts"), col("c_user"), col("c_ts"))
  }

  /** Continuous TOP-K leaderboard — the `graft_topk` bounded heap
    * ([[etlmudah.analytics.Analytics.topNPerGroupAgg]]) run as a sink,
    * exercising its MERGEABILITY the way [[heavyHitterSink]] exercises
    * the CMS grid: the global top-k of a union is contained in the
    * union of per-part top-ks (any globally-surviving row survives its
    * own part), so each micro-batch lands only its ≤k survivors per
    * group in a batch_id partition, the standing state is the union,
    * and every report (and compaction) is the SAME aggregate re-run
    * over ≤k·batches rows per group — exact, never approximate.
    *
    * This is the "largest events per type so far" monitor: row scores
    * are independent (a max-like statistic), where accumulating COUNTS
    * per key needs [[heavyHitterSink]]'s additive grid instead — the
    * two sinks split the leaderboard space the way max and sum split
    * aggregation.
    *
    * Same idempotency scheme as the sibling sinks: dynamic-overwrite
    * batch partitions make re-delivery converge; compaction collapses
    * old partitions behind the recoverable swap; state is bounded by
    * k rows per (group x live partition). */
  def topkSink(rows: DataFrame, keyCol: String, scoreCol: String,
               tagCol: String, statePath: String, outPath: String,
               checkpoint: String, k: Int = 10, compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stateFs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(stateFs, statePath)
        batch.select(col(keyCol).cast("string").as("key"),
            col(scoreCol).cast("double").as("__s"),
            col(tagCol).cast("string").as("__t"))
          .groupBy(col("key"))
          .agg(expr(s"graft_topk(__s, __t, $k)").as("__top"))
          .select(col("key"), explode(col("__top")).as("__e"))
          .select(col("key"), col("__e.score").as("score"),
            col("__e.tag").as("tag"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(statePath)
        if (batchId > 0 && batchId % compactEvery == 0) {
          val compacted = spark.read.parquet(statePath)
            .withColumn("batch_id",
              greatest(col("batch_id"), lit(batchId - 1)))
            .groupBy(col("batch_id"), col("key"))
            .agg(expr(s"graft_topk(score, tag, $k)").as("__top"))
            .select(col("key"), explode(col("__top")).as("__e"),
              col("batch_id"))
            .select(col("key"), col("__e.score").as("score"),
              col("__e.tag").as("tag"), col("batch_id"))
            .localCheckpoint(true)
          swapIn(stateFs, statePath)(tmp =>
            compacted.write.mode("overwrite")
              .partitionBy("batch_id").parquet(tmp))
        }
        val report = spark.read.parquet(statePath)
          .groupBy(col("key"))
          .agg(expr(s"graft_topk(score, tag, $k)").as("__top"))
          .select(col("key"), posexplode(col("__top")).as(Seq("pos", "__e")))
          .select(col("key"), (col("pos") + 1).cast("long").as("rank"),
            col("__e.score").as("score"), col("__e.tag").as("tag"))
        val fs = new org.apache.hadoop.fs.Path(outPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(fs, outPath)
        swapIn(fs, outPath)(tmp =>
          report.write.mode("overwrite").parquet(tmp))
        ()
      }
  }

  /** Continuous EMBEDDING-SPECTRUM drift monitoring — the exact-integer
    * PCA tier ([[etlmudah.scale.Spectral]], q232) as a stream sink,
    * exercising graft_gram's MERGEABILITY the way [[heavyHitterSink]]
    * exercises the CMS grid: each micro-batch folds its own Gram
    * buffer (one partial-aggregated pass) and lands it exploded to
    * (pos, cnt) rows in a batch_id partition; the standing second-
    * moment state is plain addition over partials — EXACT, so the
    * stream's component equals the batch component over the same rows,
    * integer for integer. Each report re-derives the current top
    * component (the same [[etlmudah.scale.Spectral.powerIterate]] code
    * path as batch q232, over the bounded d^2 collect) and scores its
    * alignment with a once-materialized REFERENCE component:
    * cos = |v.vRef| / (|v||vRef|) — the "did the new crawl rotate the
    * embedding space" gate, the spectral twin of [[driftSink]]'s PSI.
    * Same idempotency scheme: dynamic-overwrite batch partitions,
    * periodic compaction behind the recoverable swap; state is bounded
    * by d^2 + d + 1 rows per live partition. */
  def pcaDriftSink(rows: DataFrame, vecCol: String, ref: DataFrame,
                   statePath: String, outPath: String, checkpoint: String,
                   dims: Int = 64, scale: Int = 1024, iters: Int = 3,
                   compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import etlmudah.scale.Spectral
    // reference component materialized once, driver-side, before the
    // stream starts; deterministic, so a restart rewrites it identically
    val refSpark = ref.sparkSession
    val refPacked = Spectral.gramSums(ref, vecCol, dims, scale)
      .collect()(0).getSeq[Long](0).toArray
    val (vRef, _, _) = Spectral.powerIterate(refPacked, dims, iters)
    import refSpark.implicits._
    vRef.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toSeq
      .toDF("idx", "v").write.mode("overwrite").parquet(statePath + "__ref")
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val stateFs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(stateFs, statePath)
        Spectral.gramSums(batch, vecCol, dims, scale)
          .select(posexplode(col("g")).as(Seq("pos", "cnt")))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(statePath)
        if (batchId > 0 && batchId % compactEvery == 0) {
          val compacted = spark.read.parquet(statePath)
            .withColumn("batch_id",
              greatest(col("batch_id"), lit(batchId - 1)))
            .groupBy(col("pos"), col("batch_id"))
            .agg(sum(col("cnt")).as("cnt"))
            .select(col("pos"), col("cnt"), col("batch_id"))
            .localCheckpoint(true)
          swapIn(stateFs, statePath)(tmp =>
            compacted.write.mode("overwrite")
              .partitionBy("batch_id").parquet(tmp))
        }
        // standing Gram = sum of partials; bounded d^2+d+1 collect
        val packed = new Array[Long](dims * dims + dims + 1)
        spark.read.parquet(statePath)
          .groupBy(col("pos")).agg(sum(col("cnt")).as("cnt"))
          .collect().foreach(r =>
            packed(r.getInt(0)) = r.getLong(1))
        val (vCur, num, den) = Spectral.powerIterate(packed, dims, iters)
        val refV = spark.read.parquet(statePath + "__ref")
          .orderBy(col("idx")).collect().map(_.getLong(1))
        val dot = vCur.zip(refV).map { case (a, b) => a * b }.sum
        val cos = math.abs(dot.toDouble) /
          (math.sqrt(vCur.map(x => x.toDouble * x).sum) *
            math.sqrt(refV.map(x => x.toDouble * x).sum))
        import spark.implicits._
        val report = vCur.zipWithIndex.map { case (x, i) =>
          (i.toLong, x, refV(i), packed(dims * dims + dims),
            BigDecimal.valueOf(cos).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble, num, den) }
          .toSeq.toDF("idx", "v", "v_ref", "n_rows", "cos_ref",
            "ray_num", "ray_den")
        val fs = new org.apache.hadoop.fs.Path(outPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(fs, outPath)
        swapIn(fs, outPath)(tmp =>
          report.write.mode("overwrite").parquet(tmp))
        ()
      }
  }

  /** Incremental token-balanced shard EXPORT — `Sampling.shardAssign`
    * as a stream sink: each micro-batch's rows are assigned export
    * shards continuing the running byte offset where the previous batch
    * stopped, so the shard sequence is contiguous across the whole
    * stream (the "write the live ingest as N-token shards" op; batch
    * q138 is the static-corpus twin).
    *
    * State is an offsets ledger of (batch_id, batch_bytes) partitioned
    * by batch_id (dynamic overwrite): batch N's start offset is the
    * ledger sum over batch_id < N, so a re-delivered batch recomputes
    * the identical offset and rewrites exactly its own output
    * partition — re-runs converge (StreamingSpec). The ledger read is
    * one row per batch, the start-offset lookup a bounded 1-row
    * aggregate; assignment inside the batch is the same distributed
    * prefix sum as q138.
    *
    * Rows are bounded, but one partition DIRECTORY per batch makes the
    * ledger listing grow O(#batches) forever — so every `compactEvery`
    * batches the rows below the current batch collapse into a single
    * running-total row. The compacted row keeps batch_id = current - 1,
    * so a re-delivery of the current batch still computes the identical
    * `batch_id < N` start offset, and its own dynamic-overwrite row
    * never collides with the compacted partition. The rewrite goes
    * through [[swapIn]] (with [[recoverSwap]] at batch start), so a
    * crash mid-compaction cannot lose the ledger. */
  def shardExportSink(rows: DataFrame, keyCol: String, sizeCol: String,
                      shardBudget: Long, statePath: String, outPath: String,
                      checkpoint: String, compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val start = ledgerStartOffset(batch, sizeCol, statePath, batchId)
        etlmudah.scale.Sampling.shardAssign(batch, keyCol, sizeCol,
            shardBudget, startOffset = start)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        compactLedger(batch.sparkSession, statePath, batchId, compactEvery)
        ()
      }

  /** Incremental token-level SEQUENCE-PACKING export —
    * `Sampling.packSequences` as a stream sink (the q159 batch op made
    * incremental, exactly as [[shardExportSink]] is q138's): each
    * micro-batch's documents are packed into fixed `ctxLen`-token
    * training windows continuing the global token offset where the
    * previous batch stopped, so pack ids are contiguous across the
    * whole stream and a pack can SPAN a batch boundary (its leading
    * spans come from one batch, its trailing spans from the next —
    * byte-identical to packing the concatenated corpus when keys
    * arrive in key order, which is also [[shardExportSink]]'s
    * contiguity contract).
    *
    * Shares the offsets ledger + `compactEvery` collapse with
    * [[shardExportSink]] (see [[ledgerStartOffset]]): a re-delivered
    * batch recomputes the identical start offset and rewrites exactly
    * its own `batch_id` output partition — re-runs converge. */
  def packExportSink(rows: DataFrame, keyCol: String, sizeCol: String,
                     ctxLen: Long, statePath: String, outPath: String,
                     checkpoint: String, compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val start = ledgerStartOffset(batch, sizeCol, statePath, batchId)
        etlmudah.scale.Sampling.packSequences(batch, keyCol, sizeCol,
            ctxLen, startOffset = start)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        compactLedger(batch.sparkSession, statePath, batchId, compactEvery)
        ()
      }

  /** Shared running-total ledger for the incremental export sinks
    * ([[shardExportSink]], [[packExportSink]]): recovers any torn
    * ledger swap, writes this batch's (batch_id, batch_bytes) row
    * FIRST (so the read below always finds the path; a zero-row batch
    * still writes its one ledger row), and returns the batch's start
    * offset = the ledger sum over batch_id < batchId. The ledger read
    * is bounded: <= compactEvery + 2 rows (the two post-compaction
    * rows plus one per batch since the last compaction). */
  private def ledgerStartOffset(batch: DataFrame, sizeCol: String,
                                statePath: String, batchId: Long): Long = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(statePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, statePath)
    batch.agg(coalesce(sum(col(sizeCol).cast("long")), lit(0L))
        .as("batch_bytes"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(statePath)
    spark.read.parquet(statePath)
      .filter(col("batch_id") < batchId)
      .agg(coalesce(sum(col("batch_bytes")), lit(0L)))
      .head().getLong(0)
  }

  /** Ledger compaction shared by the export sinks: every
    * `compactEvery` batches, rows below the current batch collapse
    * into the batchId-1 partition. Checkpointed batches below the
    * current never re-deliver, so every row with batch_id < batchId
    * collapses UP into batchId-1 (greatest, not least: least would
    * leave rows below batchId-1 uncollapsed and fold the CURRENT row
    * down, so a re-delivered compaction batch — crash between this
    * swap and the checkpoint commit — would sum its own bytes into its
    * start offset and double-count them in a fresh dynamic-overwrite
    * row). Only batchId's own row keeps its partition, so its dynamic
    * re-overwrite replaces rather than duplicates. The rewrite goes
    * through [[swapIn]] (with [[recoverSwap]] at batch start) so a
    * crash mid-compaction cannot lose the ledger. */
  private def compactLedger(spark: SparkSession, statePath: String,
                            batchId: Long, compactEvery: Int): Unit =
    if (batchId > 0 && batchId % compactEvery == 0) {
      val fs = new org.apache.hadoop.fs.Path(statePath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val compacted = spark.read.parquet(statePath)
        .withColumn("batch_id",
          greatest(col("batch_id"), lit(batchId - 1)))
        .groupBy(col("batch_id"))
        .agg(sum(col("batch_bytes")).as("batch_bytes"))
        .select(col("batch_bytes"), col("batch_id"))
        .localCheckpoint(true)   // sever lineage from the live path
      swapIn(fs, statePath)(tmp =>
        compacted.write.mode("overwrite")
          .partitionBy("batch_id").parquet(tmp))
    }

  /** Batch-begin recovery for the per-bucket swap used by
    * [[upsertSink]] — delegates to the shared bucketed-base protocol
    * ([[etlmudah.load.BucketedBase.recoverSwaps]]; invariants
    * documented there). Kept as the streaming-facing name because the
    * sink docs and StreamingSpec's torn-layout rehearsals speak in
    * terms of it. */
  private[streaming] def recoverBucketSwaps(
      fs: org.apache.hadoop.fs.FileSystem, basePath: String): Unit =
    etlmudah.load.BucketedBase.recoverSwaps(fs, basePath)

  /** WATERMARK-LATENESS AUDIT — the operational blind spot the plain
    * watermarked aggregation leaves open: `withWatermark` + windowed
    * agg silently DROPS rows later than the watermark (documented at
    * the top of this file), and at 100 TB "silently" means nobody can
    * say how much data the pipeline lost or prove it was negligible.
    * This sink computes the same hourly counts as [[hourlyCounts]]
    * but classifies every row against the watermark FIRST: on-time
    * rows feed the counts, late rows are COUNTED AND QUARANTINED with
    * event-time evidence (ts, the watermark that rejected them, how
    * late they were) — the decontaminationSink never-silently-dropped
    * contract applied to time instead of contamination.
    *
    * Watermark semantics mirror the engine's: the watermark used for
    * batch N is max(event time over batches < N) − `latenessUs`
    * (Spark computes it from data seen through the previous batch),
    * rows with ts strictly below it are late, and the first batch can
    * never be late. The watermark state is a one-row parquet
    * maintained by [[swapIn]]; late rows advance it too (they pass
    * the watermark node in the engine as well).
    *
    * Idempotency/crash story (the hllDistinctSink conventions):
    * per-batch count PARTIALS and late rows land under
    * `batch_id=<n>` partitions via dynamic overwrite, so a
    * re-delivered batch rewrites its own partitions; the watermark
    * update is a monotone max (replay-safe); partials compact every
    * `compactEvery` batches through the recoverable swap; the report
    * (hour_us, event_type, cnt, sum_value) is the sum of partials,
    * republished per batch via [[swapIn]]. A batch re-delivered
    * AFTER its watermark update replays against the newer watermark
    * and may classify strictly MORE rows late — exactly the engine's
    * monotone-watermark behavior — and rewrites counts and quarantine
    * partitions consistently from that one classification.
    *
    * At scale: the classification is a per-row comparison against one
    * broadcast scalar; partials collapse to the (hour, type) grain
    * map-side; nothing joins corpus-sized state. */
  def latenessAuditSink(events: DataFrame, countsPath: String,
                        latePath: String, statePath: String,
                        checkpoint: String,
                        latenessUs: Long = 7200000000L,
                        compactEvery: Int = 100):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(latenessUs >= 0, s"latenessUs must be >= 0, got $latenessUs")
    val partialsPath = statePath + "__partials"
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val fs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        recoverSwap(fs, statePath)
        val wmUs: Long =
          if (fs.exists(new org.apache.hadoop.fs.Path(statePath)))
            spark.read.parquet(statePath).collect()(0).getLong(0)
          else Long.MinValue
        val b = batch.withColumn("__us", unix_micros(col("ts"))).persist()
        try {
          b.filter(col("__us") < wmUs)
            .select(col("event_id"), col("event_type"),
              col("__us").as("ts_us"), lit(wmUs).as("watermark_us"),
              (lit(wmUs) - col("__us")).as("late_by_us"),
              lit(batchId).as("batch_id"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(latePath)
          b.filter(col("__us") >= wmUs)
            // integer `div` truncates; event time is post-1970 here so
            // truncate == floor (the resampleFill pmod guard is for
            // generic signed inputs)
            .groupBy(expr("__us div 3600000000L").as("__hr"),
              col("event_type"))
            .agg(count(lit(1)).as("cnt"), sum(col("value")).as("value_sum"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(partialsPath)
          // an all-late (or empty) first batch writes ZERO partition
          // dirs under dynamic overwrite — reading the bare directory
          // back would fail schema inference and wedge the stream on
          // every restart (same empty batch re-delivered, same crash).
          // Data exists iff at least one batch_id=... partition does.
          val pHadoop = new org.apache.hadoop.fs.Path(partialsPath)
          val partialsHasData = fs.exists(pHadoop) &&
            fs.listStatus(pHadoop).exists(st =>
              st.isDirectory && st.getPath.getName.startsWith("batch_id="))
          if (partialsHasData && batchId > 0 && batchId % compactEvery == 0) {
            val compacted = spark.read.parquet(partialsPath)
              .withColumn("batch_id",
                greatest(col("batch_id"), lit(batchId - 1)))
              .groupBy(col("batch_id"), col("__hr"), col("event_type"))
              .agg(sum(col("cnt")).as("cnt"),
                sum(col("value_sum")).as("value_sum"))
              .select(col("__hr"), col("event_type"), col("cnt"),
                col("value_sum"), col("batch_id"))
              .localCheckpoint(true)
            swapIn(fs, partialsPath)(tmp =>
              compacted.write.mode("overwrite")
                .partitionBy("batch_id").parquet(tmp))
          }
          if (partialsHasData) {
            val report = spark.read.parquet(partialsPath)
              .groupBy(col("__hr"), col("event_type"))
              .agg(sum(col("cnt")).as("cnt"),
                round(sum(col("value_sum")), 2).as("sum_value"))
              .select((col("__hr") * 3600000000L).as("hour_us"),
                col("event_type"), col("cnt"), col("sum_value"))
            recoverSwap(fs, countsPath)
            swapIn(fs, countsPath)(tmp =>
              report.write.mode("overwrite").parquet(tmp))
          }
          // monotone watermark advance LAST: a crash before this point
          // replays the batch against the same watermark it first saw
          val mx = b.agg(max(col("__us"))).collect()(0)
          if (!mx.isNullAt(0)) {
            val newWm = math.max(wmUs, mx.getLong(0) - latenessUs)
            if (newWm > wmUs) {
              import spark.implicits._
              swapIn(fs, statePath)(tmp =>
                Seq(newWm).toDF("wm_us").coalesce(1)
                  .write.mode("overwrite").parquet(tmp))
            }
          }
        } finally b.unpersist()
        ()
      }
  }

  /** Idempotent micro-batch upsert: each batch merges into the parquet
    * base last-writer-wins (S8 semantics); re-delivered batches converge
    * to the same state, matching the reference's ON CONFLICT idempotency
    * (dag.py:259-265).
    *
    * The heavy lifting — bucket=<k> layout, touched-bucket pruning,
    * the one-job `__tmp` write, the three-rename swap, torn-swap
    * recovery, and the bucket-count manifest — is the shared
    * [[etlmudah.load.BucketedBase]] protocol (one implementation for
    * the batch load path and this sink; full scale/crash story in its
    * object doc). This sink adds only the streaming specifics: the
    * monotone `batch_ts = batchId` stamp that makes replays
    * last-writer-wins no-ops, and the foreachBatch plumbing.
    *
    * Per-batch write cost is O(|batch| x bucket fanout), not O(|base|):
    * at a 100 TB base with 12-hourly batches a full-table rewrite per
    * batch is the scale killer; size `numBuckets` so |base|/numBuckets
    * is a comfortable rewrite unit (a few GB).
    *
    * Crash safety: recovery at batch start restores any bucket caught
    * between its two renames; a crash part-way through the renames
    * leaves some buckets new and some old — the re-delivered batch
    * recovers any torn bucket, re-merges, and converges, because
    * merging the same rows twice under last-writer-wins is a no-op
    * (torn layouts exercised in StreamingSpec). */
  def upsertSink(events: DataFrame, basePath: String, checkpoint: String,
                 numBuckets: Int = 32):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val stamped = batch.withColumn("batch_ts", lit(batchId))
        etlmudah.load.BucketedBase.merge(stamped, basePath,
          Seq("event_id"),
          Seq(col("batch_ts").desc, col("event_id").asc), numBuckets)
        ()
      }
}
