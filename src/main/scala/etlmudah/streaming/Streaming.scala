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

  /** Schema of the events parquet: ts is stored as timestamp[us] with
    * isAdjustedToUTC=false, i.e. TIMESTAMP_NTZ (see Tables.eventsTyped). */
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

  /** File-source stream over an events directory; ts cast NTZ → UTC
    * instant for event-time semantics (sessions pin timeZone=UTC, so
    * the cast is the identity on the underlying micros). */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsFileSchema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))

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
    * can't express. State is bounded by the key domain; pair with a
    * timeout in unbounded-key deployments. */
  final case class UserProfile(userId: Long, events: Long, valueSum: Double,
                               lastSeenUs: Long)

  def userProfiles(events: DataFrame): org.apache.spark.sql.Dataset[UserProfile] = {
    import org.apache.spark.sql.streaming.GroupState
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("value"), unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Double, Long)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[UserProfile, UserProfile] {
        (userId: Long, rows: Iterator[(Long, Double, Long)],
         state: GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(UserProfile(userId, 0L, 0.0, 0L))
          val batch = rows.toSeq
          val next = UserProfile(
            userId,
            prev.events + batch.size,
            prev.valueSum + batch.map(_._2).sum,
            math.max(prev.lastSeenUs, if (batch.isEmpty) 0L else batch.map(_._3).max))
          state.update(next)
          next
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
    * across batches (batches that split an hour sum correctly). The
    * report is a wholesale overwrite. Verified stream==batch and
    * re-run-convergent in StreamingSpec. */
  def anomalySink(events: DataFrame, statePath: String, outPath: String,
                  checkpoint: String, keyCol: String = "event_type",
                  lookback: Int = 24):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch
          .groupBy(col(keyCol), date_trunc("hour", col("ts")).as("__hour"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
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
    * report re-aggregates partials — re-runs converge. The report goes
    * through `Profile.psiFromCounts`, the SAME code path as the batch
    * operator, so stream == batch by construction (verified in
    * StreamingSpec). State is the binned frame — bounded by |bins|,
    * never raw rows. */
  def driftSink(rows: DataFrame, ref: DataFrame, valueCol: String,
                binWidth: Double, statePath: String, outPath: String,
                checkpoint: String, eps: Double = 1e-6):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    // reference histogram written once, driver-side, before the stream
    // starts; deterministic so a restart rewrites the identical frame
    etlmudah.analytics.Profile.binCounts(ref, valueCol, binWidth)
      .write.mode("overwrite").parquet(statePath + "__ref")
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        etlmudah.analytics.Profile.binCounts(batch, valueCol, binWidth)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
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
        val spark = batch.sparkSession
        val conf = spark.sparkContext.hadoopConfiguration
        val statePathH = new org.apache.hadoop.fs.Path(statePath)
        val fs = statePathH.getFileSystem(conf)
        recoverSwap(fs, statePath)
        // ledger written first, so the read below always finds the path
        // (a zero-row batch still writes its one ledger row)
        batch.agg(coalesce(sum(col(sizeCol).cast("long")), lit(0L))
            .as("batch_bytes"))
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(statePath)
        // bounded: <= compactEvery + 1 rows between compactions
        val start = spark.read.parquet(statePath)
          .filter(col("batch_id") < batchId)
          .agg(coalesce(sum(col("batch_bytes")), lit(0L)))
          .head().getLong(0)
        etlmudah.scale.Sampling.shardAssign(batch, keyCol, sizeCol,
            shardBudget, startOffset = start)
          .withColumn("batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id")
          .parquet(outPath)
        if (batchId > 0 && batchId % compactEvery == 0) {
          // checkpointed batches below the current never re-deliver, so
          // their rows are safe to collapse; only batchId's own row must
          // survive as its own partition for dynamic re-overwrite
          val compacted = spark.read.parquet(statePath)
            .withColumn("batch_id",
              least(col("batch_id"), lit(batchId - 1)))
            .groupBy(col("batch_id"))
            .agg(sum(col("batch_bytes")).as("batch_bytes"))
            .select(col("batch_bytes"), col("batch_id"))
            .localCheckpoint(true)   // sever lineage from the live path
          swapIn(fs, statePath)(tmp =>
            compacted.write.mode("overwrite")
              .partitionBy("batch_id").parquet(tmp))
        }
        ()
      }

  /** Idempotent micro-batch upsert: each batch merges into the parquet
    * base last-writer-wins (S8 semantics); re-delivered batches converge
    * to the same state, matching the reference's ON CONFLICT idempotency
    * (dag.py:259-265). The staged temp-table + transaction pattern
    * (SURVEY §7.5.7) maps to the [[swapIn]]/[[recoverSwap]] protocol:
    * the base table moves ASIDE during the swap, never through a delete,
    * so a crash at any point between batches replays to a complete base
    * (crash-torn layouts exercised in StreamingSpec). */
  def upsertSink(events: DataFrame, basePath: String, checkpoint: String):
      org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Hadoop FileSystem API, not java.io.File: the sink must run
        // against HDFS/object-store paths, not just the local FS
        val conf = spark.sparkContext.hadoopConfiguration
        val target = new org.apache.hadoop.fs.Path(basePath)
        val fs = target.getFileSystem(conf)
        recoverSwap(fs, basePath)
        val stamped = batch.withColumn("batch_ts", lit(batchId))
        val merged =
          if (fs.exists(target)) {
            val base = spark.read.parquet(basePath)
            Upsert.upsert(base, stamped, Seq("event_id"),
              Seq(col("batch_ts").desc, col("event_id").asc))
          } else stamped
        swapIn(fs, basePath)(tmp =>
          merged.write.mode("overwrite").parquet(tmp))
        ()
      }
}
