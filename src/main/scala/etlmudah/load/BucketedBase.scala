package etlmudah.load

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucket-pruned persistent MERGE base — the WRITE side of the S8/J1
  * upsert (the reference's staged COPY + `ON CONFLICT DO UPDATE` load,
  * dags/dag.py:250-266) at 100 TB scale.
  *
  * [[Upsert.upsert]] computes the merge with one keyed shuffle, but a
  * persist that rewrites the WHOLE base per batch (writeStaged's
  * root-swap) is O(|base|) per load — the scale killer when the base is
  * 100 TB and the batch is a few GB. This object gives the batch load
  * path the same discipline the streaming sink
  * ([[etlmudah.streaming.Streaming.upsertSink]]) already proved out:
  *
  *   - the base lives as `bucket=<k>` partition directories, k =
  *     `pmod(xxhash64(keys...), numBuckets)`;
  *   - a batch REWRITES ONLY THE BUCKETS ITS KEYS TOUCH — the merge
  *     reads just those bucket directories (partition pruning by
  *     construction), merges with one keyed window, writes the merged
  *     buckets to a `__tmp` tree in ONE job, and swaps each bucket in
  *     via the three-rename protocol (live aside to `__old/bucket=k`,
  *     `__tmp/bucket=k` in, drop `__old`);
  *   - untouched bucket files are never read, written, or renamed —
  *     they survive BY IDENTITY (same paths, same bytes, same mtimes;
  *     pinned by UpsertSpec), so per-batch write cost is
  *     O(|batch| x bucket fanout), not O(|base|).
  *
  * Crash safety: [[recoverSwaps]] at entry restores any bucket caught
  * between its two renames — the only window where a live bucket is
  * absent, and there `__tmp`'s copy is the newest complete state
  * (renames begin only after the write job finishes). A crash part-way
  * through the renames leaves some buckets new and some old; re-running
  * the same batch recovers any torn bucket, re-merges, and converges,
  * because merging the same rows twice under a deterministic
  * last-writer-wins order is a no-op.
  *
  * Layout identity: `_graft_num_buckets` manifests the bucket count —
  * a caller merging with a different count would route keys to the
  * wrong bucket and leave silent duplicates across layouts; the
  * manifest turns that into a hard failure. The manifest publishes via
  * unique-temp + rename + read-back so a crash mid-publish leaves an
  * orphan temp, never a live-but-empty manifest, and a racing writer
  * publishing a DIFFERENT count fails loudly.
  *
  * Sizing: pick `numBuckets` so |base|/numBuckets is a comfortable
  * rewrite unit (a few GB); at 100 TB that is O(10^4–10^5) buckets,
  * far below any filesystem's directory-count comfort zone.
  *
  * Concurrency contract: ONE writer per base at a time (the standard
  * contract of any non-transactional table layout — the streaming
  * sink serializes via its checkpoint; batch callers serialize via
  * their scheduler). Concurrent merges could interleave bucket
  * renames; the manifest protocol only hardens the bucket-COUNT
  * identity, not row-level isolation. Readers are safe at any point:
  * every live bucket directory is always a complete parquet table.
  */
object BucketedBase {

  /** The layout's routing expression: hash bucket of the merge key(s).
    * xxhash64 over the key columns, pmod into [0, numBuckets). */
  def bucketOf(keys: Seq[String], numBuckets: Int): Column =
    pmod(xxhash64(keys.map(col): _*), lit(numBuckets.toLong)).cast("int")

  /** Per-merge audit: which buckets the batch touched, out of how many
    * — `rewrittenFraction` is the measured cost ratio vs a whole-base
    * rewrite (SCALE.md records it for the q16-shaped load). */
  final case class MergeStats(touchedBuckets: Seq[Int], numBuckets: Int) {
    def rewrittenFraction: Double =
      touchedBuckets.size.toDouble / numBuckets
  }

  /** Restore any bucket caught between its two renames by a crash.
    * Invariant of the swap protocol: a bucket's live directory is
    * absent ONLY between its two renames — at that point the whole
    * `__tmp` tree was fully written (buckets rename only after the one
    * write job completes), so `__tmp`'s copy is the newest complete
    * state; `__old`'s is the pre-swap fallback. With every live bucket
    * present, leftover `__tmp`/`__old` trees are a torn write / a
    * finished swap's residue — drop both. */
  def recoverSwaps(fs: FileSystem, basePath: String): Unit = {
    val oldRoot = new Path(basePath + "__old")
    val tmpRoot = new Path(basePath + "__tmp")
    if (fs.exists(oldRoot)) {
      fs.listStatus(oldRoot).foreach { st =>
        val name = st.getPath.getName   // "bucket=<k>"
        val live = new Path(s"$basePath/$name")
        val tmpB = new Path(s"$tmpRoot/$name")
        if (!fs.exists(live)) {
          if (fs.exists(tmpB)) fs.rename(tmpB, live)
          else fs.rename(st.getPath, live)
        }
      }
    }
    if (fs.exists(oldRoot)) fs.delete(oldRoot, true)
    if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true)
  }

  /** Publish-or-verify the bucket-count manifest (see object doc). */
  def ensureManifest(fs: FileSystem, basePath: String,
                     numBuckets: Int): Unit = {
    val baseRoot = new Path(basePath)
    val manifest = new Path(s"$basePath/_graft_num_buckets")
    def readManifest(): Option[String] =
      if (!fs.exists(manifest)) None
      else {
        val in = fs.open(manifest)
        Some(try scala.io.Source.fromInputStream(in).mkString.trim
          finally in.close())
      }
    // a torn manifest (crash between create and write under an older
    // protocol) must name the file and the remedy, not surface as a
    // bare NumberFormatException from "".toInt on every restart
    def checkManifest(raw: String): Unit = {
      val persisted = raw.toIntOption.getOrElse(sys.error(
        s"bucketed base manifest $manifest is empty/unparseable " +
          s"('$raw') — a previous writer crashed mid-publish; delete " +
          "it if the base layout is known-good, or rebuild the base"))
      require(persisted == numBuckets,
        s"bucketed base $basePath is laid out with numBuckets=" +
          s"$persisted; merging with numBuckets=$numBuckets would " +
          "split keys across bucket layouts")
    }
    readManifest() match {
      case Some(raw) => checkManifest(raw)
      case None =>
        fs.mkdirs(baseRoot)
        // UNIQUE temp + rename, then read back: a crash mid-write
        // leaves only an orphan temp, never a live-but-empty manifest;
        // a fixed temp name would let a racing starter truncate this
        // writer's bytes mid-publish. The rename is not checked —
        // whether ours or a racer's landed, the read-back verifies the
        // LIVE value, so a racer publishing a DIFFERENT bucket count
        // fails this merge instead of silently splitting the layout.
        val mTmp = new Path(
          s"$basePath/._graft_num_buckets." +
            java.util.UUID.randomUUID().toString.take(8))
        val mOut = fs.create(mTmp, false)
        try mOut.write(numBuckets.toString.getBytes("UTF-8"))
        finally mOut.close()
        if (!fs.rename(mTmp, manifest)) fs.delete(mTmp, false)
        checkManifest(readManifest().getOrElse(sys.error(
          s"bucketed base manifest publish failed: $manifest")))
    }
  }

  /** Merge `batch` into the bucketed base at `basePath` — last-writer-
    * wins on `keys` under `orderCols` (highest first; must totally
    * order rows per key ACROSS base and batch, e.g. a monotone
    * `batch_ts` column present in both — base rows carry the stamp of
    * the batch that wrote them). Creates the base (and its manifest) on
    * first merge. Returns which buckets were rewritten.
    *
    * Only the touched bucket directories are read and only they are
    * written; see the object doc for the swap protocol and crash
    * story. */
  def merge(batch: DataFrame, basePath: String, keys: Seq[String],
            orderCols: Seq[Column], numBuckets: Int): MergeStats = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    require(keys.nonEmpty, "merge needs at least one key column")
    val spark = batch.sparkSession
    // Hadoop FileSystem API, not java.io.File: the base must live on
    // HDFS/object-store paths, not just the local FS
    val conf = spark.sparkContext.hadoopConfiguration
    val baseRoot = new Path(basePath)
    val fs = baseRoot.getFileSystem(conf)
    recoverSwaps(fs, basePath)
    ensureManifest(fs, basePath, numBuckets)
    val stamped = batch.withColumn("bucket", bucketOf(keys, numBuckets))
    // bounded driver collect: <= numBuckets values
    val touched = stamped.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted.toIndexedSeq
    if (touched.nonEmpty) {
      val liveDirs = touched.map(b => s"$basePath/bucket=$b")
        .filter(d => fs.exists(new Path(d)))
      val touchedBase =
        if (liveDirs.isEmpty) stamped.limit(0)
        else spark.read.option("basePath", basePath)
          .parquet(liveDirs: _*)
          .withColumn("bucket", col("bucket").cast("int"))
      val merged = Upsert.upsert(touchedBase, stamped, keys, orderCols)
      val tmpRoot = new Path(basePath + "__tmp")
      val oldRoot = new Path(basePath + "__old")
      if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true)
      // one job writes every touched bucket; renames start only after
      // it completes, so __tmp is all-or-nothing per merge
      merged.write.mode("overwrite")
        .partitionBy("bucket").parquet(tmpRoot.toString)
      fs.mkdirs(baseRoot)
      fs.mkdirs(oldRoot)
      touched.foreach { b =>
        val live = new Path(s"$basePath/bucket=$b")
        val tmpB = new Path(s"$tmpRoot/bucket=$b")
        val oldB = new Path(s"$oldRoot/bucket=$b")
        if (fs.exists(live)) fs.rename(live, oldB)
        if (fs.exists(tmpB)) fs.rename(tmpB, live)
      }
      fs.delete(oldRoot, true)
      fs.delete(tmpRoot, true)
    }
    MergeStats(touched, numBuckets)
  }

  /** The live base as a DataFrame (bucket column included — callers
    * that don't want it drop it). Partition pruning applies: a filter
    * on `bucket` — or a join whose keys were routed through
    * [[bucketOf]] — reads only the matching directories. */
  def read(spark: SparkSession, basePath: String): DataFrame =
    // the root, not a bucket=* glob: partition discovery types the
    // bucket column and `_graft_num_buckets` is invisible to it
    // (underscore-prefixed = hidden); `__tmp`/`__old` are SIBLINGS of
    // the root, never scanned
    spark.read.parquet(basePath)
      .withColumn("bucket", col("bucket").cast("int"))
}
