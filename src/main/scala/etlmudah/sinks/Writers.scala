package etlmudah.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sink-side operators (SURVEY §2.1 S6/S7/S9/S12).
  *
  * The reference's load path is: TSV-encode (dag.py:209-240) -> COPY into
  * an ON COMMIT DROP staging table (dag.py:183-246) -> set-based MERGE.
  * In Spark the wire-encode disappears (columnar parquet is the wire),
  * but the STAGED write survives as write-temp-then-swap, and the
  * "secondary index" (dag.py:319-320) becomes partition layout + parquet
  * min/max stats, which Catalyst prunes automatically.
  */
object Writers {

  /** S6: TSV encode — tab-delimited, header, minimal quoting (the COPY
    * wire format of dag.py:209-240). For interchange only; parquet is
    * the performance path. */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("delimiter", "\t").option("header", "true")
      .csv(path)

  /** S6+: JSON-lines encode — one JSON object per line, the interchange
    * format of every crawl/annotation pipeline (and of most LLM
    * training-data drops). Like the TSV twin this is for interchange
    * only — schema travels per-row, which is the point (downstream
    * consumers needn't share a schema registry) and the cost (parquet
    * stays the performance path). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** S6+: ORC encode — the columnar interchange peer of parquet in
    * Hive/Trino-standardized lakes; Spark ships the ORC datasource in
    * core, so engine output lands directly in an ORC warehouse with
    * types preserved exactly (unlike the CSV/TSV text tiers).
    * zstd-compressed; parquet stays the in-pipeline performance path. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("compression", "zstd").orc(path)

  /** S7: staged bulk load — write to a temp location, swap at the
    * directory level (the reference's temp-table + transaction,
    * dag.py:183-268). Readers never observe a half-written target.
    * Goes through the Hadoop `FileSystem` API so the same code runs on
    * HDFS/object stores, not just the local FS; note directory rename is
    * atomic on HDFS but copy-based on S3-style stores — there, prefer a
    * manifest/table format for true atomicity. */
  def writeStaged(df: DataFrame, path: String): Unit = {
    val tmp = path + "__staging"
    df.write.mode("overwrite").parquet(tmp)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val staging = new org.apache.hadoop.fs.Path(tmp)
    val fs = target.getFileSystem(conf)
    if (fs.exists(target)) fs.delete(target, true)
    fs.rename(staging, target)
    ()
  }

  /** S9: partitioned table layout — `partitionBy` replaces the btree
    * secondary index on region_id (dag.py:319): equality/IN predicates
    * on the partition column prune whole directories at plan time
    * (PruneFileSourcePartitions), and range predicates on sorted
    * columns skip row groups via parquet min/max stats. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Range-clustered layout — the data-skipping lever for range
    * predicates: `repartitionByRange` + `sortWithinPartitions` writes
    * files whose min/max stats are DISJOINT along `sortCols`, so a
    * range filter prunes whole files/row groups from parquet footer
    * stats instead of scanning everything (the columnar analogue of the
    * reference's btree range index). At 100 TB this turns a
    * date-bounded scan from full-corpus into touched-range-only;
    * combine with `writePartitioned` (coarse partition dirs) for
    * two-level pruning. `files` sizes the range partitioning — pick
    * ~corpus/128MB. */
  def writeRangeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                       files: Int): Unit =
    df.repartitionByRange(files, sortCols.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(sortCols.head, sortCols.tail: _*)
      .write.mode("overwrite").parquet(path)

  /** Bucketed table layout: pre-shuffle a fact table by its join key at
    * write time so later joins between co-bucketed tables plan as
    * sort-merge with ZERO runtime exchange — the scale lever for
    * repeated fact-to-fact joins (a 100 TB lineitem ⋈ orders pays its
    * shuffle once, at load). Requires saveAsTable (bucket metadata lives
    * in the catalog). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keyCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    // Idempotent across catalog resets: a session with a fresh
    // (in-memory) catalog but a persistent warehouse dir would otherwise
    // fail with LOCATION_ALREADY_EXISTS on the stale directory.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** S7/S10 real-connector tier: bulk load into a JDBC RDBMS — the
    * reference loads Postgres via COPY + MERGE (dag.py:243-266) and the
    * dashboard reads it back over a connection pool
    * (data_loader.py:19-30). `spark.write.jdbc` is the cluster-side
    * equivalent: every partition opens its own connection and inserts
    * in parallel. The sandbox's only RDBMS is embedded Derby (it ships
    * on the Spark classpath for the Hive metastore), so tests and the
    * q153 round-trip run against `jdbc:derby:`; moving to the
    * reference's actual Postgres is a URL + driver swap — the wiring
    * is config-only by design. Derby's scratch files are pinned under
    * java.io.tmpdir so nothing lands in the working directory. */
  def writeJdbc(df: DataFrame, url: String, table: String): Unit = {
    ensureDerbyHome()
    df.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", table).save()
  }

  /** S2/S10 over JDBC: partitioned parallel extract — `numParts`
    * concurrent range queries on `partCol`, the real-connector form of
    * the paged REST extract (PagedSource) and of data_loader.py's
    * single-threaded SELECT. Spark's first/last stride predicates are
    * unbounded, so rows outside [lower, upper] are still read — the
    * bounds shape parallelism, never correctness. */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
                          partCol: String, lower: Long, upper: Long,
                          numParts: Int): DataFrame = {
    ensureDerbyHome()
    spark.read.format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("partitionColumn", partCol)
      .option("lowerBound", lower).option("upperBound", upper)
      .option("numPartitions", numParts)
      .load()
  }

  private def ensureDerbyHome(): Unit =
    if (System.getProperty("derby.system.home") == null) {
      val home = System.getProperty("java.io.tmpdir", "/tmp") + "/graft_derby"
      new java.io.File(home).mkdirs()
      System.setProperty("derby.system.home", home)
    }

  /** S12: result cache with TTL (the dashboard's @st.cache_data(ttl=300),
    * data_loader.py:15,37). Entries past their deadline are unpersisted
    * and recomputed on next access. Driver-side registry: the cache
    * blocks live distributed on executors; only bookkeeping is local. */
  final class TtlCache(spark: SparkSession) {
    private case class Entry(df: DataFrame, deadlineMs: Long)
    private val entries = scala.collection.mutable.Map.empty[String, Entry]

    def getOrCompute(key: String, ttlMs: Long)(compute: => DataFrame): DataFrame =
      synchronized {
        val now = System.currentTimeMillis()
        entries.get(key) match {
          case Some(e) if e.deadlineMs > now => e.df
          case stale =>
            stale.foreach(_.df.unpersist())
            val df = compute.cache()
            entries(key) = Entry(df, now + ttlMs)
            df
        }
      }

    def invalidate(key: String): Unit = synchronized {
      entries.remove(key).foreach(_.df.unpersist()); ()
    }
  }
}
