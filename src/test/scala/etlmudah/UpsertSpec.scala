package etlmudah.load

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {

  private def frame(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "payload", "batch_ts")
  }

  private def asMap(df: DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("upsert: insert new keys, update existing, last writer wins") {
    val base = frame(Seq((1L, "a", 1L), (2L, "b", 1L)))
    val batch = frame(Seq((2L, "b2", 2L), (3L, "c", 2L)))
    val out = asMap(Upsert.upsert(base, batch, Seq("id"), Seq(col("batch_ts").desc)))
    assert(out == Map(1L -> "a", 2L -> "b2", 3L -> "c"))
  }

  test("upsert: idempotent — re-applying the same batch is a no-op") {
    val base = frame(Seq((1L, "a", 1L), (2L, "b", 1L)))
    val batch = frame(Seq((2L, "b2", 2L), (3L, "c", 2L)))
    val once = Upsert.upsert(base, batch, Seq("id"), Seq(col("batch_ts").desc))
    val twice = Upsert.upsert(once, batch, Seq("id"), Seq(col("batch_ts").desc))
    assert(asMap(once) == asMap(twice))
  }

  test("upsert: property — random bases/batches, merge equals map-union (seeded)") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val baseRows = (0 until rnd.nextInt(30)).map(_ =>
        (rnd.nextInt(15).toLong, "base" + rnd.nextInt(100), 1L))
        .groupBy(_._1).map(_._2.head).toSeq   // unique keys in base
      val batchRows = (0 until rnd.nextInt(30)).map(_ =>
        (rnd.nextInt(15).toLong, "batch" + rnd.nextInt(100), 2L))
        .groupBy(_._1).map(_._2.head).toSeq
      val expected = baseRows.map(r => r._1 -> r._2).toMap ++
        batchRows.map(r => r._1 -> r._2).toMap
      val got = asMap(Upsert.upsert(frame(baseRows), frame(batchRows),
        Seq("id"), Seq(col("batch_ts").desc)))
      assert(got == expected)
    }
  }

  test("scd2History: collapses no-op rows, closes intervals, keeps null-attr first row") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, "bronze"), (1L, 20L, "bronze"),  // no-op at 20 collapses
      (1L, 30L, "silver"), (1L, 40L, "gold"),
      (2L, 15L, null.asInstanceOf[String]),       // first row with null attr survives
      (2L, 25L, "bronze"))
      .toDF("uid", "ts", "tier")
    val out = Upsert.scd2History(log, "uid", "ts", Seq("tier"))
      .orderBy("uid", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "bronze", 10L, 30L, false),
      (1L, "silver", 30L, 40L, false),
      (1L, "gold", 40L, -1L, true),
      (2L, null, 15L, 25L, false),
      (2L, "bronze", 25L, -1L, true)))
  }

  test("inserts/updates decomposition partitions the batch") {
    val base = frame(Seq((1L, "a", 1L), (2L, "b", 1L)))
    val batch = frame(Seq((2L, "b2", 2L), (3L, "c", 2L)))
    val ins = Upsert.inserts(base, batch, Seq("id")).collect().map(_.getLong(0)).toSet
    val upd = Upsert.updates(base, batch, Seq("id")).collect().map(_.getLong(0)).toSet
    assert(ins == Set(3L) && upd == Set(2L))
  }

  test("snapshotDiff: all four classes; null values compare null-safely") {
    import spark.implicits._
    val base = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, None), (4L, Option("d"))
    ).toDF("id", "v")
    val next = Seq(
      (1L, Option("a")),   // unchanged
      (2L, Option("b2")),  // updated
      (3L, None),          // unchanged: null <=> null
      (5L, Option("e"))    // inserted; 4 deleted
    ).toDF("id", "v")
    val out = Upsert.snapshotDiff(base, next, Seq("id"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "updated",
      3L -> "unchanged", 4L -> "deleted", 5L -> "inserted"))
  }

  // ---- BucketedBase: the bucket-pruned batch MERGE persist path ----

  private def fileFingerprints(dir: java.io.File): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(dir).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> ((f.length(), f.lastModified()))).toMap
  }

  test("BucketedBase: merge result equals in-memory upsert; untouched bucket FILES survive by identity") {
    val root = java.nio.file.Files.createTempDirectory("bucketed_base").toString
    val base = s"$root/t"
    val buckets = 16
    // seed: 200 keys spread over all 16 buckets
    val seed = frame((0L until 200L).map(k => (k, s"v$k", 1L)))
    val st0 = BucketedBase.merge(seed, base, Seq("id"),
      Seq(col("batch_ts").desc), buckets)
    assert(st0.numBuckets == buckets)
    // batch: 3 keys — touches at most 3 buckets
    val batch = frame(Seq((7L, "v7b", 2L), (7000L, "new", 2L), (42L, "v42b", 2L)))
    val touchedExpected = batch
      .withColumn("b", BucketedBase.bucketOf(Seq("id"), buckets))
      .select("b").distinct().collect().map(_.getInt(0)).toSet
    val before = fileFingerprints(new java.io.File(base))
    val st1 = BucketedBase.merge(batch, base, Seq("id"),
      Seq(col("batch_ts").desc), buckets)
    assert(st1.touchedBuckets.toSet == touchedExpected)
    assert(st1.rewrittenFraction <= 3.0 / buckets)
    // THE PIN: every parquet file in an untouched bucket is the SAME
    // file — same path, same length, same mtime — merge never read or
    // rewrote it
    val after = fileFingerprints(new java.io.File(base))
    val untouchedDirs = (0 until buckets).toSet.diff(touchedExpected)
      .map(b => s"$base/bucket=$b/")
    def untouched(m: Map[String, (Long, Long)]) =
      m.filter { case (p, _) => untouchedDirs.exists(p.contains) }
    assert(untouched(before).nonEmpty)
    assert(untouched(before) == untouched(after))
    // and the touched buckets DID change
    assert(before.keySet != after.keySet ||
      before.exists { case (p, fp) => after.get(p).exists(_ != fp) })
    // correctness: read-back equals the in-memory merge
    val got = asMap(BucketedBase.read(spark, base).select("id", "payload"))
    val want = asMap(Upsert.upsert(seed, batch, Seq("id"),
      Seq(col("batch_ts").desc)))
    assert(got == want)
    // idempotency: re-merging the same batch changes nothing
    BucketedBase.merge(batch, base, Seq("id"),
      Seq(col("batch_ts").desc), buckets)
    assert(asMap(BucketedBase.read(spark, base).select("id", "payload")) == want)
  }

  test("BucketedBase: mismatched numBuckets is a hard failure; torn swap recovers") {
    val root = java.nio.file.Files.createTempDirectory("bucketed_base2").toString
    val base = s"$root/t"
    BucketedBase.merge(frame(Seq((1L, "a", 1L), (2L, "b", 1L))), base,
      Seq("id"), Seq(col("batch_ts").desc), 8)
    val ex = intercept[Exception] {
      BucketedBase.merge(frame(Seq((3L, "c", 2L))), base,
        Seq("id"), Seq(col("batch_ts").desc), 4)
    }
    assert(ex.getMessage.contains("numBuckets"))
    // torn swap: live bucket moved aside to __old (crash between the
    // two renames, no __tmp) — recovery at next merge restores it
    val dirs = new java.io.File(base).listFiles()
      .filter(_.getName.startsWith("bucket=")).sortBy(_.getName)
    val victim = dirs.head
    val oldRoot = new java.io.File(base + "__old")
    oldRoot.mkdirs()
    java.nio.file.Files.move(victim.toPath,
      new java.io.File(oldRoot, victim.getName).toPath)
    BucketedBase.merge(frame(Seq((1L, "a2", 3L))), base,
      Seq("id"), Seq(col("batch_ts").desc), 8)
    assert(!oldRoot.exists())
    val got = asMap(BucketedBase.read(spark, base).select("id", "payload"))
    assert(got == Map(1L -> "a2", 2L -> "b"))
  }

  test("mergeAggState: merged == from-scratch recompute; boundary retractions flag needs_rescan") {
    import spark.implicits._
    // base: g1 = {1, 5, 9}, g2 = {2, 4}, g3 = {7}, g4 = {3, 6}
    val base = Seq(("g1", 1), ("g1", 5), ("g1", 9), ("g2", 2), ("g2", 4),
      ("g3", 7), ("g4", 3), ("g4", 6)).toDF("k", "x")
    val v = col("x").cast("decimal(18,2)")
    val state = Upsert.aggState(base, Seq("k"), v)
    // delta: g1 deletes an INNER value (5) + inserts 11 -> clean merge;
    //        g2 deletes its min (2) -> dirty; g3 fully retracts -> drop;
    //        g5 is brand new (inserts only); g6 new with a transient
    //        insert+delete -> dirty
    val delta = Seq(
      ("g1", 5, -1), ("g1", 11, 1),
      ("g2", 2, -1),
      ("g3", 7, -1),
      ("g5", 8, 1), ("g5", 2, 1),
      ("g6", 4, 1), ("g6", 4, -1), ("g6", 9, 1)
    ).toDF("k", "x", "op")
    val merged = Upsert.mergeAggState(state, delta, Seq("k"),
        col("x").cast("decimal(18,2)"), col("op"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDecimal(2).doubleValue,
          Option(r.getDecimal(3)).map(_.doubleValue),
          Option(r.getDecimal(4)).map(_.doubleValue),
          r.getBoolean(5)))).toMap
    // from-scratch truth over base ∪ inserts ∖ deletes
    assert(merged.keySet == Set("g1", "g2", "g4", "g5", "g6"))
    assert(merged("g1") == ((3L, 21.0, Some(1.0), Some(11.0), false)))
    assert(merged("g2") == ((1L, 4.0, None, None, true)), merged("g2"))
    assert(merged("g4") == ((2L, 9.0, Some(3.0), Some(6.0), false)))
    assert(merged("g5") == ((2L, 10.0, Some(2.0), Some(8.0), false)))
    // g6: count/sum exact (1, 9.0); min/max unknowable from extremes
    assert(merged("g6") == ((1L, 9.0, None, None, true)), merged("g6"))
    // re-applying an EMPTY delta is the identity on every clean group
    val again = Upsert.mergeAggState(
      Upsert.aggState(base, Seq("k"), v),
      delta.where(lit(false)), Seq("k"),
      col("x").cast("decimal(18,2)"), col("op"))
    assert(again.where(col("needs_rescan")).count() == 0L)
    assert(again.count() == 4L)
  }
}
