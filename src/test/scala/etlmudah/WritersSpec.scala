package etlmudah.sinks

import graft.SparkSpec
import etlmudah.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

class WritersSpec extends SparkSpec {

  test("S6: TSV roundtrip preserves rows") {
    val out = Files.createTempDirectory("tsv").toString + "/t"
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_orderstatus")
    Writers.writeTsv(orders, out)
    val back = spark.read.option("delimiter", "\t").option("header", "true").csv(out)
    assert(back.count() == orders.count())
  }

  test("S7: staged write swaps atomically and is re-runnable") {
    val out = Files.createTempDirectory("staged").toString + "/t"
    val df = Tables.region(spark, sf0001)
    Writers.writeStaged(df, out)
    assert(spark.read.parquet(out).count() == 5)
    Writers.writeStaged(df.limit(3), out)   // second run replaces
    assert(spark.read.parquet(out).count() == 3)
    assert(!new java.io.File(out + "__staging").exists())
  }

  test("S9: partitioned layout prunes non-matching partitions at scan") {
    val out = Files.createTempDirectory("part").toString + "/t"
    Writers.writePartitioned(Tables.orders(spark, sf0001), out, Seq("o_orderpriority"))
    val pruned = spark.read.parquet(out).filter(col("o_orderpriority") === "1-URGENT")
    val files = pruned.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.inputFiles
      }).flatten
    assert(files.nonEmpty)
    val scanned = pruned.select(input_file_name()).distinct().collect()
      .map(_.getString(0))
    assert(scanned.forall(_.contains("o_orderpriority=1-URGENT")))
  }

  test("range-sorted layout clusters a range predicate into few files") {
    val orders = Tables.orders(spark, sf0001)
    val sorted = Files.createTempDirectory("rs").toString + "/sorted"
    val shuffled = Files.createTempDirectory("rs").toString + "/shuffled"
    Writers.writeRangeSorted(orders, sorted, Seq("o_totalprice"), files = 8)
    // adversarial baseline: same file count, rows scattered by hash
    orders.repartition(8, col("o_orderkey"))
      .write.mode("overwrite").parquet(shuffled)
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("o_totalprice") < 50000)
        .select(input_file_name()).distinct().count()
    // rows survive intact...
    assert(spark.read.parquet(sorted).count() == orders.count())
    // ...and the narrow range concentrates in a fraction of the files
    // while the hash layout spreads it across (nearly) all of them
    assert(filesTouched(sorted) < filesTouched(shuffled),
      s"sorted=${filesTouched(sorted)} shuffled=${filesTouched(shuffled)}")
    assert(filesTouched(sorted) <= 3)
  }

  test("z-order layout prunes files on EVERY indexed column, not just the leading one") {
    val orders = Tables.orders(spark, sf0001)
    val base = Files.createTempDirectory("zo").toString
    val (zdir, rdir, hdir) = (s"$base/z", s"$base/r", s"$base/h")
    Writers.writeZOrdered(orders, zdir,
      Seq("o_totalprice", "o_custkey"), files = 16)
    Writers.writeRangeSorted(orders, rdir, Seq("o_totalprice"), files = 16)
    orders.repartition(16, col("o_orderkey"))
      .write.mode("overwrite").parquet(hdir)
    def touched(path: String, pred: org.apache.spark.sql.Column): Long =
      spark.read.parquet(path).filter(pred)
        .select(input_file_name()).distinct().count()
    val priceSlice = col("o_totalprice").between(40000, 60000)
    val custSlice = col("o_custkey").between(100, 120)
    // rows survive intact
    assert(spark.read.parquet(zdir).count() == orders.count())
    // the hash baseline scatters both predicates across ~all files
    assert(touched(hdir, priceSlice) >= 15 && touched(hdir, custSlice) >= 15)
    // the range sort is perfect on its leading column, useless on the other
    assert(touched(rdir, priceSlice) <= 3)
    assert(touched(rdir, custSlice) >= 15)
    // z-order prunes BOTH — each at reduced (sqrt) resolution: the
    // multi-column trade the Morton curve exists to make
    assert(touched(zdir, priceSlice) <= 8,
      s"z price slice touched ${touched(zdir, priceSlice)}")
    assert(touched(zdir, custSlice) <= 8,
      s"z cust slice touched ${touched(zdir, custSlice)}")
  }

  test("format coverage: JSON and ORC round-trip the star schema") {
    val out = Files.createTempDirectory("fmt").toString
    val nation = Tables.nation(spark, sf0001)
    nation.write.mode("overwrite").json(s"$out/j")
    Writers.writeOrc(nation, s"$out/o")
    val j = spark.read.json(s"$out/j")
    val o = spark.read.orc(s"$out/o")
    assert(j.count() == 25 && o.count() == 25)
    assert(o.schema == nation.schema)   // ORC preserves types exactly
    // JSON infers long for ints; values still match
    val names = j.select("n_name").collect().map(_.getString(0)).toSet
    assert(names == nation.select("n_name").collect().map(_.getString(0)).toSet)
  }

  test("writeJsonl: hostile strings survive the line encoding verbatim") {
    import spark.implicits._
    val out = Files.createTempDirectory("jsonl").toString + "/d"
    val rows = Seq(
      (1L, "plain text"),
      (2L, "tab\there \"quotes\" back\\slash"),
      (3L, "newline\nin value and unicode é中"),
      (4L, ""))
    Writers.writeJsonl(rows.toDF("id", "text"), out)
    val back = spark.read.schema("id BIGINT, text STRING").json(out)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == rows.toSet)
  }

  test("JDBC roundtrip through embedded Derby: rows survive, extract is 4-way partitioned") {
    val db = Files.createTempDirectory("jdbc").toString + "/db"
    val url = s"jdbc:derby:$db;create=true"
    val src = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    Writers.writeJdbc(src, url, "ORDERS_T")
    val back = Writers.readJdbcPartitioned(spark, url, "ORDERS_T",
      "o_orderkey", 0L, 6000000L, 4)
    assert(back.rdd.getNumPartitions == 4)
    val a = src.orderBy("o_orderkey").collect()
    val b = back.select("o_orderkey", "o_orderpriority", "o_totalprice")
      .orderBy("o_orderkey").collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.zip(b).forall { case (x, y) => x == y })
    // overwrite mode really replaces (re-load converges, no dup rows)
    Writers.writeJdbc(src, url, "ORDERS_T")
    assert(Writers.readJdbcPartitioned(spark, url, "ORDERS_T",
      "o_orderkey", 0L, 6000000L, 4).count() == a.length)
  }

  test("sharded export + manifest: verify passes clean, catches loss/dup/substitution per shard") {
    val out = Files.createTempDirectory("shardman").toString + "/exp"
    val docs = Tables.documents(spark, sf0001)
    Writers.writeShardedWithManifest(docs, out, "doc_id", "n_chars",
      shardBudget = 20000L)
    // clean export verifies to an EMPTY report
    assert(Writers.verifyShardedExport(spark, out, "doc_id", "n_chars")
      .count() == 0)
    // the manifest equals the directly computed frame (same checksums)
    val direct = Writers.shardManifest(docs, "doc_id", "n_chars", 20000L)
      .orderBy(col("shard")).collect().toSeq
    val stored = spark.read.parquet(out + "/_manifest")
      .orderBy(col("shard")).collect().toSeq
    assert(direct == stored)
    // lose one row from one shard -> exactly that shard flags mismatch
    // (each overwrite materializes via collect + re-create: a lazy
    // frame over the path being replaced would re-list deleted files)
    val data = spark.read.parquet(out + "/data").collect().toSeq
    val schema = spark.read.parquet(out + "/data").schema
    def rewrite(rows: Seq[org.apache.spark.sql.Row]): Unit =
      Writers.writeStaged(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), schema), out + "/data")
    val victim = data.minBy(_.getAs[Long]("doc_id"))
    val vShard = victim.getAs[Number]("shard").longValue
    rewrite(data.filterNot(_ == victim))
    val lost = Writers.verifyShardedExport(spark, out, "doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(lost.toSeq == Seq((vShard, "mismatch")), lost.mkString(","))
    // a shard present in data but absent from the manifest (and the
    // reverse) get their own statuses
    val si = schema.fieldIndex("shard")
    val ghosts = data.take(5).map { r =>
      val bumped = r.getAs[Number]("shard").longValue + 100L
      val v: Any = schema(si).dataType match {
        case org.apache.spark.sql.types.LongType => bumped
        case _ => bumped.toInt
      }
      org.apache.spark.sql.Row.fromSeq(r.toSeq.updated(si, v))
    }
    rewrite(data ++ ghosts)
    val extra = Writers.verifyShardedExport(spark, out, "doc_id", "n_chars")
      .collect().map(r => r.getString(1)).toSet
    assert(extra.contains("unexpected_shard"))
  }

  test("manifest checksum: catches id substitution that preserves count, units, and key range") {
    import spark.implicits._
    val out = Files.createTempDirectory("shardck").toString + "/exp"
    val rows = Seq((0L, 10L), (10L, 10L), (20L, 10L), (30L, 10L))
      .toDF("doc_id", "n_chars")
    Writers.writeShardedWithManifest(rows, out, "doc_id", "n_chars",
      shardBudget = 1000L)   // one shard
    assert(Writers.verifyShardedExport(spark, out, "doc_id", "n_chars")
      .count() == 0)
    // swap interior id 10 -> 25: count, n_units, first_key, last_key
    // ALL unchanged — only the id-set checksum can see it
    val tampered = Seq((0L, 10L), (25L, 10L), (20L, 10L), (30L, 10L))
      .toDF("doc_id", "n_chars").withColumn("shard", lit(0L))
    Writers.writeStaged(tampered, out + "/data")
    val got = Writers.verifyShardedExport(spark, out, "doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq((0L, "mismatch")), got.mkString(","))
  }

  test("S12: TTL cache returns same plan within TTL, recomputes after") {
    val cache = new Writers.TtlCache(spark)
    var computes = 0
    def load() = { computes += 1; Tables.nation(spark, sf0001) }
    cache.getOrCompute("nation", ttlMs = 60000)(load()).count()
    cache.getOrCompute("nation", ttlMs = 60000)(load()).count()
    assert(computes == 1)
    cache.invalidate("nation")
    cache.getOrCompute("nation", ttlMs = 60000)(load()).count()
    assert(computes == 2)
  }
}
