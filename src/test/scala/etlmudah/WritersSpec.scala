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
