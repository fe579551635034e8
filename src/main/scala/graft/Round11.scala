package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import etlmudah.Tables
import etlmudah.load.BucketedBase

/** Round-11 registry tier — appended to [[SparkEntry.queries]] /
  * [[SparkEntry.oracleSql]] (the registry is split per-round from here
  * on; SparkEntry.scala was approaching unreviewable). Same contract:
  * every query ends in an explicit orderBy with full tie-breaks,
  * timestamps leave as epoch micros, counts/ranks cast BIGINT on both
  * sides, sums ride a DECIMAL/BIGINT lattice with one closing double
  * op per group. */
object Round11 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S8 PERSIST path (the reference's staged COPY + ON CONFLICT load,
    // dags/dag.py:250-266) run END-TO-END through the bucket-pruned
    // base: seed orders as a 32-bucket base on disk, merge the q16
    // repricing batch (REWRITING ONLY THE BUCKETS ITS KEYS TOUCH —
    // the files-untouched pin lives in UpsertSpec), read the live base
    // back. The oracle is the same closed form as q16: the batch is
    // synthesized deterministically from orders, so the merged state
    // is CASE-expressible. The fresh-root delete makes the seed part
    // of the query definition (re-runs converge identically).
    "q301_bucketed_merge_load" -> ((s, dir) => {
      val root = s"/tmp/graft_sink_q301_${dir.replaceAll("[^0-9a-zA-Z]", "_")}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val base = s"$root/orders_base"
      val orders = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      BucketedBase.merge(orders.withColumn("batch_ts", lit(1L)),
        base, Seq("o_orderkey"), Seq(col("batch_ts").desc), numBuckets = 32)
      val batch = orders.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000)
        .withColumn("batch_ts", lit(2L))
      BucketedBase.merge(batch, base, Seq("o_orderkey"),
        Seq(col("batch_ts").desc), numBuckets = 32)
      BucketedBase.read(s, base)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_orderkey"))
    }),

    // TPC-H Q20 shape (excess-stock suppliers) — the last-but-one
    // missing decorrelation in the relational sweep. The correlated
    // `ps_availqty > 0.5 * sum(l_quantity ...)` per-(part,supp)
    // subquery decorrelates into ONE grouped aggregate with TWO
    // conditional sums (on-hand proxy = 1998+ shipments; demand = the
    // 1997 window), the nested IN-part-subset into a broadcast
    // left_semi BEFORE the aggregate (only red parts' lines are ever
    // grouped), and the outer supplier IN into a left_semi on the
    // qualifying pair frame. avail > 0.5*demand is the exact
    // cross-multiply avail*2 > demand on the DECIMAL(18,2) lattice —
    // no float threshold anywhere (q274 discipline).
    "q302_excess_stock_suppliers" -> ((s, dir) => {
      val redParts = Tables.part(s, dir)
        .filter(col("p_name").startsWith("red")).select("p_partkey")
      val zero = lit(0).cast("decimal(18,2)")
      val pairs = Tables.lineitem(s, dir)
        .join(broadcast(redParts),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(
          sum(when(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"),
            col("l_quantity").cast("decimal(18,2)")).otherwise(zero))
            .as("avail"),
          sum(when(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
              && col("l_shipdate") < lit("1998-01-01").cast("timestamp"),
            col("l_quantity").cast("decimal(18,2)")).otherwise(zero))
            .as("demand"))
        .filter(col("avail") * 2 > col("demand"))
        .select(col("l_suppkey"))
      Tables.supplier(s, dir)
        .join(pairs, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(Tables.nation(s, dir),
          col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin(
          "NATION_3", "NATION_7", "NATION_11", "NATION_19", "NATION_22"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_name"), col("s_suppkey"))
    }),

    // TPC-H Q16 shape (supplier count by part attributes) — the last
    // missing decorrelation. The partsupp relation is the DISTINCT
    // (l_partkey, l_suppkey) pair frame; the NOT-IN complained-about
    // suppliers subquery (negative balance as the complaint proxy; the
    // key is non-null so NOT IN == NOT EXISTS) becomes a broadcast
    // left_anti, the part attribute gates (<> brand, NOT LIKE type,
    // size IN list) ride a broadcast join, and the count is
    // countDistinct per (brand, type, size).
    "q303_supplier_count_by_part" -> ((s, dir) => {
      val sizes = Seq(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
      val complained = Tables.supplier(s, dir)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("xk"))
      val gatedParts = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#5" &&
          !col("p_type").like("MEDIUM%") &&
          col("p_size").isin(sizes: _*))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey").distinct()
        .join(broadcast(gatedParts), col("l_partkey") === col("p_partkey"))
        .join(broadcast(complained), col("l_suppkey") === col("xk"),
          "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)
    }),
  )

  def oracleSql: Map[String, String] = Map(

    // merged state is closed-form: %10==0 keys repriced, rest original
    "q301_bucketed_merge_load" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000
        |      ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // Q20 shape: correlated 0.5*sum threshold kept CORRELATED in the
    // oracle (the engine decorrelates; DuckDB replays the nested
    // definition) — avail*2 > demand on the exact decimal lattice
    "q302_excess_stock_suppliers" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey,
        |    sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01'
        |      THEN CAST(l_quantity AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS avail,
        |    sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
        |          AND l_shipdate < TIMESTAMP '1998-01-01'
        |      THEN CAST(l_quantity AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS demand
        |  FROM lineitem
        |  WHERE l_partkey IN
        |    (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11',
        |                 'NATION_19', 'NATION_22')
        |  AND s_suppkey IN (SELECT l_suppkey FROM ps
        |                    WHERE avail * 2 > demand)
        |ORDER BY s_name, s_suppkey""".stripMargin,

    // Q16 shape: literal NOT IN in the oracle (key non-null, so the
    // engine's left_anti is equivalent); distinct-supplier counting
    // per part attribute triple
    "q303_supplier_count_by_part" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_type NOT LIKE 'MEDIUM%'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC,
        |  p_size ASC""".stripMargin,
  )
}
