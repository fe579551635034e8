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
  )

  def oracleSql: Map[String, String] = Map(

    // merged state is closed-form: %10==0 keys repriced, rest original
    "q301_bucketed_merge_load" ->
      """SELECT o_orderkey, o_custkey,
        | CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1000
        |      ELSE o_totalprice END AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
