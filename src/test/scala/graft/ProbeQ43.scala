package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: multi-distinct Expand form vs split-pass form of q43. */
object ProbeQ43 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1 << 20).selectExpr("sum(id)").write.format("noop")
      .mode("overwrite").save()
    def li = etlmudah.Tables.lineitem(spark, dir)
    def expand = li.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_status"))
    def split = {
      val parts = Seq(
        li.agg(count(lit(1)).as("n_rows")),
        li.agg(countDistinct(col("l_orderkey")).as("n_orders")),
        li.agg(countDistinct(col("l_partkey")).as("n_parts")),
        li.agg(countDistinct(col("l_suppkey")).as("n_supps")),
        li.agg(countDistinct(col("l_returnflag"), col("l_linestatus"))
          .as("n_flag_status")))
      parts.map(p => broadcast(p)).reduce(_ crossJoin _)
    }
    for ((name, f) <- Seq(("expand", () => expand), ("split", () => split))) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE q43/$name min=${times.min}%.2f max=${times.max}%.2f")
    }
    spark.stop()
  }
}
