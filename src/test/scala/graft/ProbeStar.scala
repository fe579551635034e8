package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import etlmudah._
import etlmudah.analytics.Analytics
import etlmudah.joins.Joins

/** Throwaway profiling probe for the q02 star-join stats at sf0.1. */
object ProbeStar {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Tables.lineitem(spark, dir)
    time("warm lineitem scan")(noop(li.select("l_extendedprice", "l_quantity", "l_orderkey")))
    time("lineitem scan again")(noop(li.select("l_extendedprice", "l_quantity", "l_orderkey")))

    val star = Joins.lineitemStar(li, Tables.orders(spark, dir),
      Tables.customer(spark, dir), Tables.nation(spark, dir))
    time("star join only")(noop(star.select("n_name", "l_extendedprice", "l_quantity")))
    time("star join again")(noop(star.select("n_name", "l_extendedprice", "l_quantity")))

    val noMedian = star.groupBy(col("n_name")).agg(
      count(lit(1)).as("n"), round(avg(col("l_extendedprice")), 2).as("avg_value"),
      round(stddev_samp(col("l_extendedprice")), 2).as("sd"),
      round(avg(col("l_quantity")), 2).as("avg_qty"))
    time("star + agg WITHOUT median")(noop(noMedian))
    time("star + agg WITHOUT median again")(noop(noMedian))

    val full = Analytics.statsBy(star, col("n_name"), "n_name", col("l_extendedprice"),
      Seq(round(avg(col("l_quantity")), 2).as("avg_qty")))
    time("full q02 (with median)")(noop(full))
    time("full q02 again")(noop(full))
    spark.stop()
  }
}
