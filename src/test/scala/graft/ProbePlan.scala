package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe: count exchange/reuse/codegen nodes in hot plans. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("q25_near_dup_pairs", "q47_decontamination", "q02_stats_by_nation")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      def n(p: String) = p.r.findAllIn(plan).length
      println(s"$q: exchanges=${n("Exchange (hash|range)")} reused=${n("ReusedExchange")} " +
        s"scans=${n("FileScan parquet")} sorts=${n("\\bSort \\[")}")
    }
    spark.stop()
  }
}
