package graft
import org.apache.spark.sql.SparkSession
/** Dev-only: print join/exchange/scan skeleton lines of named queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      val plan = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      println(s"== $q")
      plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") ||
        l.contains("Window") || l.contains("HashAggregate") ||
        l.contains("PushedFilters") || l.contains("Sort ")).foreach(l =>
        println(l.replaceAll("#\\d+L?", "").take(160)))
    }
  }
}
