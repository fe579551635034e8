package graft
import org.apache.spark.sql.SparkSession
/** Dev-only plan inspector: prints the Window/WindowGroupLimit lines of
  * the named registered queries' physical plans — the quick check that
  * InferWindowGroupLimit rewrote a rank-filtered window into map-side
  * group limits. `sbt "Test/runMain graft.PlanPeek q09_... q17_..."`. */
object PlanPeek {
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
        l.contains("WindowGroupLimit") || l.contains("Window [")).foreach(println)
    }
    spark.stop()
  }
}
