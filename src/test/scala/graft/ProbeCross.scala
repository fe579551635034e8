package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeCross {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.codegen.maxFields", "512")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def secs(tag: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"PROBE $tag ${times.min}%.2f s")
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    secs("q47-cross")(etlmudah.scale.Dedup.crossCorpusNearDups(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1),
      "text", "doc_id", minJaccard = 0.7)
      .write.format("noop").mode("overwrite").save())
    secs("q25-neardup")(etlmudah.scale.Dedup.nearDupPairs(docs, "text", "doc_id",
      minJaccard = 0.8)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
