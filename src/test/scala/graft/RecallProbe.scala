package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.01"); bpd <- Seq(1, 2); ck <- Seq(50, 500)) {
      val r = etlmudah.scale.Similarity.binaryRecallReport(
        etlmudah.Tables.embeddings(spark, sf), "vec_id", "embedding",
        dims = 64, nprobe = 5, candK = ck, k = 10, bitsPerDim = bpd)
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"PROBE sf=$sf bitsPerDim=$bpd candK=$ck avg_recall=$r%.3f")
    }
    spark.stop()
  }
}
