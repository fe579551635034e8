package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import etlmudah._
import etlmudah.scale.{Dedup, Sampling, Similarity}

/** Dev-only drive harness: exercises library operators end-to-end on the
  * sf0.001 testdata. Run with `sbt "Test/runMain graft.ManualDrive"`.
  * Not a ScalaTest suite — a manual smoke surface for quick verification.
  */
object ManualDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "etlmudah.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"

    println("== SparkEntry.entry smoke (driver contract)")
    val e = SparkEntry.entry(spark)
    println(s"entry rows = ${e.count()}")
    e.show(3)

    println("== temperatureSample: column order preserved, flattening visible")
    val docs = Tables.documents(spark, dir).select("doc_id", "lang", "source")
    val ts = Sampling.temperatureSample(docs, "doc_id", "lang",
      alpha = 0.5, targetTotal = 200)
    println(s"columns in == ${docs.columns.mkString(",")} / out == ${ts.columns.mkString(",")}")
    ts.groupBy("lang").count().orderBy("lang").show()

    println("== dupClusters: local vs forced-distributed layout on a 60-chain")
    val chain = ((100L until 159L).map(i => (i, i + 1)) ++
      Seq((7L, 9L), (9L, 11L))).toDF("id_a", "id_b")
    val loc = Dedup.dupClusters(chain)
    val dst = Dedup.dupClusters(chain, localEdgeThreshold = 0L)
    println(s"local rows=${loc.count()} distributed rows=${dst.count()}")
    dst.groupBy("cluster_id").agg(count(lit(1)).as("n")).orderBy("cluster_id").show()

    println("== q64/q66 registered queries over the new dupClusters")
    SparkEntry.queries("q64_dedup_clusters")(spark, dir).show(5)
    println(s"q66 rows = ${SparkEntry.queries("q66_dedup_apply")(spark, dir).count()}")

    println("== q28/q38 ANN with probe pushdown (must equal post-filter form)")
    val emb = Tables.embeddings(spark, dir)
    val lshNew = Similarity.lshTopKAll(emb, "vec_id", "embedding",
      k = 5, tables = 8, bits = 8, probeFilter = Some(col("id") < 20))
    val lshOld = Similarity.lshTopKAll(emb, "vec_id", "embedding",
      k = 5, tables = 8, bits = 8).filter(col("qid") < 20)
    println(s"lsh pushdown==postfilter: ${lshNew.collect().toSeq == lshOld.collect().toSeq}")
    val ivfNew = Similarity.ivfTopKAll(emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4, probeFilter = Some(col("id") < 20))
    val ivfOld = Similarity.ivfTopKAll(emb, "vec_id", "embedding",
      k = 5, nlist = 16, nprobe = 4).filter(col("qid") < 20)
    println(s"ivf pushdown==postfilter: ${ivfNew.collect().toSeq == ivfOld.collect().toSeq}")
    lshNew.show(5)

    println("== unkRewrite (q86): vocab pruning on sf0.001 documents")
    val uk = etlmudah.text.TextStats.unkRewrite(
      Tables.documents(spark, dir), "text", "doc_id", minCount = 900L)
    println(s"q86 rows = ${uk.count()}")
    uk.orderBy(desc("n_unk")).show(5, truncate = 60)

    spark.stop()
  }
}
