package etlmudah.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ML price-prediction pipeline (SURVEY.md §2.10 M1-M8), re-expressing
  * streamlit/pages/price_prediction.py:9-65 on Spark MLlib:
  * label-encode categoricals (StringIndexer ~ sklearn LabelEncoder),
  * seeded 80/20 split, RandomForest(100 trees, seed 42), R-squared on
  * train/test, single-point predict with a +/-15% band, feature
  * importances, and the n>=100 minimum-sample guard.
  *
  * Numeric parity with sklearn is impossible (different tree builders),
  * so this module is verified by invariants (SURVEY §7.5.6): R-squared
  * bounds, importances summing to 1, split sizes, prediction inside the
  * label range. Training is distributed (MLlib RF trains trees over
  * partitioned data); inference is a per-row transform.
  */
object PricePipeline {

  final case class Trained(model: PipelineModel, r2Train: Double, r2Test: Double,
                           featureNames: Seq[String], nTrain: Long, nTest: Long)

  /** M1-M5 + M8. `catCols` are label-encoded; `numCols` pass through. */
  def train(df: DataFrame, catCols: Seq[String], numCols: Seq[String],
            labelCol: String, minSamples: Long = 100, seed: Long = 42): Trained = {
    val clean = df.na.drop(catCols ++ numCols :+ labelCol)   // F8
    val n = clean.count()
    require(n >= minSamples, s"need >= $minSamples clean rows, got $n")  // M8

    val indexers = catCols.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setHandleInvalid("error").setStringOrderType("alphabetAsc"))
    val featureCols = numCols ++ catCols.map(c => s"${c}_idx")
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val rf = new RandomForestRegressor()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setNumTrees(100).setSeed(seed)                         // M4
    val pipeline = new Pipeline().setStages((indexers :+ assembler :+ rf).toArray)

    val Array(trainDf, testDf) = clean.randomSplit(Array(0.8, 0.2), seed)  // M3
    val model = pipeline.fit(trainDf)
    val eval = new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction").setMetricName("r2")
    Trained(model,
      r2Train = eval.evaluate(model.transform(trainDf)),      // M5
      r2Test = eval.evaluate(model.transform(testDf)),
      featureNames = featureCols,
      nTrain = trainDf.count(), nTest = testDf.count())
  }

  /** M7: (feature, importance) sorted desc; importances sum to 1. */
  def importances(t: Trained)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rf = t.model.stages.last.asInstanceOf[RandomForestRegressionModel]
    t.featureNames.zip(rf.featureImportances.toArray)
      .toDF("feature", "importance")
      .orderBy(col("importance").desc, col("feature").asc)
  }

  /** M6: predict one point, returning (prediction, lo, hi) with a +/-15%
    * band (price_prediction.py:84-88). `point` must carry the raw
    * cat/num columns used at train time. */
  def predictOne(t: Trained, point: DataFrame): DataFrame =
    t.model.transform(point)
      .select(col("prediction"),
        (col("prediction") * 0.85).as("lo"),
        (col("prediction") * 1.15).as("hi"))
}
