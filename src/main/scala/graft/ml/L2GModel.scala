package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.GBTClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Locus-to-gene scoring model: gradient-boosted trees over the L2G
  * feature matrix.
  *
  * The reference trains a scikit-learn GradientBoostingClassifier on a
  * pandas copy of the feature matrix and broadcasts the pickled model
  * back for inference (reference: src/gentropy/method/l2g/model.py:1-342,
  * trainer.py:1-473). Here both training and inference stay inside
  * Spark ML (`GBTClassifier`), so the feature matrix never leaves the
  * cluster and scoring is a distributed transform — the difference
  * that matters when the matrix is billions of (locus, gene) rows.
  */
object L2GModel {

  val LabelCol = "goldStandardSet"
  val ScoreCol = "score"

  /** Train a GBT on (studyLocusId, geneId, features..., goldStandardSet).
    * `featureCols` defaults to every non-key numeric column. */
  def train(trainingData: DataFrame,
            featureCols: Seq[String] = Nil,
            maxIter: Int = 50,
            maxDepth: Int = 5): PipelineModel = {
    val cols =
      if (featureCols.nonEmpty) featureCols
      else trainingData.columns.toSeq
        .filterNot(Seq("studyLocusId", "geneId", LabelCol).contains)
    val assembler = new VectorAssembler()
      .setInputCols(cols.toArray)
      .setOutputCol("features")
      .setHandleInvalid("keep")
    val gbt = new GBTClassifier()
      .setLabelCol(LabelCol)
      .setFeaturesCol("features")
      .setMaxIter(maxIter)
      .setMaxDepth(maxDepth)
      .setSeed(42L)
    new Pipeline().setStages(Array(assembler, gbt)).fit(trainingData)
  }

  /** Score a feature matrix; appends `score` = P(gold standard). */
  def score(model: PipelineModel, featureMatrix: DataFrame): DataFrame = {
    val secondElement = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model.transform(featureMatrix)
      .withColumn(ScoreCol, secondElement(col("probability")))
      .drop("features", "rawPrediction", "probability", "prediction")
  }

  /** Area under ROC of the trained model on a labelled hold-out. */
  def evaluate(model: PipelineModel, testData: DataFrame): Double =
    new BinaryClassificationEvaluator()
      .setLabelCol(LabelCol)
      .setRawPredictionCol("rawPrediction")
      .evaluate(model.transform(testData))
}
