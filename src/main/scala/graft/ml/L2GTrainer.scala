package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Locus-to-gene trainer: group-aware hold-out + grouped K-fold
  * cross-validation + final fit, all inside Spark ML.
  *
  * The reference collects the feature matrix to pandas and uses
  * sklearn's GroupShuffleSplit / GroupKFold keyed on the
  * (trait, gene) pair so folds never leak a gene-trait association
  * across the split (reference: src/gentropy/method/l2g/trainer.py:
  * 286-349, 349-473). Here the same grouping contract is enforced
  * distributively: groups are assigned to splits/folds by a seeded
  * hash of the group key, so the partition is deterministic, needs no
  * driver-side index arrays, and scales to matrices that do not fit
  * in pandas. Labels encode negative→0, positive→1
  * (reference: src/gentropy/method/l2g/model.py:44-49).
  */
object L2GTrainer {

  val LabelCol = "goldStandardSet"
  val GroupCol = "_cvGroup"

  case class FoldMetrics(fold: Int, areaUnderROC: Double,
                         averagePrecision: Double, nVal: Long)

  case class TrainResult(model: PipelineModel, holdoutAreaUnderROC: Double,
                         holdoutAveragePrecision: Double,
                         cvMetrics: Seq[FoldMetrics])

  /** Numeric label column (negative→0.0, positive→1.0); idempotent —
    * an already-numeric label passes through untouched. */
  def encodeLabel(df: DataFrame): DataFrame =
    df.schema(LabelCol).dataType match {
      case org.apache.spark.sql.types.StringType =>
        df.withColumn(LabelCol,
          when(col(LabelCol) === L2GGoldStandard.PositiveLabel, 1.0)
            .when(col(LabelCol) === L2GGoldStandard.NegativeLabel, 0.0))
      case _ => df
    }

  /** Deterministic group id from the grouping columns (trait + gene
    * unless the matrix lacks a trait column). */
  private def groupExpr(df: DataFrame) = {
    val cols = Seq("traitFromSourceMappedId", "geneId")
      .filter(df.columns.contains)
    concat_ws("_", cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
  }

  /** Group-aware train/test split: every group lands entirely in one
    * side. `testFraction` is honoured in expectation over groups.
    * reference: src/gentropy/method/l2g/trainer.py:319-326 */
  def trainTestSplit(matrix: DataFrame, testFraction: Double = 0.2,
                     seed: Long = 42L): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(groupExpr(matrix), lit(seed)), lit(1000L))
    val withB = matrix.withColumn("_b", bucket)
    val cut = (testFraction * 1000).toLong
    (withB.filter(col("_b") >= cut).drop("_b"),
      withB.filter(col("_b") < cut).drop("_b"))
  }

  private def evaluator(metric: String) = new BinaryClassificationEvaluator()
    .setLabelCol(LabelCol)
    .setRawPredictionCol("rawPrediction")
    .setMetricName(metric)

  /** Grouped K-fold CV on the training split: fold = seeded hash of
    * the group, model fit on k−1 folds, AUROC / average precision on
    * the held-out fold. reference: src/gentropy/method/l2g/trainer.py:349-473 */
  def crossValidate(train: DataFrame, featureCols: Seq[String] = Nil,
                    nSplits: Int = 5, seed: Long = 42L,
                    maxIter: Int = 50, maxDepth: Int = 5): Seq[FoldMetrics] = {
    val withFold = train
      .withColumn("_fold", pmod(xxhash64(groupExpr(train), lit(seed + 1)),
        lit(nSplits.toLong)))
      .persist()
    try {
      (0 until nSplits).map { k =>
        val tr = withFold.filter(col("_fold") =!= k).drop("_fold")
        val va = withFold.filter(col("_fold") === k).drop("_fold")
        val m = L2GModel.train(tr, featureCols, maxIter, maxDepth)
        val scored = m.transform(va)
        FoldMetrics(k,
          evaluator("areaUnderROC").evaluate(scored),
          evaluator("areaUnderPR").evaluate(scored),
          va.count())
      }
    } finally { withFold.unpersist() }
  }

  /** Full protocol: hold-out split → optional grouped CV → final fit
    * on the training split → one evaluation on the hold-out.
    * reference: src/gentropy/method/l2g/trainer.py:286-348 */
  def train(matrix: DataFrame, featureCols: Seq[String] = Nil,
            crossValidate: Boolean = true, nSplits: Int = 5,
            seed: Long = 42L, maxIter: Int = 50,
            maxDepth: Int = 5): TrainResult = {
    val encoded = encodeLabel(matrix)
    val (tr, te) = trainTestSplit(encoded, seed = seed)
    val cv =
      if (crossValidate)
        this.crossValidate(tr, featureCols, nSplits, seed, maxIter, maxDepth)
      else Nil
    val model = L2GModel.train(tr, featureCols, maxIter, maxDepth)
    val scored = model.transform(te)
    TrainResult(model,
      evaluator("areaUnderROC").evaluate(scored),
      evaluator("areaUnderPR").evaluate(scored), cv)
  }
}
