package graft.ml

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Locus-to-gene predictions: apply a trained model to the feature
  * matrix of GWAS credible sets, export disease-target evidence, and
  * attach per-row feature attributions.
  *
  * Mirrors the reference's prediction surface
  * (reference: src/gentropy/dataset/l2g_prediction.py:49-145 scoring,
  * :105-145 evidence export, :146-306 explanations) with the scoring
  * and attribution kept distributed: the reference pivots predictions
  * to pandas and runs the shap library on the driver; here every step
  * is a DataFrame transform, so a billion-row matrix scores and
  * explains without leaving the executors.
  */
object L2GPrediction {

  val ScoreCol: String = L2GModel.ScoreCol

  /** Score the GWAS credible sets: restrict the full feature matrix to
    * GWAS loci with protein-coding links, zero-fill, score.
    * reference: src/gentropy/dataset/l2g_prediction.py:49-110 */
  def fromCredibleSet(model: PipelineModel, credSets: DataFrame,
                      featureMatrix: DataFrame): DataFrame = {
    val fm = credSets
      .filter(col("studyType") === "gwas")
      .select("studyLocusId")
      .distinct()
      .join(featureMatrix, Seq("studyLocusId"))
      .filter(col("isProteinCoding") === 1.0)
      .na.fill(0.0)
    L2GModel.score(model, fm)
      .select("studyLocusId", "geneId", ScoreCol)
  }

  /** Disease-target evidence rows for predictions above threshold.
    * reference: src/gentropy/dataset/l2g_prediction.py:105-145 */
  def toDiseaseTargetEvidence(predictions: DataFrame, studyLocus: DataFrame,
                              studyIndex: DataFrame,
                              l2gThreshold: Double = 0.05): DataFrame =
    predictions
      .filter(col(ScoreCol) >= l2gThreshold)
      .join(studyLocus.select("studyLocusId", "studyId"), Seq("studyLocusId"))
      .join(studyIndex.select("studyId", "diseaseIds"), Seq("studyId"))
      .select(
        lit("genetic_association").as("datatypeId"),
        lit("gwas_credible_sets").as("datasourceId"),
        col("geneId").as("targetFromSourceId"),
        explode(col("diseaseIds")).as("diseaseFromSourceMappedId"),
        col(ScoreCol).as("resourceScore"),
        col("studyLocusId"))

  /** Attach the feature values used for each prediction as an
    * array<struct<name,value>> column, like the reference's
    * `add_features`. reference: src/gentropy/dataset/l2g_prediction.py:308-366 */
  def addFeatures(predictions: DataFrame, featureMatrix: DataFrame,
                  featureCols: Seq[String]): DataFrame =
    predictions.join(
      featureMatrix.select(col("studyLocusId") :: col("geneId") ::
        array(featureCols.map(c =>
          struct(lit(c).as("name"), col(c).cast("double").as("value"))): _*)
          .as("features") :: Nil: _*),
      Seq("studyLocusId", "geneId"), "left")

  /** Per-row feature attributions by occlusion: for each feature, the
    * score delta when that feature is zeroed (its fillna baseline)
    * while all others keep their values. A deliberate, documented
    * deviation from the reference's driver-side Shapley explainer
    * (shap.TreeExplainer over a pandas pivot): occlusion deltas are
    * computable as N extra distributed scoring passes — no driver
    * materialisation — and preserve the property users consume
    * (which features drove this row's score, with sign). Column
    * `attributions`: array<struct<name,value>> where value =
    * score(x) − score(x with feature zeroed). */
  def explainByOcclusion(model: PipelineModel, featureMatrix: DataFrame,
                         featureCols: Seq[String]): DataFrame = {
    val base = L2GModel.score(model, featureMatrix.na.fill(0.0))
      .withColumnRenamed(ScoreCol, "_baseScore")
    val withDeltas = featureCols.foldLeft(base) { (acc, f) =>
      val occluded = L2GModel.score(model,
        featureMatrix.na.fill(0.0).withColumn(f, lit(0.0)))
        .select(col("studyLocusId"), col("geneId"),
          col(ScoreCol).as(s"_occ_$f"))
      acc.join(occluded, Seq("studyLocusId", "geneId"))
    }
    withDeltas.select(
      col("studyLocusId"), col("geneId"),
      col("_baseScore").as(ScoreCol),
      array(featureCols.map(f =>
        struct(lit(f).as("name"),
          (col("_baseScore") - col(s"_occ_$f")).as("value"))): _*)
        .as("attributions"))
  }
}
