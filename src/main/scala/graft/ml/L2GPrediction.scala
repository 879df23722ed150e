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

  /** Per-row EXACT SHAP attributions via native TreeSHAP
    * ([[TreeShap]]): the same Shapley semantics as the reference's
    * driver-side `shap.TreeExplainer` over a pandas pivot
    * (reference: src/gentropy/dataset/l2g_prediction.py:146-306), but
    * computed where the rows live — the flattened ensemble ships in
    * the task closure, one distributed pass, no driver pivot.
    *
    * Output columns: `score` (reconstructed exactly from
    * base + Σφ via the efficiency property — equals the model's
    * probability to machine precision), `shapBaseValue`, and
    * `shapValues`: array<struct<name,value>> in log-odds units (the
    * scale the shap library reports for sklearn GBTs; Spark's margin
    * maps to probability via `p = sigmoid(2·margin)`, so log-odds
    * = 2·margin). Pass `logOdds = false` for raw margin units. */
  def explainByShap(model: PipelineModel, featureMatrix: DataFrame,
                    featureCols: Seq[String],
                    logOdds: Boolean = true): DataFrame = {
    import org.apache.spark.ml.classification.GBTClassificationModel
    import org.apache.spark.ml.feature.VectorAssembler
    val gbt = model.stages.collectFirst { case m: GBTClassificationModel => m }
      .getOrElse(throw new IllegalArgumentException(
        "explainByShap needs a GBTClassificationModel pipeline stage"))
    val assembler = model.stages.collectFirst { case a: VectorAssembler => a }
      .getOrElse(throw new IllegalArgumentException(
        "explainByShap needs the pipeline's VectorAssembler stage"))
    val trees = TreeShap.flatten(gbt)
    val scale = if (logOdds) 2.0 else 1.0
    val base = TreeShap.expectedMargin(trees) * scale
    val nf = featureCols.length
    val shapUdf = udf { (v: org.apache.spark.ml.linalg.Vector) =>
      TreeShap.shapValues(trees, v.toArray, nf).map(_ * scale)
    }
    val total = lit(base) +
      aggregate(col("_shap"), lit(0.0), (acc, x) => acc + x)
    val logOddsTotal = if (logOdds) total else total * 2.0
    assembler.transform(featureMatrix.na.fill(0.0))
      .withColumn("_shap", shapUdf(col(assembler.getOutputCol)))
      .select(
        col("studyLocusId"), col("geneId"),
        (lit(1.0) / (lit(1.0) + exp(-logOddsTotal))).as(ScoreCol),
        lit(base).as("shapBaseValue"),
        array(featureCols.zipWithIndex.map { case (c, i) =>
          struct(lit(c).as("name"),
            element_at(col("_shap"), i + 1).as("value"))
        }: _*).as("shapValues"))
  }

  /** Per-row feature attributions by occlusion: for each feature, the
    * score delta when that feature is zeroed (its fillna baseline)
    * while all others keep their values. Cheaper-but-approximate
    * alternative to [[explainByShap]] (N extra scoring passes, no
    * Shapley axioms). Column `attributions`:
    * array<struct<name,value>> where value =
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
