package graft.ml

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Locus-to-gene (L2G) feature factory — distance features (A12/J12).
  *
  * Semantics match the reference
  * (reference: src/gentropy/dataset/l2g_features/distance.py:21-141):
  * credible-set tags join gene distances, scores weight by posterior
  * probability, log-scaled to [0,1] over the genomic window;
  * neighbourhood variants normalise by the regional maximum over
  * protein-coding genes.
  *
  * Scale: one equi-join on variantId (the fan-out is |locus| × genes
  * within the window, both bounded) + one groupBy per feature; the
  * neighbourhood pass adds a window max per studyLocusId.
  */
object L2GFeatures {

  /** Mean distance feature: PP-weighted distance score summed over the
    * credible set, log-scaled. `distances` carries
    * (variantId, geneId, <distanceCol>). */
  def distanceMeanFeature(credSets: DataFrame, distances: DataFrame,
                          distanceCol: String, featureName: String,
                          genomicWindow: Int = 500000): DataFrame = {
    val tags = credSets
      .withColumn("tag", explode_outer(col("locus")))
      .select(col("studyLocusId"),
        col("tag.variantId").as("variantId"),
        col("tag.posteriorProbability").as("posteriorProbability"))
    tags
      .join(distances, Seq("variantId"))
      .withColumn("distance_score",
        (lit(genomicWindow) - col(distanceCol) + 1) * col("posteriorProbability"))
      .groupBy("studyLocusId", "geneId")
      .agg(sum("distance_score").as("agg"))
      .withColumn(featureName,
        log10(col("agg")) / math.log10(genomicWindow + 1.0))
      .drop("agg")
  }

  /** Sentinel distance feature: unweighted distance between the lead
    * variant and each gene, log-scaled. */
  def distanceSentinelFeature(credSets: DataFrame, distances: DataFrame,
                              distanceCol: String, featureName: String,
                              genomicWindow: Int = 500000): DataFrame =
    credSets.select("studyLocusId", "variantId")
      .join(distances, Seq("variantId"))
      .withColumn("distance_score", lit(genomicWindow) - col(distanceCol) + 1)
      .groupBy("studyLocusId", "geneId")
      .agg(first("distance_score").as("agg"))
      .withColumn(featureName,
        log10(col("agg")) / math.log10(genomicWindow + 1.0))
      .drop("agg")

  /** Neighbourhood variant: feature relative to the regional maximum
    * across protein-coding genes of the same locus, clamped to [0,1]. */
  def neighbourhoodFeature(localFeature: DataFrame, genes: DataFrame,
                           localName: String, featureName: String): DataFrame = {
    val w = Window.partitionBy("studyLocusId")
    localFeature
      .join(genes.filter(col("biotype") === "protein_coding")
        .select(col("id").as("geneId")), Seq("geneId"))
      .withColumn("regional_max", max(col(localName)).over(w))
      .withColumn(featureName,
        when(col("regional_max").isNotNull && col("regional_max") =!= 0.0,
          col(localName) / col("regional_max")).otherwise(lit(0.0)))
      .withColumn(featureName,
        when(col(featureName) < 0, 0.0)
          .when(col(featureName) > 1, 1.0)
          .otherwise(col(featureName)))
      .drop("regional_max", localName)
  }

  /** Assemble a wide feature matrix from long-format feature frames
    * (studyLocusId, geneId, <feature>) via outer joins, zero-filled. */
  def featureMatrix(features: Seq[DataFrame]): DataFrame =
    features
      .reduce((a, b) => a.join(b, Seq("studyLocusId", "geneId"), "outer"))
      .na.fill(0.0)
}
