package graft.operators

import graft.functions.ArrayFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Variant-index operators: identifier hashing, nested-annotation
  * merging, and variant-effect score normalisation.
  *
  * Semantics per reference: src/gentropy/dataset/variant_index.py.
  */
object VariantOps {

  /** Hash over-long variant identifiers to `OTVAR_…` md5 forms,
    * keeping locatable prefixes when chromosome/position exist.
    * reference: src/gentropy/dataset/variant_index.py:73-126 */
  def hashLongVariantIds(variantId: Column, chromosome: Column,
                         position: Column, threshold: Int = 100): Column =
    when(variantId.isNull, lit(null))
      .when(chromosome.isNull || position.isNull,
        concat(lit("OTVAR_"), md5(variantId)))
      .when(length(variantId) >= threshold,
        concat_ws("_", lit("OTVAR"), chromosome, position, md5(variantId)))
      .otherwise(variantId)

  /** Merge two VariantIndex frames on variantId, unioning nested
    * annotation arrays null-safely (J9).
    * reference: src/gentropy/dataset/variant_index.py:127-204 */
  def mergeAnnotations(left: DataFrame, right: DataFrame,
                       arrayColumns: Seq[String]): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val scalarCols = left.columns.filterNot(arrayColumns.contains)
      .filterNot(_ == "variantId")
    l.join(r, Seq("variantId"), "outer")
      .select(
        col("variantId") +:
          (scalarCols.map(c =>
            coalesce(col(s"l.$c"), col(s"r.$c")).as(c)) ++
            arrayColumns.map(c =>
              ArrayFns.safeArrayUnion(col(s"l.$c"), col(s"r.$c")).as(c))): _*)
  }

  /** Linear rescaling of in-silico predictor scores to a [0,1]
    * normalised scale, per method (F25 subset: the reference's
    * piecewise-linear maps for common predictors).
    * reference: src/gentropy/dataset/variant_index.py:367-717 */
  def normalisedEffectScore(method: Column, score: Column): Column = {
    // each entry: raw range (lo, hi) mapped linearly onto [0, 1]
    def scale(lo: Double, hi: Double): Column =
      least(greatest((score - lo) / (hi - lo), lit(0.0)), lit(1.0))
    when(method === "AlphaMissense", scale(0.0, 1.0))
      .when(method === "CADD", scale(0.0, 40.0))
      .when(method === "SIFT", lit(1.0) - scale(0.0, 1.0)) // lower = worse
      .when(method === "PolyPhen", scale(0.0, 1.0))
      .when(method === "GERP", scale(-3.0, 6.17))
      .when(method === "FoldX", scale(0.0, 10.0))
      .when(method === "Pangolin", scale(0.0, 1.0))
      .when(method === "LOFTEE", when(score >= 1.0, 1.0).otherwise(0.0))
  }

  /** Pick the most severe transcript consequence per variant from an
    * ordered severity vocabulary (F24-style struct surgery). */
  def mostSevereConsequence(transcripts: Column, severityRank: Column): Column =
    ArrayFns.sortArrayOfStructsDesc(
      transform(transcripts, t =>
        t.withField("severityScore",
          coalesce(element_at(severityRank, t.getField("consequenceTerm")),
            lit(0.0)))),
      "severityScore").getItem(0)
}
