package graft.core

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.reflect.runtime.universe.TypeTag

/** Typed, schema-validated table wrappers — the engine's counterpart
  * of the reference's `Dataset(_df, _schema)` abstraction
  * (reference: src/gentropy/dataset/dataset.py:28-202), immutable by
  * design (SURVEY §7.4.5). Schemas derive from the case classes below
  * instead of JSON assets; [[SchemaValidator]] enforces them when
  * wrapping foreign DataFrames.
  */
final case class GDataset[T <: Product: TypeTag](df: DataFrame) {
  def schema: StructType = GDataset.schemaOf[T]
  def validated: GDataset[T] = {
    SchemaValidator.validate(schema, df.schema)
    this
  }
}

object GDataset {
  def schemaOf[T <: Product: TypeTag]: StructType =
    Encoders.product[T].schema

  /** Typed parquet reader with schema enforcement and fail-on-empty,
    * mirroring `Dataset.from_parquet`
    * (reference: src/gentropy/dataset/dataset.py:144-172). */
  def fromParquet[T <: Product: TypeTag](spark: SparkSession,
                                         path: String): GDataset[T] = {
    val df = spark.read.schema(schemaOf[T]).parquet(path)
    if (df.isEmpty)
      throw new IllegalArgumentException(s"Parquet at $path is empty")
    GDataset[T](df)
  }
}

// --- core domain row types (schemas per reference JSON assets;
// nested tag structs shared across datasets) ---

case class LocusTag(
  variantId: String,
  posteriorProbability: Option[Double],
  logBF: Option[Double],
  pValueMantissa: Option[Float],
  pValueExponent: Option[Int],
  beta: Option[Double],
  standardError: Option[Double],
  r2Overall: Option[Double],
  is95CredibleSet: Option[Boolean],
  is99CredibleSet: Option[Boolean])

case class LdSetEntry(tagVariantId: String, r2Overall: Option[Double])

case class SummaryStatisticsRow(
  studyId: String,
  variantId: String,
  chromosome: String,
  position: Int,
  beta: Double,
  sampleSize: Option[Int],
  pValueMantissa: Float,
  pValueExponent: Int,
  effectAlleleFrequencyFromSource: Option[Float],
  standardError: Option[Double])

case class StudyLocusRow(
  studyLocusId: String,
  studyId: String,
  variantId: String,
  chromosome: Option[String],
  position: Option[Int],
  region: Option[String],
  studyType: Option[String],
  beta: Option[Double],
  zScore: Option[Double],
  pValueMantissa: Option[Float],
  pValueExponent: Option[Int],
  credibleSetIndex: Option[Int],
  credibleSetlog10BF: Option[Double],
  purityMeanR2: Option[Double],
  purityMinR2: Option[Double],
  locusStart: Option[Int],
  locusEnd: Option[Int],
  finemappingMethod: Option[String],
  qualityControls: Option[Seq[String]],
  ldSet: Option[Seq[LdSetEntry]],
  locus: Option[Seq[LocusTag]])

case class StudyLocusOverlapStats(
  left_logBF: Option[Double],
  right_logBF: Option[Double],
  left_posteriorProbability: Option[Double],
  right_posteriorProbability: Option[Double],
  left_beta: Option[Double],
  right_beta: Option[Double])

case class StudyLocusOverlapRow(
  leftStudyLocusId: String,
  rightStudyLocusId: String,
  rightStudyType: String,
  chromosome: Option[String],
  tagVariantId: String,
  statistics: StudyLocusOverlapStats)

case class ColocalisationRow(
  leftStudyLocusId: String,
  rightStudyLocusId: String,
  rightStudyType: String,
  chromosome: String,
  colocalisationMethod: String,
  numberColocalisingVariants: Long,
  h0: Option[Double],
  h1: Option[Double],
  h2: Option[Double],
  h3: Option[Double],
  h4: Option[Double],
  clpp: Option[Double],
  betaRatioSignAverage: Option[Double])

case class LdPopulationStructure(ldPopulation: String,
  relativeSampleSize: Option[Double])

case class StudyIndexRow(
  studyId: String,
  projectId: Option[String],
  studyType: String,
  geneId: Option[String],
  traitFromSource: Option[String],
  nSamples: Option[Int],
  ldPopulationStructure: Option[Seq[LdPopulationStructure]],
  qualityControls: Option[Seq[String]],
  hasSumstats: Option[Boolean],
  sumstatQCValues: Option[Map[String, Float]])

case class RValue(population: String, r: Option[Double])
case class LdIndexSetEntry(tagVariantId: String, rValues: Seq[RValue])

case class LdIndexRow(
  variantId: String,
  chromosome: String,
  ldSet: Seq[LdIndexSetEntry])

case class IntervalRow(
  chromosome: String,
  start: Int,
  end: Int,
  geneId: String,
  resourceScore: Option[Double],
  score: Option[Double],
  datasourceId: String,
  datatypeId: String,
  studyId: Option[String],
  biosampleId: Option[String])
