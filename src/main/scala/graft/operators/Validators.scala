package graft.operators

import graft.functions.ArrayFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-level validation flows: quality-flag derivation for study
  * indices and study loci against reference indices (J8 join pattern
  * applied to the domain validators).
  *
  * reference: src/gentropy/dataset/study_locus.py:160-335 and
  * src/gentropy/dataset/study_index.py:261-607.
  *
  * Every validator is a broadcast-or-shuffle left join against a
  * (small) reference index followed by a flag update — the probe side
  * streams, no validator adds more than one shuffle of the validated
  * dataset, and all flag vocabulary matches the reference verbatim.
  */
object Validators {

  /** Study-level flag vocabulary.
    * reference: src/gentropy/dataset/study_index.py:31-63 */
  object StudyFlags {
    val UnresolvedTarget = "Target/gene identifier could not match to reference"
    val UnresolvedDisease = "No valid disease identifier found"
    val UnknownStudyType = "This type of study is not supported"
    val UnknownBiosample = "Biosample identifier was not found in the reference"
    val DuplicatedStudy = "The identifier of this study is not unique"
    val SumstatsNotAvailable =
      "Harmonized summary statistics are not available or empty"
    val FailedMeanBetaCheck =
      "The mean beta QC check value is not within the expected range"
    val FailedPzCheck = "The PZ QC check values are not within the expected range"
    val FailedGcLambdaCheck =
      "The GC lambda value is not within the expected range"
    val SmallNumberOfSnps =
      "The number of SNPs in the study is below the expected threshold"
  }

  /** Locus-level flag vocabulary.
    * reference: src/gentropy/dataset/study_locus.py:92-122 */
  object LocusFlags {
    val FlaggedStudy = "Study has quality control flag(s)"
    val MissingStudy = "Study not found in the study index"
    val TopHit = "Study locus from curated top hit"
    val TopHitAndSummaryStats =
      "Curated top hit is flagged because summary statistics are available for study"
    val InvalidChromosome = "Chromosome not in 1:22, X, Y, XY or MT"
    val InvalidVariantIdentifier =
      "Some variant identifiers of this locus were not found in variant index"
    val DuplicatedStudyLocusId = "Non-unique study locus identifier"
  }

  private val validChromosomes =
    (1 to 22).map(_.toString) ++ Seq("X", "Y", "XY", "MT")

  private def qc(df: DataFrame): Column =
    if (df.columns.contains("qualityControls")) col("qualityControls")
    else lit(null).cast("array<string>")

  /** True for every occurrence of a value after its first (deterministic
    * tie-break by monotonically unstable order is acceptable here, as
    * in the reference's orderBy(rand())).
    * reference: src/gentropy/dataset/dataset.py:344-356 */
  def flagDuplicates(testColumn: Column): Column =
    row_number().over(Window.partitionBy(testColumn)
      .orderBy(monotonically_increasing_id())) > 1

  // ------------------------------------------------------ StudyLocus

  /** Flag loci whose study is flagged, missing, or a top hit with
    * summary statistics available.
    * reference: src/gentropy/dataset/study_locus.py:160-230 */
  def validateStudy(studyLocus: DataFrame, studyIndex: DataFrame): DataFrame = {
    val flags = studyIndex.select(
      col("studyId").as("study_studyId"),
      (if (studyIndex.columns.contains("qualityControls"))
        col("qualityControls") else lit(null).cast("array<string>"))
        .as("study_qualityControls"))
    studyLocus
      .join(broadcast(flags), col("studyId") === col("study_studyId"), "left")
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"),
          size(col("study_qualityControls")) > 0, LocusFlags.FlaggedStudy))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"),
          array_contains(col("qualityControls"), LocusFlags.TopHit) &&
            !array_contains(col("study_qualityControls"),
              StudyFlags.SumstatsNotAvailable),
          LocusFlags.TopHitAndSummaryStats))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"),
          col("study_studyId").isNull, LocusFlags.MissingStudy))
      .drop("study_studyId", "study_qualityControls")
  }

  /** Attach studyType from the study index.
    * reference: src/gentropy/dataset/study_locus.py:232-249 */
  def annotateStudyType(studyLocus: DataFrame, studyIndex: DataFrame): DataFrame =
    studyLocus.drop("studyType")
      .join(broadcast(studyIndex.select("studyId", "studyType")),
        Seq("studyId"), "left")

  /** Flag non-canonical chromosome labels.
    * reference: src/gentropy/dataset/study_locus.py:251-277 */
  def validateChromosomeLabel(studyLocus: DataFrame): DataFrame =
    studyLocus.withColumn("qualityControls",
      ArrayFns.updateQualityFlag(qc(studyLocus),
        !col("chromosome").isin(validChromosomes: _*),
        LocusFlags.InvalidChromosome))

  /** Flag non-unique studyLocusId rows. */
  def validateUniqueStudyLocusId(studyLocus: DataFrame): DataFrame =
    studyLocus.withColumn("qualityControls",
      ArrayFns.updateQualityFlag(qc(studyLocus),
        flagDuplicates(col("studyLocusId")),
        LocusFlags.DuplicatedStudyLocusId))

  /** Flag loci with ANY tag variant missing from the variant index.
    * reference: src/gentropy/dataset/study_locus.py:279-335 */
  def validateVariantIdentifiers(studyLocus: DataFrame,
                                 variantIndex: DataFrame): DataFrame = {
    val flag = studyLocus
      .select(col("studyLocusId"), explode(col("locus")).as("tag"))
      .select(col("studyLocusId"), col("tag.variantId").as("variantId"))
      .join(variantIndex.select(col("variantId"),
        lit(true).as("inVariantIndex")), Seq("variantId"), "left")
      .groupBy("studyLocusId")
      .agg(max(when(col("inVariantIndex").isNull, 1).otherwise(0)) === 1)
      .toDF("studyLocusId", "toFlag")
    studyLocus
      .join(flag, Seq("studyLocusId"), "left")
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(qc(studyLocus), col("toFlag"),
          LocusFlags.InvalidVariantIdentifier))
      .drop("toFlag")
  }

  // ------------------------------------------------------ StudyIndex

  /** Flag duplicated study identifiers.
    * reference: src/gentropy/dataset/study_index.py:261-278 */
  def validateUniqueStudyId(studyIndex: DataFrame): DataFrame =
    studyIndex.withColumn("qualityControls",
      ArrayFns.updateQualityFlag(qc(studyIndex),
        flagDuplicates(col("studyId")), StudyFlags.DuplicatedStudy))

  /** Flag unsupported study types (anything but gwas / *qtl).
    * reference: src/gentropy/dataset/study_index.py:385-408 */
  def validateStudyType(studyIndex: DataFrame): DataFrame =
    studyIndex.withColumn("qualityControls",
      ArrayFns.updateQualityFlag(qc(studyIndex),
        !(col("studyType") === "gwas" || col("studyType").endsWith("qtl")),
        StudyFlags.UnknownStudyType))

  /** Flag non-GWAS studies whose geneId is absent from the target
    * index. reference: src/gentropy/dataset/study_index.py:409-444 */
  def validateTarget(studyIndex: DataFrame, targetIndex: DataFrame): DataFrame = {
    if (!studyIndex.columns.contains("geneId")) return studyIndex
    val genes = targetIndex.select(col("id").as("geneId"),
      lit(true).as("isIdFound"))
    studyIndex
      .join(broadcast(genes), Seq("geneId"), "left")
      .withColumn("isIdFound",
        when(col("studyType") =!= "gwas" && col("isIdFound").isNull, false)
          .otherwise(true))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(qc(studyIndex), !col("isIdFound"),
          StudyFlags.UnresolvedTarget))
      .drop("isIdFound")
  }

  /** Flag non-GWAS studies whose biosample is absent from the
    * biosample index.
    * reference: src/gentropy/dataset/study_index.py:446-494 */
  def validateBiosample(studyIndex: DataFrame,
                        biosampleIndex: DataFrame): DataFrame = {
    val base =
      if (studyIndex.columns.contains("biosampleId"))
        studyIndex.drop("biosampleId")
      else studyIndex
    if (!base.columns.contains("biosampleFromSourceId")) return base
    val biosamples = biosampleIndex.select(col("biosampleId"),
      lit(true).as("isIdFound"))
    base
      .join(broadcast(biosamples),
        col("biosampleFromSourceId") === col("biosampleId"), "left")
      .withColumn("isIdFound",
        when(col("studyType") =!= "gwas" && col("isIdFound").isNull, false)
          .otherwise(true))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(qc(base), !col("isIdFound"),
          StudyFlags.UnknownBiosample))
      .drop("isIdFound")
  }

  /** Map source EFO ids through a disease map and flag GWAS studies
    * with no valid disease.
    * reference: src/gentropy/dataset/study_index.py:279-384 */
  def validateDisease(studyIndex: DataFrame, diseaseMap: DataFrame): DataFrame = {
    if (!studyIndex.columns.contains("traitFromSourceMappedIds") ||
      !studyIndex.columns.contains("backgroundTraitFromSourceMappedIds"))
      return studyIndex
    def normalise(src: String, out: String): DataFrame =
      studyIndex
        .filter(size(col(src)) > 0)
        .select(col("studyId"), explode_outer(col(src)).as("efo"))
        .join(broadcast(diseaseMap), Seq("efo"), "left")
        .groupBy("studyId")
        .agg(collect_set(col("diseaseId")).as(out))
    val base = studyIndex.drop("diseaseIds", "backgroundDiseaseIds")
    base
      .join(normalise("traitFromSourceMappedIds", "diseaseIds"),
        Seq("studyId"), "left")
      .join(normalise("backgroundTraitFromSourceMappedIds",
        "backgroundDiseaseIds"), Seq("studyId"), "left")
      .withColumn("diseaseIds",
        coalesce(col("diseaseIds"), array().cast("array<string>")))
      .withColumn("backgroundDiseaseIds",
        coalesce(col("backgroundDiseaseIds"), array().cast("array<string>")))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(qc(base),
          size(col("diseaseIds")) === 0 && col("studyType") === "gwas",
          StudyFlags.UnresolvedDisease))
  }

  /** Attach summary-statistics QC metrics as a map column and derive
    * the threshold flags.
    * reference: src/gentropy/dataset/study_index.py:495-607 */
  def annotateSumstatsQc(studyIndex: DataFrame, sumstatsQc: DataFrame,
                         thresholdMeanBeta: Double = 0.05,
                         thresholdMeanDiffPz: Double = 0.05,
                         thresholdSeDiffPz: Double = 0.05,
                         thresholdMinGcLambda: Double = 0.7,
                         thresholdMaxGcLambda: Double = 2.5,
                         thresholdMinNVariants: Long = 2000000L): DataFrame = {
    val metricCols = sumstatsQc.columns.filterNot(_ == "studyId")
    val qcMap = sumstatsQc.select(col("studyId"),
      map_from_arrays(
        array(metricCols.map(lit): _*),
        array(metricCols.map(c => col(c).cast("double")): _*))
        .as("sumstatQCValues"))
    val v = (name: String) => element_at(col("sumstatQCValues"), name)
    studyIndex.drop("sumstatQCValues", "hasSumstats")
      .join(broadcast(qcMap.withColumn("hasSumstats", lit(true))),
        Seq("studyId"), "left")
      .withColumn("hasSumstats", coalesce(col("hasSumstats"), lit(false)))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(qc(studyIndex), !col("hasSumstats"),
          StudyFlags.SumstatsNotAvailable))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"),
          !(abs(v("mean_beta")) <= thresholdMeanBeta),
          StudyFlags.FailedMeanBetaCheck))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"),
          !(abs(v("mean_diff_pz")) <= thresholdMeanDiffPz &&
            v("se_diff_pz") <= thresholdSeDiffPz),
          StudyFlags.FailedPzCheck))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"),
          !(v("gc_lambda") <= thresholdMaxGcLambda &&
            v("gc_lambda") >= thresholdMinGcLambda),
          StudyFlags.FailedGcLambdaCheck))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"),
          v("n_variants") < thresholdMinNVariants,
          StudyFlags.SmallNumberOfSnps))
  }
}
