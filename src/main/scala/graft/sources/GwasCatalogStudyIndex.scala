package graft.sources

import graft.functions.ColumnFns
import graft.operators.StudyIndexOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}

/** GWAS Catalog study-index ingestion: raw study + ancestry tables →
  * harmonised study index, with curation annotation, multi-trait study
  * splitting and inclusion filtering.
  *
  * Mirrors the reference
  * (reference: src/gentropy/datasource/gwas_catalog/study_index.py:20-682,
  * study_splitter.py:17-138, study_index_ot_curation.py:19-90,
  * src/gentropy/gwas_catalog_study_curation.py:1-68).
  */
object GwasCatalogStudyIndex {

  val SumstatsNotAvailableFlag = "No summary statistics available"
  val NoOtCurationFlag = "Study not curated by Open Targets"

  private val sampleSchema = ArrayType(StructType(Seq(
    StructField("ancestry", StringType, nullable = true),
    StructField("sampleSize", IntegerType, nullable = true))))

  /** EFO ids from a comma-separated URI list, sorted.
    * reference: src/gentropy/common/utils.py:231-256 */
  def parseEfos(efoUri: Column): Column =
    when(efoUri.isNotNull,
      array_sort(transform(split(efoUri, ","),
        uri => regexp_extract(uri, "([A-Z]+_[0-9]+)", 1))))

  /** Unique cohort labels from a pipe-separated list.
    * reference: study_index.py:206-231 */
  def parseCohorts(rawCohort: Column): Column =
    when(rawCohort.isNotNull && rawCohort =!= "",
      array_distinct(split(rawCohort, "\\|")))

  /** Parse curated discovery samples: comma-joined multi-ancestry
    * labels are split with the sample count divided evenly, then
    * counts are summed per unique ancestry label.
    * reference: study_index.py:36-137 */
  def parseDiscoverySamples(discoverySamples: Column): Column = {
    // "European, African" → [European, African]; commas inside
    // parentheses are kept (the reference's lookahead regex)
    val explodedAncestries = transform(discoverySamples,
      sample => split(sample.getField("ancestry"), ",\\s(?![^()]*\\))"))
    val uniqueAncestries = transform(
      aggregate(explodedAncestries,
        array().cast(ArrayType(StringType)),
        (acc, x) => array_union(acc, x),
        acc => array_distinct(acc)),
      a => struct(a.as("ancestry"), lit(0).as("sampleSize")))
    val resolvedCounts = transform(
      arrays_zip(
        transform(explodedAncestries, pop => size(pop)).as("popSize"),
        transform(discoverySamples, s => s.getField("sampleSize"))
          .as("popCount")),
      p => (p.getField("popCount") / p.getField("popSize")).cast(IntegerType))
    val parsed = aggregate(
      transform(
        arrays_zip(explodedAncestries.as("ancestries"),
          resolvedCounts.as("sampleCount")),
        grp => transform(grp.getField("ancestries"),
          a => struct(a.as("ancestry"),
            grp.getField("sampleCount").as("sampleSize")))),
      array().cast(sampleSchema),
      (acc, x) => array_union(acc, x))
    // fold the flattened counts onto the unique-ancestry skeleton
    aggregate(parsed, uniqueAncestries, (merged, anc) =>
      transform(merged, a =>
        when(a.getField("ancestry") === anc.getField("ancestry"),
          struct(a.getField("ancestry").as("ancestry"),
            (a.getField("sampleSize") + anc.getField("sampleSize"))
              .cast(IntegerType).as("sampleSize")))
          .otherwise(a)))
  }

  /** Harmonise the raw GWAS Catalog study table.
    * reference: study_index.py:232-267 */
  def parseStudyTable(catalogStudies: DataFrame): DataFrame =
    catalogStudies.select(
      coalesce(col("STUDY ACCESSION"), monotonically_increasing_id()
        .cast("string")).as("studyId"),
      lit("GCST").as("projectId"),
      lit("gwas").as("studyType"),
      col("PUBMED ID").as("pubmedId"),
      col("FIRST AUTHOR").as("publicationFirstAuthor"),
      col("DATE").as("publicationDate"),
      col("JOURNAL").as("publicationJournal"),
      col("STUDY").as("publicationTitle"),
      coalesce(col("DISEASE/TRAIT"), lit("Unreported")).as("traitFromSource"),
      col("INITIAL SAMPLE SIZE").as("initialSampleSize"),
      parseEfos(col("MAPPED_TRAIT_URI")).as("traitFromSourceMappedIds"),
      parseEfos(col("MAPPED BACKGROUND TRAIT URI"))
        .as("backgroundTraitFromSourceMappedIds"),
      parseCohorts(col("COHORT")).as("cohorts"))

  /** Annotate ancestry composition from the GWAS Catalog ancestry
    * table: per-stage pivot, curated discovery-sample parse, LD
    * population mapping. reference: study_index.py:468-588 */
  def annotateAncestries(studies: DataFrame, ancestryLut: DataFrame): DataFrame = {
    val ancestry = ColumnFns.camelCaseColumns(ancestryLut)
      .withColumnRenamed("studyAccession", "studyId")
    val stages = ancestry
      .groupBy("studyId")
      .pivot("stage", Seq("initial", "replication"))
      .agg(collect_set(struct(
        col("broadAncestralCategory").as("ancestry"),
        col("numberOfIndividuals").cast(IntegerType).as("sampleSize"))))
      .withColumn("discoverySamples",
        parseDiscoverySamples(col("initial")))
      .withColumnRenamed("replication", "replicationSamples")
      .withColumn("ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples")))
      .drop("initial")
    studies.join(
      stages.select("studyId", "discoverySamples", "ldPopulationStructure",
        "replicationSamples"),
      Seq("studyId"), "left")
  }

  /** Case/control/sample counts from the curated free-text sample
    * description. reference: study_index.py:589-633 */
  def annotateDiscoverySampleSizes(studies: DataFrame): DataFrame = {
    val lut = studies
      .select(col("studyId"),
        explode_outer(split(col("initialSampleSize"), ",\\s+")).as("samples"))
      // nullif guard: fragments without digits extract to "" which an
      // ANSI cast would throw on (the reference runs non-ANSI and
      // silently nulls)
      .withColumn("sampleSize",
        nullif(regexp_extract(regexp_replace(col("samples"), ",", ""),
          "[0-9]+", 0), lit("")).cast(IntegerType))
      .select(col("studyId"), col("sampleSize"),
        when(col("samples").contains("cases"), col("sampleSize"))
          .otherwise(0).as("nCases"),
        when(col("samples").contains("controls"), col("sampleSize"))
          .otherwise(0).as("nControls"))
      .groupBy("studyId")
      .agg(sum("nCases").cast("int").as("nCases"),
        sum("nControls").cast("int").as("nControls"),
        sum("sampleSize").cast("int").as("nSamples"))
    studies.join(lut, Seq("studyId"), "left")
  }

  /** Full ingestion: study table + ancestry table.
    * reference: study_index.py:269-291 */
  def fromSource(catalogStudies: DataFrame, ancestryLut: DataFrame): DataFrame =
    annotateDiscoverySampleSizes(
      annotateAncestries(parseStudyTable(catalogStudies), ancestryLut))

  /** Overwrite study id / trait / EFOs from a split annotation.
    * reference: study_index.py:298-340 */
  def updateStudyId(studies: DataFrame, annotation: DataFrame): DataFrame =
    studies
      .join(annotation.select(
        col("studyId"), col("updatedStudyId"),
        col("traitFromSource").as("_updTrait"),
        col("traitFromSourceMappedIds").as("_updEfos")),
        Seq("studyId"), "left")
      .withColumn("studyId", coalesce(col("updatedStudyId"), col("studyId")))
      .withColumn("traitFromSource",
        coalesce(col("_updTrait"), col("traitFromSource")))
      .withColumn("traitFromSourceMappedIds",
        coalesce(col("_updEfos"), col("traitFromSourceMappedIds")))
      .drop("updatedStudyId", "_updTrait", "_updEfos")

  /** Annotate the study index from the curation table: study types
    * corrected, analysis flags unioned, non-curated sumstats studies
    * flagged. reference: study_index.py:342-407 */
  def annotateFromStudyCuration(studies0: DataFrame,
                                curation: Option[DataFrame]): DataFrame =
    curation match {
      case None => studies0
      case Some(cur) =>
        var studies = studies0
        if (!studies.columns.contains("qualityControls"))
          studies = studies.withColumn("qualityControls",
            array().cast(ArrayType(StringType)))
        if (!studies.columns.contains("analysisFlags"))
          studies = studies.withColumn("analysisFlags",
            array().cast(ArrayType(StringType)))
        val prefixed = ColumnFns.prefixColumns(cur, "curation_",
          except = Seq("studyId")).withColumn("isCurated", lit(true))
        studies
          .join(prefixed, Seq("studyId"), "left")
          .withColumn("isCurated", coalesce(col("isCurated"), lit(false)))
          .withColumn("studyType",
            coalesce(col("curation_studyType"), col("studyType")))
          .withColumn("analysisFlags",
            coalesce(array_union(col("analysisFlags"),
              col("curation_analysisFlags")),
              array().cast(ArrayType(StringType))))
          .withColumn("qualityControls",
            when(!col("isCurated"),
              array_union(col("qualityControls"), array(lit(NoOtCurationFlag))))
              .otherwise(col("qualityControls")))
          .select(studies.columns.map(col).toSeq: _*)
    }

  /** Curation worksheet: sumstats studies with any existing curation
    * propagated, flattened for TSV round-tripping.
    * reference: study_index.py:408-467,
    * src/gentropy/gwas_catalog_study_curation.py:1-68 */
  def extractStudiesForCuration(studies: DataFrame,
                                curation: Option[DataFrame]): DataFrame =
    curation match {
      case None =>
        studies.filter(col("hasSumstats"))
          .withColumn("studyType", lit(null).cast(StringType))
          .withColumn("analysisFlag", lit(null).cast(StringType))
          .withColumn("qualityControl", lit(null).cast(StringType))
          .withColumn("isCurated", lit("false"))
      case Some(cur) =>
        val prefixed = ColumnFns.prefixColumns(cur, "curation_",
          except = Seq("studyId"))
        studies.filter(col("hasSumstats"))
          .join(prefixed, Seq("studyId"), "left")
          .select(
            col("studyId"),
            col("curation_studyType").as("studyType"),
            array_join(col("curation_analysisFlags"), "|").as("analysisFlag"),
            array_join(col("curation_qualityControls"), "|")
              .as("qualityControl"),
            coalesce(col("curation_isCurated"), lit(false)).cast(StringType)
              .as("isCurated"),
            col("pubmedId"), col("publicationTitle"), col("traitFromSource"))
    }

  /** Parse a flattened OT curation table (pipe-joined flags back to
    * arrays). reference: study_index_ot_curation.py:26-54 */
  def parseOtCuration(df0: DataFrame): DataFrame = {
    val df =
      if (df0.columns.contains("qualityControl")) df0
      else df0.withColumn("qualityControl", lit(null).cast(StringType))
    df.select(
      col("studyId"), col("studyType"),
      when(col("analysisFlag").isNotNull, split(col("analysisFlag"), "\\|"))
        .otherwise(array().cast(ArrayType(StringType))).as("analysisFlags"),
      when(col("qualityControl").isNotNull,
        split(col("qualityControl"), "\\|"))
        .otherwise(array().cast(ArrayType(StringType))).as("qualityControls"),
      col("isCurated").cast("boolean").as("isCurated"))
  }

  /** Keep only studies on the inclusion list.
    * reference: study_index.py:634-649 */
  def applyInclusionList(studies: DataFrame, inclusion: DataFrame): DataFrame =
    studies.join(inclusion, Seq("studyId"), "inner")

  /** GWAS Catalog accession from a sumstats path (last GCST token).
    * reference: study_index.py:663-682 */
  def parseGwasCatalogStudyId(sumstatsPathCol: String): Column = {
    val accessions = expr(
      s"regexp_extract_all(`$sumstatsPathCol`, '(GCST\\\\d+)')")
    when(size(accessions) > 0, element_at(accessions, size(accessions)))
  }

  // ------------------------------------------------ multi-trait split

  /** Trait name resolution for sub-studies.
    * reference: study_splitter.py:21-52 */
  def resolveTrait(studyTrait: Column, associationTrait: Column,
                   pValueText: Column): Column =
    when(pValueText.isNotNull && pValueText =!= "no_pvalue_text",
      concat(associationTrait, lit(" ["), pValueText, lit("]")))
      .when(associationTrait.isNotNull, associationTrait)
      .otherwise(studyTrait)

  /** EFO resolution for sub-studies. reference: study_splitter.py:52-64 */
  def resolveEfo(associationEfo: Column, studyEfo: Column): Column =
    coalesce(split(associationEfo, "/"), studyEfo)

  /** Sub-study id: `studyId_rank` when a study has several sub-study
    * descriptions. reference: study_splitter.py:65-82 */
  def resolveStudyId(studyId: Column, subStudyDescription: Column): Column = {
    val w = Window.partitionBy(studyId).orderBy(subStudyDescription)
    val rn = dense_rank().over(w)
    val n = approx_count_distinct(rn).over(w)
    when(n === 1, studyId).otherwise(concat_ws("_", studyId, rn))
  }

  /** Split multi-trait studies using association sub-study
    * descriptions; returns the split annotation to apply with
    * [[updateStudyId]] on both studies and associations.
    * reference: study_splitter.py:83-138 */
  def splitAnnotation(studies: DataFrame, associations: DataFrame): DataFrame =
    associations
      .join(broadcast(studies), Seq("studyId"))
      .select(
        col("studyId"),
        col("subStudyDescription"),
        resolveStudyId(col("studyId"), col("subStudyDescription"))
          .as("updatedStudyId"),
        resolveTrait(col("traitFromSource"),
          get(split(col("subStudyDescription"), "\\|"), lit(0)),
          get(split(col("subStudyDescription"), "\\|"), lit(1)))
          .as("traitFromSource"),
        resolveEfo(get(split(col("subStudyDescription"), "\\|"), lit(2)),
          col("traitFromSourceMappedIds")).as("traitFromSourceMappedIds"))
      .distinct()
}
