package graft.sources

import graft.operators.StudyIndexOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Study-index ingestion flows: FinnGen, FinnGen-UKB meta-analysis and
  * UK Biobank manifests → the engine's study-index shape, plus the
  * FinnGen EFO curation join.
  *
  * Mirrors the reference's datasource parsers
  * (reference: src/gentropy/datasource/finngen/study_index.py:83-189,
  * src/gentropy/datasource/finngen_ukb_meta/study_index.py:15-89,
  * src/gentropy/datasource/ukbiobank/study_index.py:14-110). Network
  * fetches in the reference (phenotype-table URL, EFO mapping URL)
  * become plain DataFrame inputs — ingestion stays declarative and
  * testable.
  */
object StudyIndexSources {

  /** FinnGen phenotype table → study index.
    * reference: src/gentropy/datasource/finngen/study_index.py:127-189 */
  def finngenStudyIndex(phenotypes: DataFrame,
                        releasePrefix: String = "FINNGEN_R11",
                        sumstatsUrlPrefix: String = "",
                        sumstatsUrlSuffix: String = "",
                        sampleSize: Int = 500348): DataFrame =
    phenotypes.select(
      concat_ws("_", lit(releasePrefix), col("phenocode")).as("studyId"),
      col("phenostring").as("traitFromSource"),
      col("num_cases").cast("int").as("nCases"),
      col("num_controls").cast("int").as("nControls"),
      (col("num_cases") + col("num_controls")).cast("int").as("nSamples"),
      lit(releasePrefix).as("projectId"),
      lit("gwas").as("studyType"),
      lit(true).as("hasSumstats"),
      lit("500,348 (282,064 females and 218,284 males)")
        .as("initialSampleSize"),
      array(struct(lit(sampleSize).cast("int").as("sampleSize"),
        lit("Finnish").as("ancestry"))).as("discoverySamples"),
      array(lit("FinnGen")).as("cohorts"),
      concat(lit(sumstatsUrlPrefix), col("phenocode"),
        lit(sumstatsUrlSuffix)).as("summarystatsLocation"))
      .withColumn("ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples")))

  /** Join the FinnGen EFO curation: EFO ids aggregated per study, all
    * studies preserved (missing mappings surface in validation).
    * reference: src/gentropy/datasource/finngen/study_index.py:83-125 */
  def joinEfoMapping(studyIndex: DataFrame, efoCuration: DataFrame,
                     finngenRelease: String = "R11"): DataFrame = {
    val mappings = efoCuration
      .withColumn("STUDY", upper(col("STUDY")))
      .filter(col("STUDY").contains("FINNGEN"))
      .filter(col("STUDY").contains(finngenRelease.toUpperCase))
      .select(
        regexp_replace(col("SEMANTIC_TAG"), "^.*/", "")
          .as("traitFromSourceMappedId"),
        col("PROPERTY_VALUE").as("traitFromSource"))
    val joined = studyIndex.join(mappings, Seq("traitFromSource"), "left_outer")
    val commonCols = joined.columns.filterNot(_ == "traitFromSourceMappedId")
    joined
      .groupBy(commonCols.map(col).toSeq: _*)
      .agg(collect_list(col("traitFromSourceMappedId"))
        .as("traitFromSourceMappedIds"))
  }

  /** FinnGen + UKB meta-analysis manifest → study index.
    * reference: src/gentropy/datasource/finngen_ukb_meta/study_index.py:15-89 */
  def finngenUkbMetaStudyIndex(manifest: DataFrame,
                               efoCuration: Option[DataFrame] = None): DataFrame = {
    val si = manifest.select(
      lit("gwas").as("studyType"),
      lit("FINNGEN_R11_UKB_META").as("projectId"),
      col("_gentropy_study_id").as("studyId"),
      col("name").as("traitFromSource"),
      lit(true).as("hasSumstats"),
      col("_gentropy_summary_stats_link").as("summarystatsLocation"),
      (col("fg_n_cases") + col("ukbb_n_cases") + col("fg_n_controls") +
        col("ukbb_n_controls")).cast("int").as("nSamples"),
      array(
        struct((col("fg_n_cases") + col("fg_n_controls")).cast("int")
          .as("sampleSize"), lit("Finnish").as("ancestry")),
        struct((col("ukbb_n_cases") + col("ukbb_n_controls")).cast("int")
          .as("sampleSize"), lit("European").as("ancestry")))
        .as("discoverySamples"))
      .withColumn("ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples")))
    efoCuration.map(joinEfoMapping(si, _, "R11")).getOrElse(si)
  }

  /** UKB PPP (EUR) pQTL manifest → study index; nSamples peeked from
    * the sumstats (chr22 first-N per study, as the reference does).
    * reference: src/gentropy/datasource/ukb_ppp_eur/study_index.py:14-77 */
  def ukbPppEurStudyIndex(manifest: DataFrame, sumstats: DataFrame): DataFrame = {
    val nSamples = sumstats
      .filter(col("chromosome") === "22")
      .groupBy("studyId")
      .agg(first(col("N")).cast("int").as("nSamples"))
    manifest.select(
      lit("pqtl").as("studyType"),
      lit("UKB_PPP_EUR").as("projectId"),
      col("_gentropy_study_id").as("studyId"),
      col("UKBPPP_ProteinID").as("traitFromSource"),
      lit("UBERON_0001969").as("biosampleFromSourceId"),
      col("ensembl_id").as("geneId"),
      lit(true).as("hasSumstats"),
      col("_gentropy_summary_stats_link").as("summarystatsLocation"))
      .join(nSamples, Seq("studyId"))
      .withColumn("discoverySamples",
        array(struct(col("nSamples").cast("int").as("sampleSize"),
          lit("European").as("ancestry"))))
      .withColumn("ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples")))
  }

  /** UK Biobank manifest (SAIGE + Neale round 2) → study index.
    * reference: src/gentropy/datasource/ukbiobank/study_index.py:36-110 */
  def ukBiobankStudyIndex(manifest: DataFrame): DataFrame =
    manifest.select(
      col("code").as("studyId"),
      lit("UKBiobank").as("projectId"),
      lit("gwas").as("studyType"),
      col("trait").as("traitFromSource"),
      when(col("code").startsWith("SAIGE_"), "30104761").as("pubmedId"),
      when(col("code").startsWith("SAIGE_"),
        "Efficiently controlling for case-control imbalance and sample " +
          "relatedness in large-scale genetic association studies")
        .as("publicationTitle"),
      when(col("code").startsWith("SAIGE_"), "Wei Zhou")
        .as("publicationFirstAuthor"),
      when(col("code").startsWith("NEALE2_"), "2018-08-01")
        .otherwise("2018-10-24").as("publicationDate"),
      when(col("code").startsWith("SAIGE_"), "Nature Genetics")
        .as("publicationJournal"),
      col("n_total").cast("string").as("initialSampleSize"),
      col("n_cases").cast("int").as("nCases"),
      array(struct(col("n_total").cast("int").as("sampleSize"),
        concat(lit("European="), col("n_total")).as("ancestry")))
        .as("discoverySamples"),
      col("in_path").as("summarystatsLocation"),
      lit(true).as("hasSumstats"))
      .withColumn("traitFromSource",
        when(col("traitFromSource").contains(":"),
          concat(
            initcap(get(split(col("traitFromSource"), ": "), lit(1))),
            lit(" | "),
            lower(get(split(col("traitFromSource"), ": "), lit(0)))))
          .otherwise(col("traitFromSource")))
      .withColumn("ldPopulationStructure",
        StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples")))
}
