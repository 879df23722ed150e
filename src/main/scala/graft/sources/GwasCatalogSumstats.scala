package graft.sources

import graft.functions.PValues
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GWAS Catalog harmonised summary-statistics TSV reader.
  *
  * Handles both harmonisation pipeline eras by header-dependent column
  * resolution (`hm_`-prefixed vs legacy names), p-value parsing from
  * either `p_value` or `neg_log_10_p_value`, OR/HR→beta conversion,
  * and variantId construction
  * (reference: src/gentropy/datasource/gwas_catalog/summary_statistics.py:57-194).
  *
  * Scale note: the reference repartitions to a fixed 20; here the
  * range-partition count is a parameter and AQE coalescing handles
  * small files.
  */
object GwasCatalogSumstats {

  def fromHarmonizedFile(spark: SparkSession, path: String,
                         studyId: String, partitions: Int = 20): DataFrame = {
    val raw = spark.read.option("sep", "\t").option("header", "true").csv(path)
    val cols = raw.columns.toSet
    def pick(hm: String, legacy: String): Column =
      if (cols.contains(hm)) col(hm) else col(legacy)
    def opt(name: String): Column =
      if (cols.contains(name)) col(name) else lit(null)

    val chromosome = pick("hm_chrom", "chromosome").cast("string")
    val position = pick("hm_pos", "base_pair_location").cast("int")
    val refAllele = pick("hm_other_allele", "other_allele")
    val altAllele = pick("hm_effect_allele", "effect_allele")

    val pValue: Seq[Column] =
      if (cols.contains("p_value")) PValues.parsePValue(col("p_value"))
      else {
        val (m, e) = PValues.negLogToMantissaAndExponent(
          col("neg_log_10_p_value").cast("double"))
        Seq(m, e)
      }

    val beta =
      (if (cols.contains("hm_beta")) col("hm_beta") else opt("beta")).cast("double")
    val oddsRatio =
      (if (cols.contains("hm_odds_ratio")) col("hm_odds_ratio")
       else if (cols.contains("odds_ratio")) col("odds_ratio")
       else opt("hazard_ratio")).cast("double")
    val standardError = opt("standard_error").cast("double")

    raw
      .select(
        lit(studyId).as("studyId") +:
          concat_ws("_", chromosome, position, refAllele, altAllele)
            .as("variantId") +:
          chromosome.as("chromosome") +:
          position.as("position") +:
          pValue ++:
          PValues.convertOddsRatioToBeta(beta, oddsRatio, standardError) ++:
          Seq(
            opt("effect_allele_frequency").cast("float")
              .as("effectAlleleFrequencyFromSource"),
            opt("n").cast("int").as("sampleSize")): _*)
      .filter(col("position").isNotNull && col("beta") =!= 0)
      .repartitionByRange(partitions, col("chromosome"), col("position"))
      .sortWithinPartitions("chromosome", "position")
  }
}

/** FinnGen summary-statistics reader (gzipped TSV).
  * reference: src/gentropy/datasource/finngen/summary_stats.py:20-96 */
object FinnGenSumstats {

  def fromSource(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("sep", "\t").option("header", "true")
      .csv(path)
      .filter(col("pos").cast("int").isNotNull)
      .select(
        upper(regexp_extract(input_file_name(),
          "([^/]+?)(\\.tsv\\.gz|\\.gz|\\.tsv)", 1)).as("studyId") +:
          concat_ws("_", col("#chrom"), col("pos"), col("ref"), col("alt"))
            .as("variantId") +:
          col("#chrom").as("chromosome") +:
          col("pos").cast("int").as("position") +:
          PValues.parsePValue(col("pval")) ++:
          Seq(
            col("beta").cast("double").as("beta"),
            col("sebeta").cast("double").as("standardError"),
            col("af_alt").cast("float").as("effectAlleleFrequencyFromSource")): _*)
      .filter(col("beta") =!= 0)
      .repartitionByRange(30, col("chromosome"), col("position"))
      .sortWithinPartitions("chromosome", "position")
}
