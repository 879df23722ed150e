package graft.sources

import graft.functions.{ArrayFns, PValues}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GWAS Catalog curated top-hit associations: allele harmonisation and
  * QC flagging against GnomAD variant mapping.
  *
  * Covers the core of the reference's largest curation module
  * (reference: src/gentropy/datasource/gwas_catalog/associations.py:
  * 31-1168): risk-allele extraction, reverse complement, palindromic
  * detection, beta/odds-ratio harmonisation with direction flipping,
  * rsID concordance scoring, and the QC flag battery.
  */
object GwasCatalogAssociations {

  object Flags {
    val SubSignificant = "Subsignificant p-value"
    val NoGenomicLocation = "Incomplete genomic mapping"
    val CompositeFlag = "Composite association"
    val VariantInconsistency = "Variant inconsistency"
    val NoMappedVariant = "No mapping in GnomAd"
    val PalindromicAlleles = "Palindrome alleles - cannot harmonize"
  }

  /** Reverse complement for DNA strings; non-DNA passes through.
    * reference: associations.py:456-491 */
  def reverseComplement(allele: Column): Column = {
    val up = upper(allele)
    when(up.rlike("[ACTG]+"), reverse(translate(up, "ACTG", "TGAC")))
      .otherwise(up)
  }

  /** Risk allele from "rsXX-A" style annotation.
    * reference: associations.py:143-170 */
  def extractRiskAllele(riskAllele: Column): Column = {
    val a = upper(trim(split(riskAllele, "-").getItem(1)))
    when(a.rlike("^[ACTG]+$"), a)
  }

  /** Effect direction matches the reference allele (directly or via
    * reverse complement) → harmonisation needed.
    * reference: associations.py:494-527 */
  def effectNeedsHarmonisation(riskAllele: Column, referenceAllele: Column): Column =
    (riskAllele === referenceAllele) ||
      (riskAllele === reverseComplement(referenceAllele))

  /** Palindromic ref/alt pair (ref equals revcomp of alt).
    * reference: associations.py:529-566 */
  def areAllelesPalindromic(referenceAllele: Column, alternateAllele: Column): Column =
    coalesce(referenceAllele === reverseComplement(alternateAllele), lit(false))

  /** Beta harmonised to the alternate allele, with "increase"/
    * "decrease" confidence-interval direction text.
    * reference: associations.py:567-627 */
  def harmoniseBeta(effectSize: Column, ciText: Column,
                    flippingNeeded: Column): Column =
    when((flippingNeeded && ciText.contains("increase")) ||
      (!flippingNeeded && ciText.contains("decrease")), -effectSize)
      .otherwise(effectSize)
      .cast("double")

  /** Odds ratio, reciprocal when flipped; zero OR cannot flip.
    * reference: associations.py:628-668 */
  def harmoniseOddsRatio(effectSize: Column, flippingNeeded: Column): Column =
    when(effectSize.cast("double") === 0 && flippingNeeded, lit(null))
      .when(flippingNeeded, lit(1.0) / effectSize)
      .otherwise(effectSize)
      .cast("double")

  /** Beta-flavoured effect when CI text carries a direction, else OR
    * mapped to beta; flip decided by allele match.
    * reference: associations.py:919-1085 */
  def harmoniseEffect(riskAllele: Column, referenceAllele: Column,
                      alternateAllele: Column, effectSize: Column,
                      ciText: Column): Seq[Column] = {
    val flip = effectNeedsHarmonisation(riskAllele, referenceAllele)
    val isBeta = ciText.contains("increase") || ciText.contains("decrease")
    val palindromic = areAllelesPalindromic(referenceAllele, alternateAllele)
    val beta = when(!palindromic && isBeta,
      harmoniseBeta(effectSize, ciText, flip))
    val oddsRatio = when(!palindromic && !isBeta,
      harmoniseOddsRatio(effectSize, flip))
    PValues.convertOddsRatioToBeta(beta, oddsRatio, lit(null).cast("double"))
  }

  /** rsID concordance between the curated association and a mapped
    * GnomAD variant: concordant when either list is empty or they
    * intersect. reference: associations.py:303-336 */
  def rsidsMatch(gnomadRsids: Column, gwasRsids: Column): Column =
    when(size(coalesce(gnomadRsids, array())) === 0, lit(true))
      .when(size(coalesce(gwasRsids, array())) === 0, lit(true))
      .otherwise(arrays_overlap(gnomadRsids, gwasRsids))

  // ------------------------------------------------------------- QC flags

  /** Sub-significance flag (p > threshold). */
  def qcSubSignificant(qc: Column, mantissa: Column, exponent: Column,
                       threshold: Double = 5e-8): Column =
    ArrayFns.updateQualityFlag(qc,
      !PValues.significanceFilter(mantissa, exponent, threshold),
      Flags.SubSignificant)

  /** Missing genomic location flag. */
  def qcGenomicLocation(qc: Column, chromosome: Column, position: Column): Column =
    ArrayFns.updateQualityFlag(qc,
      chromosome.isNull || position.isNull, Flags.NoGenomicLocation)

  /** Composite (multi-variant interaction) association flag:
    * a ';' or 'x' separated variant list. */
  def qcCompositeAssociation(qc: Column, snpIds: Column): Column =
    ArrayFns.updateQualityFlag(qc,
      snpIds.rlike("[;x×]"), Flags.CompositeFlag)

  /** Unmapped variant flag. */
  def qcUnmappedVariant(qc: Column, alternateAllele: Column): Column =
    ArrayFns.updateQualityFlag(qc, alternateAllele.isNull,
      Flags.NoMappedVariant)

  /** Palindromic alleles flag. */
  def qcPalindromic(qc: Column, referenceAllele: Column,
                    alternateAllele: Column): Column =
    ArrayFns.updateQualityFlag(qc,
      areAllelesPalindromic(referenceAllele, alternateAllele),
      Flags.PalindromicAlleles)

  /** Apply the full flag battery to a harmonised association frame. */
  def qcAll(df: DataFrame, pThreshold: Double = 5e-8): DataFrame =
    df.withColumn("qualityControls",
        coalesce(col("qualityControls"), array().cast("array<string>")))
      .withColumn("qualityControls",
        qcSubSignificant(col("qualityControls"), col("pValueMantissa"),
          col("pValueExponent"), pThreshold))
      .withColumn("qualityControls",
        qcGenomicLocation(col("qualityControls"), col("chromosome"),
          col("position")))
      .withColumn("qualityControls",
        qcUnmappedVariant(col("qualityControls"), col("alternateAllele")))
      .withColumn("qualityControls",
        qcPalindromic(col("qualityControls"), col("referenceAllele"),
          col("alternateAllele")))
}
