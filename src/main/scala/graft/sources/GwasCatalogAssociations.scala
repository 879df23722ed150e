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

  // ----------------------------------------------- rsID→GnomAD mapping

  /** All rsIDs curated for an association: the first SNPS token, the
    * numeric SNP_ID_CURRENT (rs-prefixed when it is a bare number) and
    * the rs part of the strongest risk allele, deduplicated.
    * reference: associations.py:172-194 */
  def collectRsids(snpId: Column, snpIdCurrent: Column,
                   riskAllele: Column): Column = {
    val current = when(snpIdCurrent.rlike("^[0-9]*$"),
      format_string("rs%s", snpIdCurrent))
    val fromRisk = split(riskAllele, "-").getItem(0)
    array_distinct(array(snpId, current, fromRisk))
  }

  /** GnomAD→Ensembl position shift for indels (+1 when either allele
    * is longer than one base). reference: associations.py:35-66 */
  def convertGnomadPositionToEnsembl(position: Column, reference: Column,
                                     alternate: Column): Column =
    when(length(reference) > 1 || length(alternate) > 1, position + 1)
      .otherwise(position)

  /** Strict rsID comparison used inside the mapping flow: true only
    * when the two lists intersect. reference: associations.py:301-338 */
  def compareRsids(gnomadRsids: Column, gwasRsids: Column): Column =
    when(size(array_intersect(gnomadRsids, gwasRsids)) > 0, lit(true))
      .otherwise(lit(false))

  /** Keep a candidate mapping unless a better (true-flagged) mapping
    * exists for the same association: false only for false-flagged
    * rows of associations that also have a true-flagged row.
    * reference: associations.py:340-383 */
  def flagMappingsToRetain(associationId: Column, filterColumn: Column): Column = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(associationId)
    // any-true as a numeric window max, NOT collect_set+array_contains:
    // the set variant is a non-codegen ObjectAggregate building a per-
    // frame array only to probe it for `true` — measured 14.8 CPU-s on
    // the mapping query's window stage, most of it here; the max
    // collapses into the same Window operator as the sibling flag
    val anyTrue = max(when(filterColumn, 1).otherwise(0)).over(w) === 1
    when(anyTrue && !filterColumn, false).otherwise(true)
  }

  /** Risk allele concordant with ref or alt (directly or by reverse
    * complement); '?' risk alleles and unmapped variants pass.
    * reference: associations.py:385-455 */
  def checkConcordance(riskAllele: Column, referenceAllele: Column,
                       alternateAllele: Column): Column = {
    val revComp = when(riskAllele.rlike("^[ACTG]+$"),
      reverse(translate(riskAllele, "ACTG", "TGAC"))).otherwise(riskAllele)
    when(riskAllele === referenceAllele || riskAllele === alternateAllele, true)
      .when(revComp === referenceAllele || revComp === alternateAllele, true)
      .when(riskAllele === "?", true)
      .when(referenceAllele.isNull, true)
      .otherwise(false)
  }

  /** Maximum minor allele frequency over the population frequency
    * array (biallelic assumption).
    * reference: src/gentropy/dataset/variant_index.py:205-224 */
  def maxMaf(alleleFrequencies: Column): Column =
    array_max(transform(alleleFrequencies,
      af => when(af.getField("alleleFrequency") > 0.5,
        lit(1.0) - af.getField("alleleFrequency"))
        .otherwise(af.getField("alleleFrequency"))))

  /** Resolve curated associations to GnomAD variants: candidate join on
    * (chromosome, ensemblPosition), rsID + allele-concordance scoring
    * with the retain-flag window, then the highest-maxMaf candidate per
    * association. reference: associations.py:196-301.
    *
    * `gwasAssociations` carries the raw columns rowId, CHR_ID, CHR_POS,
    * SNPS, SNP_ID_CURRENT, `STRONGEST SNP-RISK ALLELE`; `variantIndex`
    * carries variantId, chromosome, position, referenceAllele,
    * alternateAllele, rsIds, alleleFrequencies.
    *
    * Scale shape: the variant index (GnomAD, ~10⁹ rows) is pre-pruned
    * by an inner join against the DISTINCT association positions — a
    * small, broadcastable set — so the expensive side never leaves the
    * scan with more than the candidate rows; the retain-flag windows
    * and the max-maf top-1 all share the rowId shuffle key. */
  def mapVariantsToGnomadVariants(gwasAssociations: DataFrame,
                                  variantIndex: DataFrame): DataFrame = {
    val gwasSubset = gwasAssociations.select(
      col("rowId"),
      col("CHR_ID").as("chromosome"),
      col("CHR_POS").cast("int").as("ensemblPosition"),
      collectRsids(
        split(col("SNPS"), "; ").getItem(0),
        col("SNP_ID_CURRENT"),
        split(col("STRONGEST SNP-RISK ALLELE"), "; ").getItem(0))
        .as("rsIdsGwasCatalog"),
      extractRiskAllele(col("STRONGEST SNP-RISK ALLELE")).as("riskAllele"))

    val vaSubset = variantIndex
      .select(
        col("variantId"), col("chromosome"),
        convertGnomadPositionToEnsembl(col("position"),
          col("referenceAllele"), col("alternateAllele"))
          .as("ensemblPosition"),
        col("position"),
        col("rsIds").as("rsIdsGnomad"),
        col("referenceAllele"), col("alternateAllele"),
        maxMaf(col("alleleFrequencies")).as("maxMaf"))
      .join(broadcast(gwasSubset.select("chromosome", "ensemblPosition").distinct()),
        Seq("chromosome", "ensemblPosition"), "inner")

    val filtered = gwasSubset
      .join(vaSubset, Seq("chromosome", "ensemblPosition"), "left")
      .withColumn("rsIdFilter",
        flagMappingsToRetain(col("rowId"),
          compareRsids(col("rsIdsGnomad"), col("rsIdsGwasCatalog"))))
      .withColumn("concordanceFilter",
        flagMappingsToRetain(col("rowId"),
          checkConcordance(col("riskAllele"), col("referenceAllele"),
            col("alternateAllele"))))
      .filter(col("rsIdFilter") || col("concordanceFilter"))

    val w = org.apache.spark.sql.expressions.Window.partitionBy("rowId")
      .orderBy(col("maxMaf").desc_nulls_last)
    val fullyMapped = filtered
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select("rowId", "variantId", "referenceAllele", "alternateAllele",
        "chromosome", "position")

    gwasAssociations.join(fullyMapped, Seq("rowId"), "left")
  }

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
