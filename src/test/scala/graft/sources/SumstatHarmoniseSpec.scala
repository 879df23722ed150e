package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Full sumstats harmonisation (reference: common/harmonise.py). */
class SumstatHarmoniseSpec extends SparkSpec {
  import spark.implicits._

  private def annotation = Seq(
    ("1", 100, "A", "G", "1_100_A_G"),
    ("1", 200, "C", "T", "1_200_C_T"),
    ("1", 300, "A", "T", "1_300_A_T"),  // complementary SNP
    ("X", 400, "G", "A", "X_400_G_A"))
    .toDF("chromosome", "position", "referenceAllele", "alternateAllele",
      "variantId")

  test("UKB PPP flavour: filters, orientation flip, schema projection") {
    val raw = Seq(
      // direct match, good INFO/MAF
      ("1", 100L, "A", "G", 0.3, 0.9, 0.5, 0.1, 7.0, 1000),
      // flipped match (T/C vs annotation C/T): beta and EAF flip
      ("1", 200L, "T", "C", 0.2, 0.9, -0.4, 0.1, 9.0, 1000),
      // complementary SNP in flipped orientation (T/A vs A/T): dropped
      ("1", 300L, "T", "A", 0.2, 0.9, 0.3, 0.1, 9.0, 1000),
      // low INFO: dropped
      ("1", 100L, "A", "G", 0.3, 0.5, 0.5, 0.1, 7.0, 1000),
      // low MAF: dropped
      ("1", 100L, "A", "G", 0.00005, 0.9, 0.5, 0.1, 7.0, 1000),
      // chromosome 23 renamed to X, direct match
      ("23", 400L, "G", "A", 0.3, 0.9, 0.2, 0.1, 5.0, 1000))
      .toDF("chromosome", "GENPOS", "ALLELE0", "ALLELE1", "A1FREQ", "INFO",
        "BETA", "SE", "LOG10P", "N")
      .withColumn("studyId", lit("S1"))
    val out = PerChromosome.harmoniseSummaryStats(raw,
      PerChromosome.prepareVariantAnnotation(annotation),
      PerChromosome.SumstatColumns.UkbPppEur)
    val rows = out.collect().map(r =>
      r.getAs[String]("variantId") -> r).toMap
    assert(rows.keySet == Set("1_100_A_G", "1_200_C_T", "X_400_G_A"))
    assert(rows("1_100_A_G").getAs[Double]("beta") == 0.5)
    assert(rows("1_200_C_T").getAs[Double]("beta") == 0.4) // flipped
    assert(math.abs(rows("1_200_C_T")
      .getAs[Float]("effectAlleleFrequencyFromSource") - 0.8f) < 1e-6)
    assert(rows("X_400_G_A").getAs[String]("chromosome") == "X")
    assert(rows("1_100_A_G").getAs[Int]("sampleSize") == 1000)
    // -log10 p = 7 -> mantissa 1.0, exponent -7
    assert(rows("1_100_A_G").getAs[Int]("pValueExponent") == -7)
  }

  test("FinnGen-UKB-meta flavour: no INFO/MAF/N columns required") {
    val raw = Seq(("1", 100L, "A", "G", 0.5, 0.1, 7.0))
      .toDF("chromosome", "POS", "REF", "ALT", "all_inv_var_meta_beta",
        "all_inv_var_meta_sebeta", "all_inv_var_meta_mlogp")
      .withColumn("studyId", lit("S1"))
    val out = PerChromosome.harmoniseSummaryStats(raw,
      PerChromosome.prepareVariantAnnotation(annotation),
      PerChromosome.SumstatColumns.FinngenUkbMeta)
    val r = out.head
    assert(r.getAs[String]("variantId") == "1_100_A_G")
    assert(r.getAs[Double]("beta") == 0.5)
    assert(!out.columns.contains("sampleSize"))
  }

  test("UKB PPP EUR study index peeks nSamples from chr22 sumstats") {
    val manifest = Seq(("S1", "PROT1:X:1", "ENSG1", "http://s"))
      .toDF("_gentropy_study_id", "UKBPPP_ProteinID", "ensembl_id",
        "_gentropy_summary_stats_link")
    val ss = Seq(("S1", "22", 5000), ("S1", "1", 4000))
      .toDF("studyId", "chromosome", "N")
    val out = StudyIndexSources.ukbPppEurStudyIndex(manifest, ss).head
    assert(out.getAs[Int]("nSamples") == 5000)
    assert(out.getAs[String]("studyType") == "pqtl")
    assert(out.getAs[String]("biosampleFromSourceId") == "UBERON_0001969")
  }
}
