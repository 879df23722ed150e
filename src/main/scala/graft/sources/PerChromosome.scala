package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-chromosome batch processing (S8/S9): harmonise summary
  * statistics against a pre-flipped variant annotation, one
  * chromosome at a time, with partitioned appends.
  *
  * Semantics match the reference
  * (reference: src/gentropy/common/per_chromosome.py:14-110): the
  * annotation table carries both allele orientations so harmonisation
  * becomes a plain equi-join; beta and allele frequency flip when the
  * matched orientation is reversed.
  */
object PerChromosome {

  /** Build direct+flipped allele keys from a variant annotation table
    * with (chromosome, position, referenceAllele, alternateAllele,
    * variantId). reference: src/gentropy/common/per_chromosome.py:14-66 */
  def prepareVariantAnnotation(annotation: DataFrame): DataFrame = {
    val direct = annotation.select(
      col("chromosome"), col("position"),
      col("referenceAllele").as("allele1"),
      col("alternateAllele").as("allele2"),
      col("variantId"), lit(1.0).as("direction"))
    val flipped = annotation.select(
      col("chromosome"), col("position"),
      col("alternateAllele").as("allele1"),
      col("referenceAllele").as("allele2"),
      col("variantId"), lit(-1.0).as("direction"))
    direct.unionByName(flipped)
  }

  /** Harmonise one chromosome's summary statistics against the
    * two-orientation annotation: equi-join on position+alleles, flip
    * beta/EAF when matched in the reverse orientation. */
  def harmoniseSumstats(sumstats: DataFrame, annotation2Way: DataFrame): DataFrame =
    sumstats
      .join(annotation2Way,
        Seq("chromosome", "position", "allele1", "allele2"), "inner")
      .withColumn("beta", col("beta") * col("direction"))
      .withColumn("effectAlleleFrequencyFromSource",
        when(col("direction") === -1.0,
          lit(1.0) - col("effectAlleleFrequencyFromSource"))
          .otherwise(col("effectAlleleFrequencyFromSource")))
      .drop("direction")

  /** Source column names of one raw-sumstats flavour. Presets mirror
    * the reference's per-datasource calls. */
  case class SumstatColumns(
      position: String, allele0: String, allele1: String,
      beta: String, se: String, mlog10p: String,
      a1freq: Option[String] = None, info: Option[String] = None,
      n: Option[String] = None)

  object SumstatColumns {
    /** reference: src/gentropy/datasource/ukb_ppp_eur/summary_stats.py:39-52 */
    val UkbPppEur: SumstatColumns = SumstatColumns(
      position = "GENPOS", allele0 = "ALLELE0", allele1 = "ALLELE1",
      beta = "BETA", se = "SE", mlog10p = "LOG10P",
      a1freq = Some("A1FREQ"), info = Some("INFO"), n = Some("N"))
    /** reference: src/gentropy/datasource/finngen_ukb_meta/summary_stats.py:41-54 */
    val FinngenUkbMeta: SumstatColumns = SumstatColumns(
      position = "POS", allele0 = "REF", allele1 = "ALT",
      beta = "all_inv_var_meta_beta", se = "all_inv_var_meta_sebeta",
      mlog10p = "all_inv_var_meta_mlogp")
  }

  /** Full harmonisation of one raw-sumstats flavour against the
    * two-orientation annotation: chr23→X, INFO/MAF filters, variant
    * typing, orientation join with beta/EAF flip, complementary-SNP
    * flip drop, −log10 p → (mantissa, exponent) and the final
    * schema projection.
    * reference: src/gentropy/common/harmonise.py:10-191. The
    * annotation is [[prepareVariantAnnotation]] output. */
  def harmoniseSummaryStats(raw0: DataFrame, annotation2Way: DataFrame,
                            cols: SumstatColumns): DataFrame = {
    var df = raw0.withColumn("chromosome",
      when(col("chromosome") === "23", "X").otherwise(col("chromosome")))
    cols.info.foreach(c => df = df.filter(col(c) >= 0.8))
    cols.a1freq.foreach { c =>
      df = df
        .withColumn("_maf", when(col(c) < 0.5, col(c)).otherwise(lit(1) - col(c)))
        .filter(col("_maf") >= 0.0001)
        .drop("_maf")
    }
    val a0 = col(cols.allele0)
    val a1 = col(cols.allele1)
    val isComplementary =
      (a0 === "A" && a1 === "T") || (a0 === "T" && a1 === "A") ||
        (a0 === "G" && a1 === "C") || (a0 === "C" && a1 === "G")
    df = df
      .withColumn("variantType",
        when(length(a0) === 1 && length(a1) === 1,
          when(isComplementary, "snp_c").otherwise("snp_n"))
          .otherwise("indel"))
      .withColumn("position", col(cols.position).cast("int"))
      .withColumnRenamed(cols.allele0, "allele1__src")
      .withColumnRenamed(cols.allele1, "allele2__src")
      .withColumnRenamed("allele1__src", "allele1")
      .withColumnRenamed("allele2__src", "allele2")
    val joined = df
      .join(annotation2Way,
        Seq("chromosome", "position", "allele1", "allele2"), "inner")
      .withColumn("beta",
        when(col("direction") === 1.0, col(cols.beta).cast("double"))
          .otherwise(-col(cols.beta).cast("double")))
      // complementary SNPs matched in flipped orientation are
      // irrecoverably ambiguous
      .filter(!(col("variantType") === "snp_c" && col("direction") === -1.0))
    val withFreq = cols.a1freq match {
      case Some(c) => joined.withColumn("effectAlleleFrequencyFromSource",
        when(col("direction") === 1.0, col(c).cast("float"))
          .otherwise((lit(1.0) - col(c)).cast("float")))
      case None => joined
    }
    val (mant, expo) = graft.functions.PValues
      .negLogToMantissaAndExponent(col(cols.mlog10p).cast("double"))
    val base = Seq(
      col("studyId"), col("chromosome"), col("variantId"), col("beta"),
      col("position").cast("int").as("position"),
      mant.as("pValueMantissa"), expo.as("pValueExponent"),
      col(cols.se).cast("double").as("standardError"))
    val proj = base ++
      cols.n.map(c => col(c).cast("int").as("sampleSize")).toSeq ++
      cols.a1freq.map(_ => col("effectAlleleFrequencyFromSource")).toSeq
    withFreq
      .select(proj: _*)
      .filter(col("position").isNotNull && col("beta") =!= 0)
  }

  /** Driver loop: process chromosomes one at a time and append
    * partitioned output — bounds executor memory per pass and yields
    * chromosome-pruned reads downstream.
    * reference: src/gentropy/common/per_chromosome.py:69-110 */
  def processPerChromosome(
      spark: SparkSession, sumstats: DataFrame, annotation2Way: DataFrame,
      outPath: String,
      chromosomes: Seq[String] = (1 to 22).map(_.toString) ++ Seq("X", "Y")
    ): Unit =
    chromosomes.zipWithIndex.foreach { case (chrom, i) =>
      val part = harmoniseSumstats(
        sumstats.filter(col("chromosome") === chrom),
        annotation2Way.filter(col("chromosome") === chrom))
      part.write
        .mode(if (i == 0) "overwrite" else "append")
        .partitionBy("studyId", "chromosome")
        .parquet(outPath)
    }
}
