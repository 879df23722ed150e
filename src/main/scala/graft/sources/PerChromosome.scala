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
