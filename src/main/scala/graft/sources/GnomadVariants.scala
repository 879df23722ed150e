package graft.sources

import graft.operators.VariantOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** GnomAD variant sites → VariantIndex rows, Hail-free.
  *
  * The reference reads the gnomAD genomes Hail table and reshapes it
  * (reference: src/gentropy/datasource/gnomad/variants.py:31-128);
  * here the input is any Spark-readable export with
  * (contig, position, alleles: array<string>,
  *  alleleFrequencies: array<struct<populationName, alleleFrequency>>
  *  [, rsIds]) — biallelic rows only survive, the variantId is
  * chr_pos_ref_alt with OTVAR hashing over the length threshold, and a
  * gnomAD cross-reference is attached.
  */
object GnomadVariants {

  def asVariantIndex(sites: DataFrame, hashThreshold: Int = 100): DataFrame = {
    val withRsids =
      if (sites.columns.contains("rsIds")) sites
      else sites.withColumn("rsIds", array().cast("array<string>"))
    withRsids
      .filter(size(col("alleles")) === 2)
      .select(
        regexp_replace(col("contig"), "chr", "").as("chromosome"),
        col("position"),
        col("alleles").getItem(0).as("referenceAllele"),
        col("alleles").getItem(1).as("alternateAllele"),
        col("alleleFrequencies"),
        col("rsIds"))
      .withColumn("variantId",
        concat_ws("_", col("chromosome"), col("position"),
          col("referenceAllele"), col("alternateAllele")))
      .withColumn("dbXrefs", array(struct(
        concat_ws("-", col("chromosome"), col("position"),
          col("referenceAllele"), col("alternateAllele")).as("id"),
        lit("gnomad").as("source"))))
      .withColumn("variantId",
        VariantOps.hashLongVariantIds(col("variantId"), col("chromosome"),
          col("position"), hashThreshold))
  }
}
