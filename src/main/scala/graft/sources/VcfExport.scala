package graft.sources

import graft.functions.ArrayFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Variant dataset → VCF-shaped export, the interop surface consumed
  * by VEP and most annotation tools.
  *
  * Mirrors the reference's ConvertToVcfStep + OpenTargetsVariant
  * .as_vcf_df (reference: src/gentropy/variant_index.py:84-160,
  * src/gentropy/datasource/open_targets/variants.py:68-128): variant
  * ids from the id column and any credible-set locus are combined,
  * split into CHROM/POS/REF/ALT, deduplicated, range-partitioned by
  * (CHROM, POS) and written as sorted headered TSV shards. Field
  * access uses null-returning `get()` so malformed ids survive ANSI
  * mode as "." placeholders rather than runtime throws.
  */
object VcfExport {

  /** Fill null variant ids from an rsID→variantId mapping (the
    * reference fetches the mapping from the Ensembl API on the driver;
    * here it is a DataFrame input — (variantRsId, mappedVariantIds:
    * array<string>) — so the join stays distributed and offline-
    * testable).
    * reference: src/gentropy/datasource/open_targets/variants.py:26-66 */
  def mapRsidsToVariantIds(variantDf: DataFrame, mapping: DataFrame): DataFrame =
    variantDf
      .join(
        mapping.select(col("variantRsId"),
          explode(col("mappedVariantIds")).as("mappedVariantId")),
        Seq("variantRsId"), "left")
      .withColumn("variantId",
        coalesce(col("variantId"), col("mappedVariantId")))
      .drop("mappedVariantId")

  /** Normalise one variant frame into VCF columns
    * (CHROM, POS, ID, REF, ALT, QUAL, FILTER, INFO). */
  def asVcfDf(df0: DataFrame): DataFrame = {
    var df = df0
    if (!df.columns.contains("variantRsId"))
      df = df.withColumn("variantRsId", lit(null).cast("string"))
    if (!df.columns.contains("locus"))
      df = df.withColumn("locus",
        lit(null).cast("array<struct<variantId:string>>"))
    val ids = ArrayFns.safeArrayUnion(
      array(col("variantId")), col("locus.variantId"))
    val part = (i: Int) => get(split(col("variantId"), "_"), lit(i))
    df.filter(col("variantId").isNotNull)
      .withColumn("variantId", explode(ids))
      .select(
        coalesce(part(0), lit(".")).as("CHROM"),
        coalesce(part(1), lit(".")).cast("int").as("POS"),
        coalesce(col("variantRsId"), lit(".")).as("ID"),
        coalesce(part(2), lit(".")).as("REF"),
        coalesce(part(3), lit(".")).as("ALT"),
        lit(".").as("QUAL"), lit(".").as("FILTER"), lit(".").as("INFO"))
      .distinct()
  }

  /** Merge variant frames, dedup by genomic key and return the sorted,
    * range-partitioned VCF frame (one sorted shard per ~partitionSize
    * variants — the layout VEP expects).
    * reference: src/gentropy/variant_index.py:120-146 */
  def toVcf(sources: Seq[DataFrame], partitionSize: Int = 2000): DataFrame = {
    val merged = sources.map(asVcfDf)
      .reduce(_ unionByName _)
      .dropDuplicates("CHROM", "POS", "REF", "ALT")
    val n = math.max(1, math.ceil(
      merged.count().toDouble / partitionSize).toInt)
    merged
      .repartitionByRange(n, col("CHROM"), col("POS"))
      .sortWithinPartitions(col("CHROM").asc, col("POS").asc)
  }

  /** Write the VCF frame as headered tab-separated shards. */
  def write(vcf: DataFrame, path: String): Unit =
    vcf.write.mode("overwrite")
      .option("sep", "\t").option("quote", "").option("quoteAll", "false")
      .option("header", "true")
      .csv(path)
}
