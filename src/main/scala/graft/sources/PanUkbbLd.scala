package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pan-UKBB LD matrices (S13): allele alignment of the LD variant
  * index against the variant annotation, and half-matrix entries →
  * symmetric long-format LD with allele-order sign flips.
  *
  * The reference drives this through Hail (hl.read_table +
  * BlockMatrix.filter → NumPy per locus; reference:
  * src/gentropy/datasource/pan_ukbb_ld/ld.py:20-214). Here the whole
  * pipeline is DataFrame-native: the index is an exported table
  * (contig, position, alleles, idx), the block matrix is its exported
  * upper-triangular entry list (i, j, r), and the per-locus dense
  * materialisation happens executor-side in the fine-mapping bundle flatMap
  * ([[GnomadLd.longFormatForLoci]] contract) instead of NumPy on the
  * driver.
  */
object PanUkbbLd {

  /** Align Pan-UKBB LD index alleles with the variant annotation:
    * flipped (ref, alt) pairs are swapped and flagged with
    * alleleOrder = −1; unknown variants pass through. One row per idx
    * (annotation-confirmed order wins).
    * reference: src/gentropy/datasource/pan_ukbb_ld/ld.py:46-151 */
  def alignLdIndexAlleles(ukbbIndex: DataFrame,
                          variantAnnotation: DataFrame): DataFrame = {
    val ht = ukbbIndex
      .select(
        get(split(col("contig"), "chr"), lit(1)).as("chromosome"),
        col("position"),
        element_at(col("alleles"), 1).as("referenceAllele"),
        element_at(col("alleles"), 2).as("alternateAllele"),
        col("idx"))
      .dropDuplicates("chromosome", "position", "referenceAllele",
        "alternateAllele")
    val va = variantAnnotation
      .select(col("chromosome"), col("position"),
        col("referenceAllele").as("vaRef"),
        col("alternateAllele").as("vaAlt"))
      .dropDuplicates("chromosome", "position", "vaRef", "vaAlt")
    val flipped = col("referenceAllele") === col("vaAlt") &&
      col("alternateAllele") === col("vaRef")
    val aligned = ht
      .join(va, Seq("chromosome", "position"), "left")
      .filter(
        (col("referenceAllele") === col("vaRef") &&
          col("alternateAllele") === col("vaAlt")) ||
          flipped || col("vaRef").isNull || col("vaAlt").isNull)
      .withColumn("alleleOrder", when(flipped, -1).otherwise(1))
      .withColumn("newRef",
        when(flipped, col("vaRef")).otherwise(col("referenceAllele")))
      .withColumn("newAlt",
        when(flipped, col("vaAlt")).otherwise(col("alternateAllele")))
      .select(
        concat_ws("_", col("chromosome"), col("position"), col("newRef"),
          col("newAlt")).as("variantId"),
        col("chromosome"), col("position"),
        col("newRef").as("referenceAllele"),
        col("newAlt").as("alternateAllele"),
        col("alleleOrder"), col("idx"))
    aligned
      .withColumn("_rank",
        rank().over(Window.partitionBy("idx")
          .orderBy(col("alleleOrder").desc)))
      .filter(col("_rank") === 1)
      .drop("_rank")
  }

  /** Upper-triangular entries (i ≤ j) → symmetric long-format LD with
    * allele-order sign flips (r·order_i·order_j off-diagonal, exactly
    * 1 on the diagonal) and variant ids resolved from the aligned
    * index. Output: (variantIdI, variantIdJ, r, chromosome).
    * reference: src/gentropy/datasource/pan_ukbb_ld/ld.py:153-183
    * (the NumPy symmetrise + outer(alleleOrder) + fill_diagonal). */
  def symmetricEntries(entries: DataFrame, alignedIndex: DataFrame): DataFrame = {
    val iSide = alignedIndex.select(col("idx").as("i"),
      col("variantId").as("variantIdI"),
      col("alleleOrder").as("orderI"), col("chromosome"))
    val jSide = alignedIndex.select(col("idx").as("j"),
      col("variantId").as("variantIdJ"), col("alleleOrder").as("orderJ"))
    val resolved = entries
      .join(iSide, Seq("i"))
      .join(jSide, Seq("j"))
      .withColumn("r",
        when(col("i") === col("j"), lit(1.0))
          .otherwise(col("r") * col("orderI") * col("orderJ")))
      .select("variantIdI", "variantIdJ", "r", "chromosome")
    resolved.unionByName(
      resolved.filter(col("variantIdI") =!= col("variantIdJ"))
        .select(col("variantIdJ").as("variantIdI"),
          col("variantIdI").as("variantIdJ"), col("r"), col("chromosome")))
  }

  /** Index slice for one locus window, sorted by matrix idx.
    * reference: src/gentropy/datasource/pan_ukbb_ld/ld.py:185-214 */
  def locusIndexBoundaries(alignedIndex: DataFrame, chromosome: String,
                           start: Long, end: Long): DataFrame =
    alignedIndex
      .filter(col("chromosome") === chromosome &&
        col("position") >= start && col("position") <= end)
      .sort("idx")

  /** Per-locus long-format LD for the fine-mapper: symmetric entries →
    * [[GnomadLd.longFormatForLoci]] contract (locusId, i, j, r). */
  def longFormatForLoci(loci: DataFrame, entries: DataFrame,
                        alignedIndex: DataFrame): DataFrame =
    GnomadLd.longFormatForLoci(loci,
      symmetricEntries(entries, alignedIndex)
        .select("variantIdI", "variantIdJ", "r"))
}
