package graft.finemap

import breeze.linalg.DenseMatrix
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Standalone pairwise-LD dataset operations.
  *
  * reference: src/gentropy/dataset/pairwise_ld.py:20-109. The
  * reference materialises the square matrix driver-side via
  * `toPandas`; here the slice stays a DataFrame until a per-locus
  * kernel genuinely needs the dense block (then it is bounded by the
  * locus size, the same contract as
  * [[DistributedFineMapper.finemapAll]]).
  */
object PairwiseLD {

  /** Square LD slice restricted to a variant subset (both sides). */
  def overlap(square: DataFrame, variants: DataFrame): DataFrame =
    square
      .join(variants.select(col("variantId").as("variantIdI")),
        Seq("variantIdI"), "left_semi")
      .join(variants.select(col("variantId").as("variantIdJ")),
        Seq("variantIdJ"), "left_semi")

  /** Variants of the slice, sorted by position parsed from the id
    * ("chr_pos_ref_alt"). reference: pairwise_ld.py:91-109 */
  def variantList(square: DataFrame): Seq[String] =
    square
      .select(col("variantIdI").as("variantId"),
        split(col("variantIdI"), "_").getItem(1).cast("int").as("position"))
      .distinct()
      .orderBy(col("position"), col("variantId"))
      .collect()
      .map(_.getString(0))
      .toSeq

  /** Dense Breeze matrix of a (small, per-locus) slice; missing pairs
    * fill with 0, diagonal with 1. reference: pairwise_ld.py:74-90 */
  def toDenseMatrix(square: DataFrame,
                    variants: Seq[String]): DenseMatrix[Double] = {
    val index = variants.zipWithIndex.toMap
    val m = DenseMatrix.eye[Double](variants.size)
    square
      .select("variantIdI", "variantIdJ", "r")
      .collect()
      .foreach { row =>
        for {
          i <- index.get(row.getString(0))
          j <- index.get(row.getString(1))
        } m(i, j) = row.getDouble(2)
      }
    m
  }
}
