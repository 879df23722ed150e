package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) locality clustering for write layout.
  *
  * Parquet data skipping is one-dimensional: row-group min/max stats
  * prune on the sort column only. Clustering on the interleaved-bit
  * z-value of several dimensions gives every interleaved dimension
  * partial pruning power at once — the standard layout trick (Delta
  * `OPTIMIZE ZORDER BY`, Hudi clustering) re-expressed as plain
  * Spark: a codegen'd bit-interleave expression + one
  * `repartitionByRange` + in-partition sort. At 100 TB this is the
  * difference between "point lookups on (chrom, position) read every
  * file" and "they read ~1/√files per dimension".
  *
  * The z-value is a pure unrolled shift/mask/or chain over the low
  * `bitsPer` bits of each dimension — whole-stage-codegen-friendly,
  * no UDF. Dimensions must be non-negative integers (pre-scale
  * floats/dates to fixed-point ranks first); bits above `bitsPer` are
  * masked off, so callers pick `bitsPer` ≥ log2(max value) when full
  * ordering fidelity matters.
  */
object ZOrder {

  /** Interleaved-bit z-value: bit `i` of dimension `j` lands at output
    * position `i * dims + j`. Requires `bitsPer * dims <= 63`. */
  def zvalue(dims: Seq[Column], bitsPer: Int): Column = {
    require(dims.nonEmpty, "zvalue needs at least one dimension")
    require(bitsPer > 0 && bitsPer * dims.size <= 63,
      s"bitsPer=$bitsPer over ${dims.size} dims exceeds a signed long")
    val d = dims.size
    val terms = for {
      i <- 0 until bitsPer
      (c, j) <- dims.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * d + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Cluster a frame for writing: range-partition on the z-value of
    * `dims` into `numPartitions` output partitions and sort within
    * each, so every file covers a compact z-range (⇒ a compact
    * hyper-rectangle neighbourhood in dimension space). Follow with
    * `.write` — one shuffle, sort amortised into the write. */
  def clusterByZ(df: DataFrame, dims: Seq[String], bitsPer: Int,
                 numPartitions: Int): DataFrame =
    df.withColumn("__z", zvalue(dims.map(col), bitsPer))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
