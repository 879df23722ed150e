package graft.operators

import graft.functions.ArrayFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distance-window clumping of significant summary-statistics rows into
  * lead variants.
  *
  * Semantics match the reference
  * (reference: src/gentropy/method/window_based_clumping.py:94-258):
  *  1. gap-based sessionisation: a new cluster starts when the gap to
  *     the previous variant exceeds `distance` (lag + running
  *     last(ignoreNulls) forward fill — one shuffle on
  *     (studyId, chromosome));
  *  2. within each cluster, variants rank by significance and the
  *     rank-1 row greedily selects leads among the cluster's positions
  *     listed by p-value: a variant is a lead iff no stronger lead is
  *     within `distance`;
  *  3. non-leads get the WINDOW_CLUMPED QC flag.
  *
  * The greedy kernel runs as a Scala UDF over the one collected
  * position array per cluster (not per row), so the shuffle layout and
  * per-cluster O(n·leads) cost match the reference without any Python
  * worker boundary. Cluster sizes are bounded by the session window, so
  * the collected array stays small regardless of total data size.
  */
object WindowBasedClumping {

  val QcFlag = "Variant not found in LD reference" // placeholder vocab entry
  val WindowClumpedFlag = "WINDOW_CLUMPED"

  /** Session-window cluster id (W3).
    * reference: src/gentropy/method/window_based_clumping.py:94-112 */
  def clusterPeaks(study: Column, chromosome: Column, position: Column,
                   windowLength: Int): Column = {
    val byPos = Window.partitionBy(study, chromosome).orderBy(position)
    val prev = lag(position, 1).over(byPos)
    val boundary = when(prev.isNull || (position - prev) > windowLength,
      concat_ws("_", study, chromosome, position))
    when(boundary.isNull,
      last(boundary, ignoreNulls = true)
        .over(byPos.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .otherwise(boundary)
  }

  /** Greedy lead selection over positions sorted by ascending p-value:
    * 1.0 = lead, 0.0 = clumped into an earlier lead.
    * reference: src/gentropy/method/window_based_clumping.py:114-153 */
  private[operators] def pruneLeads(positions: Seq[Long], window: Long): Seq[Double] = {
    val leads = scala.collection.mutable.ArrayBuffer.empty[Long]
    positions.map { p =>
      if (leads.exists(l => math.abs(l - p) < window)) 0.0
      else { leads += p; 1.0 }
    }
  }

  /** Positions sorted by ascending p-value → set of lead positions. */
  private val leadPositionsUdf =
    udf((positions: Seq[Long], window: Long) =>
      positions.zip(pruneLeads(positions, window))
        .collect { case (p, m) if m > 0 => p })

  /** Clump pre-filtered significant associations; flags non-lead rows
    * with WINDOW_CLUMPED in `qualityControls` (initialising the column
    * when absent).
    *
    * Same semantics as the reference
    * (reference: src/gentropy/method/window_based_clumping.py:155-258)
    * but a different physical shape: the reference materialises the
    * cluster's position list per row with a shrinking
    * `rowsBetween(currentRow, unboundedFollowing)` frame, which Spark
    * recomputes per row — O(cluster²). Here the greedy kernel runs
    * once per cluster in a groupBy aggregate and the lead set joins
    * back on the cluster key — O(cluster·leads) total and one extra
    * (cluster-keyed, well-distributed) shuffle. 54s → seconds on the
    * sf0.1 bench. Rows tied on position with a cluster lead are
    * flagged as leads too (deterministic; the reference breaks such
    * ties arbitrarily by row order). */
  def clump(df: DataFrame, distance: Int = 500000): DataFrame = {
    // Single-pass shape: the sessionisation window shuffles once on
    // (studyId, chromosome); every later step is a window over
    // (studyId, chromosome, cluster_id), whose ClusteredDistribution is
    // already satisfied by that partitioning — in-partition sorts only,
    // no join-back, no second execution of the sessionisation (the old
    // groupBy+join formulation ran the full (studyId, chromosome)
    // shuffle+sort twice: once for the aggregate, once for the probe).
    val withCluster = df.withColumn("cluster_id",
      clusterPeaks(col("studyId"), col("chromosome"), col("position"), distance))

    val byCluster =
      Window.partitionBy(col("studyId"), col("chromosome"), col("cluster_id"))
    // Whole-partition frames: Spark evaluates each aggregate ONCE per
    // cluster (UnboundedWindowFunctionFrame). Order matters for row
    // width: the collect_list array is born inside the same projection
    // that consumes it (`when(rn=1, udf(...))` — CaseWhen branches are
    // lazy, so the greedy kernel runs once per cluster), so no later
    // sort or window ever carries an O(cluster)-wide row. A first
    // attempt that kept `_tags` as a column pushed the fat arrays
    // through two window sorts and was 7× slower than the join it
    // replaced.
    val joined = withCluster
      .withColumn("_rn",
        row_number().over(byCluster.orderBy(col("position"))))
      .withColumn("_leadsOnFirst",
        when(col("_rn") === 1, leadPositionsUdf(
          transform(array_sort(collect_list(struct(
            col("pValueExponent"), col("pValueMantissa"),
            col("position").cast("long").as("position"))).over(byCluster)),
            t => t.getField("position")),
          lit(distance.toLong))))
      .withColumn("leadPositions",
        first(col("_leadsOnFirst"), ignoreNulls = true).over(byCluster))
      .drop("_rn", "_leadsOnFirst")
    val notLead = !array_contains(col("leadPositions"), col("position").cast("long"))
    val qc =
      if (df.columns.contains("qualityControls"))
        ArrayFns.updateQualityFlag(col("qualityControls"), notLead, WindowClumpedFlag)
      else
        when(notLead, array(lit(WindowClumpedFlag)))
          .otherwise(array().cast("array<string>"))

    joined
      .withColumn("studyLocusId",
        ArrayFns.generateIdentifier(Seq(col("studyId"), col("variantId"))))
      .withColumn("qualityControls", qc)
      .drop("cluster_id", "leadPositions")
  }

  /** Leads only — rows that survived clumping. */
  def leads(df: DataFrame, distance: Int = 500000): DataFrame =
    clump(df, distance)
      .filter(ArrayFns.validRows(col("qualityControls"), Seq(WindowClumpedFlag)))
}
