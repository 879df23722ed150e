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
    * reference: src/gentropy/method/window_based_clumping.py:114-153
    *
    * A lead within `window` of candidate p can only be the nearest
    * lead below or above it, so an ordered set with floor/ceiling
    * lookups decides each candidate in O(log leads) — O(n log L) per
    * cluster instead of the naive O(n·L) scan, which at dense
    * positions (one mega-cluster per chromosome, ~10⁴ leads) is the
    * difference between milliseconds and minutes in a single task. */
  private[operators] def pruneLeads(positions: Seq[Long], window: Long): Seq[Double] = {
    val leads = new java.util.TreeSet[java.lang.Long]()
    positions.map { p =>
      val lo = leads.floor(p)
      val hi = leads.ceiling(p)
      if ((lo != null && p - lo < window) || (hi != null && hi - p < window)) 0.0
      else { leads.add(p); 1.0 }
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
  def clump(df: DataFrame, distance: Int = 500000,
            cache: graft.core.CacheHandle =
              graft.core.CacheHandle.disabled): DataFrame = {
    // The sessionisation window shuffles once on (studyId, chromosome);
    // everything else keys on (studyId, chromosome, cluster_id). The
    // clustered frame feeds two consumers (the lead aggregate and the
    // output join side) whose column pruning makes the exchanges
    // non-identical, so the upstream + session window evaluate twice.
    // Caching is OPT-IN here, unlike LDClumping: the frame is wide
    // (every input column) and the columnar cache build measured more
    // expensive than the saved recompute at mega-cluster scale (26.8
    // vs 14.2 s at the 100× rehearsal) while saving ~0.2 s at sf0.1 —
    // pass a live handle only when the upstream feed is genuinely
    // expensive (an exotic join, not a pushdown-pruned scan).
    val withCluster = cache.persist(df.withColumn("cluster_id",
      clusterPeaks(col("studyId"), col("chromosome"), col("position"), distance)))

    // Lead membership via a join against the exploded per-cluster lead
    // set, computed by a groupBy AGGREGATE — deliberately NOT by a
    // window. Two earlier window shapes died at mega-cluster density
    // (dense positions fusing a chromosome into one 400k-row cluster,
    // caught by the 100× scale rehearsal): (1) `first(leads).over`
    // carried the ~10⁴-element lead array on every row and probed it
    // with a per-row O(L) array_contains; (2) even computing
    // `collect_list(...).over(unbounded)` once per frame, WindowExec's
    // output projection WRITES the result array into every output row
    // — stack-sampled at UnsafeWriter.writeAlignedBytes, O(cluster²)
    // bytes, unbenchable. The aggregate materialises each cluster's
    // array exactly once, the greedy kernel explodes it into one slim
    // row per lead (bounded by cluster span / distance), and the
    // marker join is an equi-join the planner broadcasts while the
    // lead set is small — AQE falls back to a shuffled join past the
    // broadcast threshold. Cost vs the old single-pass: one extra
    // (well-distributed, cluster-keyed) shuffle of 3 numeric columns.
    val clusterLeads = withCluster
      .groupBy(col("studyId"), col("chromosome"), col("cluster_id"))
      .agg(array_sort(collect_list(struct(
        col("pValueExponent"), col("pValueMantissa"),
        col("position").cast("long").as("position")))).as("_sorted"))
      .select(col("studyId"), col("chromosome"), col("cluster_id"),
        explode(leadPositionsUdf(
          transform(col("_sorted"), t => t.getField("position")),
          lit(distance.toLong))).as("_posL"))
      .withColumn("_isLead", lit(true))
    val joined = withCluster
      .withColumn("_posL", col("position").cast("long"))
      .join(clusterLeads,
        Seq("studyId", "chromosome", "cluster_id", "_posL"), "left")
      .drop("_posL")
    val notLead = col("_isLead").isNull
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
      .drop("cluster_id", "_isLead")
  }

  /** Leads only — rows that survived clumping. */
  def leads(df: DataFrame, distance: Int = 500000,
            cache: graft.core.CacheHandle =
              graft.core.CacheHandle.disabled): DataFrame =
    clump(df, distance, cache)
      .filter(ArrayFns.validRows(col("qualityControls"), Seq(WindowClumpedFlag)))
}
