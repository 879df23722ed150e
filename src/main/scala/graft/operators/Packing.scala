package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: assign documents to
  * fixed token-budget shards, deterministically and without a global
  * single-partition window.
  *
  * Semantics: documents ordered by `idCol` fill shards contiguously;
  * `shardId = floor(exclusivePrefixSum(tokens) / budget)`. No document
  * is split; a shard may overflow `budget` by at most the tokens of
  * its last document (the standard greedy-contiguous packing used when
  * sharding tokenised corpora); documents alone exceeding the budget
  * are flagged `oversize`.
  *
  * Scale design: the naive formulation is one window over a GLOBAL
  * ordering — a single-partition sort that serialises the whole corpus
  * through one task. Here the prefix sum is two-level: an
  * order-preserving range bucketing of the numeric id (parallel
  * within-bucket window cumsums), plus a tiny per-bucket offset
  * cumsum (≤ `buckets` rows) broadcast back. Identical result, fully
  * parallel — the distributed prefix-sum shape.
  */
object Packing {

  def packByBudget(docs: DataFrame, idCol: String, tokensCol: String,
                   budget: Long, buckets: Int = 1024): DataFrame = {
    require(budget > 0, "budget must be positive")
    val bounds = docs
      .agg(min(col(idCol).cast("long")).as("lo"),
        max(col(idCol).cast("long")).as("hi"))
      .head()
    if (bounds.isNullAt(0)) return docs
      .withColumn("shardId", lit(null).cast("long"))
      .withColumn("oversize", lit(null).cast("boolean"))
    val lo = bounds.getLong(0)
    val hi = bounds.getLong(1)
    val span = math.max(1L, (hi - lo) / buckets + 1)
    val bucketed = docs
      .withColumn("_bucket", ((col(idCol).cast("long") - lo) / span).cast("long"))
    val wIn = Window.partitionBy("_bucket").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-bucket token totals -> exclusive offsets (tiny frame, its
    // single-partition window holds <= `buckets` rows)
    val wOff = Window.orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy("_bucket")
      .agg(sum(col(tokensCol)).as("_btot"))
      .withColumn("_boff", coalesce(sum("_btot").over(wOff), lit(0L)))
      .select("_bucket", "_boff")
    bucketed
      .withColumn("_inCum",
        coalesce(sum(col(tokensCol)).over(wIn), lit(0L)))
      .join(broadcast(offsets), Seq("_bucket"))
      .withColumn("shardId",
        ((col("_boff") + col("_inCum")) / budget).cast("long"))
      .withColumn("oversize", col(tokensCol) > budget)
      .drop("_bucket", "_inCum", "_boff")
  }

  /** Deterministic per-epoch reshuffle into reader shards: every row
    * gains (shard, pos) — a fresh pseudo-random permutation each
    * `epoch`, reproducible from (id, epoch, numShards) alone, so a
    * training run can resume mid-epoch and two readers always agree
    * on the order without any materialised shuffle state. The key is
    * the md5-uniform of "epoch:id": shard = key32 mod numShards, pos
    * = the row's rank within its shard by (key, id).
    *
    * Scale: one hash shuffle on `shard`; the rank window partitions
    * by shard, so per-task state is one shard — the training reader's
    * own unit of work, sized by choosing `numShards` (corpus/shards
    * rows each), never the corpus. */
  def epochShuffle(docs: DataFrame, idCol: String, epoch: Int,
                   numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    require(epoch >= 0, "epoch must be non-negative")
    val key = conv(substring(md5(
      concat_ws(":", lit(epoch), col(idCol).cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy("shard").orderBy(col("_key"), col(idCol))
    docs
      .withColumn("_key", key)
      .withColumn("shard", (col("_key") % numShards).cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_key")
  }
}
