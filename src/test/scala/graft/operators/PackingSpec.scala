package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L).map { i =>
    (i, 10L + (i * 37) % 90) // tokens in [10, 100)
  }.toDF("doc_id", "n_tokens")

  test("packing is deterministic across bucket counts (equals global cumsum)") {
    val a = Packing.packByBudget(docs, "doc_id", "n_tokens", 500L, buckets = 1)
      .select("doc_id", "shardId").as[(Long, Long)].collect().toMap
    val b = Packing.packByBudget(docs, "doc_id", "n_tokens", 500L, buckets = 7)
      .select("doc_id", "shardId").as[(Long, Long)].collect().toMap
    val c = Packing.packByBudget(docs, "doc_id", "n_tokens", 500L, buckets = 64)
      .select("doc_id", "shardId").as[(Long, Long)].collect().toMap
    assert(a == b && b == c)
  }

  test("shards are contiguous and overflow at most by their last document") {
    val packed = Packing.packByBudget(docs, "doc_id", "n_tokens", 500L, buckets = 8)
      .orderBy("doc_id").as[(Long, Long, Long, Boolean)].collect()
    // contiguity: shard ids are non-decreasing in doc order
    assert(packed.sliding(2).forall { case Array(x, y) => x._3 <= y._3; case _ => true })
    // budget: every shard's token sum stays under budget + its max doc
    val byShard = packed.groupBy(_._3).values
    byShard.foreach { shard =>
      val total = shard.map(_._2).sum
      val maxDoc = shard.map(_._2).max
      assert(total <= 500L + maxDoc,
        s"shard ${shard.head._3} total $total exceeds budget+maxDoc")
    }
    // every shard except the last reaches the budget with its last doc
    val lastShard = packed.map(_._3).max
    byShard.filter(_.head._3 != lastShard).foreach { shard =>
      assert(shard.map(_._2).sum + 0L >= 500L - 100L)
    }
  }

  test("oversize documents are flagged and own their budget multiple") {
    val withBig = docs.union(Seq((200L, 5000L)).toDF("doc_id", "n_tokens"))
    val packed = Packing.packByBudget(withBig, "doc_id", "n_tokens", 500L)
    val flagged = packed.filter(col("oversize")).select("doc_id")
      .as[Long].collect().toSeq
    assert(flagged == Seq(200L))
  }

  test("epochShuffle: contiguous per-shard positions, epoch changes " +
    "the permutation, partitioning does not") {
    val docs = (1L to 400L).map(Tuple1(_)).toDF("doc_id")
    val e0 = Packing.epochShuffle(docs, "doc_id", epoch = 0, numShards = 4)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    // every row lands exactly once; per-shard positions are 1..n
    assert(e0.size == 400 && e0.map(_._1).distinct.size == 400)
    e0.groupBy(_._2).values.foreach { rows =>
      assert(rows.map(_._3).sorted == (1L to rows.size).toSeq)
    }
    // shards are roughly balanced under the uniform key
    assert(e0.groupBy(_._2).values.map(_.size).min > 50)
    val e1 = Packing.epochShuffle(docs, "doc_id", epoch = 1, numShards = 4)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(e0 != e1) // a fresh permutation per epoch
    val e0b = Packing.epochShuffle(docs.repartition(7), "doc_id",
        epoch = 0, numShards = 4)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(e0 == e0b) // deterministic under partitioning
  }
}
