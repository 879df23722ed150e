package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixingSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 400L).map { i =>
    (i, s"src${i % 4}", 10L + (i % 7)) // ~4 sources, ~1300 tokens each
  }.toDF("doc_id", "source", "tokens")

  test("mix sampling hits target token shares within sampling noise") {
    val weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    val sampled = Mixing.sampleToMix(docs, "doc_id", "source", "tokens",
      weights, totalTokenBudget = 1500L)
    val got = sampled.groupBy("source").agg(sum("tokens").as("t"))
      .as[(String, Long)].collect().toMap
    // unweighted source dropped entirely
    assert(!got.contains("src3"))
    // each weighted source lands near its token target (md5-uniform
    // acceptance over ~100 docs: allow 40% relative noise)
    assert(math.abs(got("src0") - 750.0) / 750.0 < 0.4, s"src0=${got("src0")}")
    assert(math.abs(got("src1") - 375.0) / 375.0 < 0.4, s"src1=${got("src1")}")
    assert(math.abs(got("src2") - 375.0) / 375.0 < 0.4, s"src2=${got("src2")}")
  }

  test("a source with less supply than target keeps every row") {
    // src0 has ~1300 tokens; target 0.9 * 10000 = 9000 >> supply
    val sampled = Mixing.sampleToMix(docs, "doc_id", "source", "tokens",
      Map("src0" -> 0.9), totalTokenBudget = 10000L)
    assert(sampled.count() == docs.filter(col("source") === "src0").count())
  }

  test("sampling is deterministic across runs and partitionings") {
    val w = Map("src0" -> 0.3, "src1" -> 0.3)
    val a = Mixing.sampleToMix(docs, "doc_id", "source", "tokens", w, 800L)
      .select("doc_id").as[Long].collect().toSet
    val b = Mixing.sampleToMix(docs.repartition(7), "doc_id", "source",
      "tokens", w, 800L).select("doc_id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("mixReport reconciles achieved shares with the sample") {
    val w = Map("src0" -> 0.5, "src1" -> 0.5)
    val sampled = Mixing.sampleToMix(docs, "doc_id", "source", "tokens", w, 1000L)
    val rep = Mixing.mixReport(sampled, "source", "tokens", w)
      .select("source", "achievedShare", "targetShare")
      .as[(String, Double, Double)].collect()
    assert(math.abs(rep.map(_._2).sum - 1.0) < 1e-9)
    assert(rep.forall(r => math.abs(r._2 - r._3) < 0.25))
  }
}
