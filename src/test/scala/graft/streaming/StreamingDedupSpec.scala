package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._
  import StreamingDedup._

  test("exact dedup keeps the first arrival of each digest") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = exactDedup(docs, "text")
      .writeStream.format("memory").queryName("exactdedup")
      .outputMode("append").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData(
        ("d1", "the quick brown fox", ts(0)),
        ("d2", "a different document", ts(1)),
        ("d3", "the quick brown fox", ts(2))) // duplicate of d1
      q.processAllAvailable()
      val kept = spark.table("exactdedup").select("doc_id").as[String]
        .collect().toSet
      assert(kept.contains("d2"))
      assert((kept - "d2").size == 1) // exactly one of d1/d3 survives
    } finally q.stop()
  }

  test("incremental exact dedup drops arrivals already in the static index") {
    implicit val sqlCtx = spark.sqlContext
    val index = graft.operators.IncrementalDedup.exactIndex(
      Seq((1L, "standing corpus document")).toDF("doc_id", "text"),
      "text", "doc_id")
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = incrementalExactDedup(docs, index, "text")
      .writeStream.format("memory").queryName("incrdedup")
      .outputMode("append").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData(
        ("d1", "standing corpus document", ts(0)), // already in corpus
        ("d2", "a fresh arrival", ts(1)),
        ("d3", "a fresh arrival", ts(2))) // in-stream dup of d2
      q.processAllAvailable()
      val kept = spark.table("incrdedup").select("doc_id").as[String]
        .collect().toSet
      assert(!kept.contains("d1"))
      assert(kept.size == 1 && (kept == Set("d2") || kept == Set("d3")))
    } finally q.stop()
  }

  test("evicting near-dup flags: watermark expiry forgets idle buckets") {
    // event-time timeout makes eviction deterministic under
    // processAllAvailable: d2 (1 min after d1) flags against d1's
    // stored signature; d3 — the same text arriving 40 min later,
    // long past d1/d2's bucket horizon (10 min watermark + 10 min
    // evict) — must NOT flag: the bucket state was removed, not
    // merely idle. An unrelated doc keeps the watermark honest.
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog " * 5
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")
    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    val q = nearDupFlagsEvicting(
      input.toDF().toDF("ts", "doc_id", "text"), "text", "doc_id")
      .writeStream.format("memory").queryName("neardupevict")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "d1", base))
      q.processAllAvailable()
      input.addData((ts(1), "d2", base + "extra tail token"))
      q.processAllAvailable()
      // advance the watermark far past d1/d2's horizon (unrelated doc)
      input.addData((ts(35), "w1", "completely unrelated words here"))
      q.processAllAvailable()
      input.addData((ts(40), "d3", base))
      q.processAllAvailable()
      val flags = spark.table("neardupevict")
        .select("docId", "matchedDocId").as[(String, String)]
        .collect().toSet
      assert(flags.exists { case (a, b) => Set(a, b) == Set("d1", "d2") },
        s"d2 must flag against d1: $flags")
      assert(!flags.exists { case (a, b) => a == "d3" || b == "d3" },
        s"d3 arrived past the evict horizon and must not flag: $flags")
    } finally q.stop()
  }

  test("near-dup flags fire for bucket-mates above the signature threshold") {
    implicit val sqlCtx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog " * 5
    val input = MemoryStream[(String, String)]
    val banded = bandedStream(input.toDF().toDF("doc_id", "text"),
      "text", "doc_id")
    val q = nearDupFlags(spark, banded, threshold = 0.7, idleTimeout = None)
      .writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      input.addData(("d1", base), ("dX", "completely unrelated words here"))
      q.processAllAvailable()
      // near-identical doc arrives later
      input.addData(("d2", base + "extra tail token"))
      q.processAllAvailable()
      val flags = spark.table("neardup")
        .select("docId", "matchedDocId").as[(String, String)]
        .collect().toSet
      assert(flags.exists { case (a, b) =>
        Set(a, b) == Set("d1", "d2") })
      assert(!flags.exists { case (a, b) => a == "dX" || b == "dX" })
    } finally q.stop()
  }
}
