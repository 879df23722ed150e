package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDecontaminationSpec extends SparkSpec {
  import spark.implicits._

  test("coverage verdicts stream out against a static benchmark") {
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(
      ("b1", "alpha beta gamma delta epsilon"), // 3 distinct 3-shingles
      ("b2", "one two three"))                  // 1 shingle
      .toDF("doc_id", "text")
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val corpus = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDecontamination.coverageStream(
      corpus, benchmark, "text", "doc_id")
      .writeStream.format("memory").queryName("contam")
      .outputMode("append").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData(
        // full copy of b1 → coverage 1.0
        ("c1", "alpha beta gamma delta epsilon", ts(0)),
        // shares exactly one shingle with b1 → 1/3
        ("c2", "alpha beta gamma nothing else here", ts(1)),
        // clean document → no row
        ("c3", "completely unrelated text entirely", ts(2)))
      // advance the watermark far past the data so the event-time
      // aggregation finalises and emits in append mode
      input.addData(("late", "zzz yyy xxx", ts(59)))
      q.processAllAvailable()
      input.addData(("later", "qqq www eee", ts(59)))
      q.processAllAvailable()
      val rows = spark.table("contam")
        .select(col("corpusId"), col("benchId"), col("overlap"),
          col("benchShingles"), round(col("coverage"), 4).as("cov"))
        .as[(String, String, Long, Long, Double)].collect().toSet
      assert(rows == Set(
        ("c1", "b1", 3L, 3L, 1.0),
        ("c2", "b1", 1L, 3L, 0.3333)), s"got $rows")
    } finally q.stop()
  }

  test("minCoverage filters sub-threshold matches") {
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(("b1", "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val corpus = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDecontamination.coverageStream(
      corpus, benchmark, "text", "doc_id", minCoverage = 0.9)
      .writeStream.format("memory").queryName("contam_thresh")
      .outputMode("append").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData(
        ("c1", "alpha beta gamma delta epsilon", ts(0)), // 1.0 → kept
        ("c2", "alpha beta gamma other words padding", ts(1))) // 1/3 → dropped
      input.addData(("late", "zzz yyy xxx", ts(59)))
      q.processAllAvailable()
      input.addData(("later", "qqq www eee", ts(59)))
      q.processAllAvailable()
      val ids = spark.table("contam_thresh").select("corpusId")
        .as[String].collect().toSet
      assert(ids == Set("c1"), s"got $ids")
    } finally q.stop()
  }

  test("bloom prefilter leaves streaming verdicts unchanged") {
    implicit val sqlCtx = spark.sqlContext
    val benchmark = Seq(
      ("b1", "alpha beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(String, String, java.sql.Timestamp)]
    val corpus = input.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingDecontamination.coverageStream(
      corpus, benchmark, "text", "doc_id", bloomPrefilter = true)
      .writeStream.format("memory").queryName("contam_bloom")
      .outputMode("append").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData(
        ("c1", "alpha beta gamma delta epsilon", ts(0)), // full copy
        ("c2", "completely unrelated text entirely", ts(1))) // clean
      input.addData(("late", "zzz yyy xxx", ts(59)))
      q.processAllAvailable()
      input.addData(("later", "qqq www eee", ts(59)))
      q.processAllAvailable()
      val rows = spark.table("contam_bloom")
        .select(col("corpusId"), col("overlap"))
        .as[(String, Long)].collect().toSet
      assert(rows == Set(("c1", 3L)), s"got $rows")
    } finally q.stop()
  }
}
