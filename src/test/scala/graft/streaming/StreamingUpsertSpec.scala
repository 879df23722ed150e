package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingUpsertSpec extends SparkSpec {
  import spark.implicits._

  test("streamed CDC batches fold into a published snapshot; " +
    "generations publish atomically via the marker") {
    val root = java.nio.file.Files.createTempDirectory("supsert").toString
    val ckpt = java.nio.file.Files.createTempDirectory("supsert_ck").toString
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Double, Long, String)]
    val q = StreamingUpsert.maintain(
      in.toDF.toDF("k", "name", "v", "seq", "op"),
      root, Seq("k"), "seq", Some("op"), ckpt)
    try {
      in.addData((1L, "a", 10.0, 1L, "I"), (2L, "b", 20.0, 1L, "I"))
      q.processAllAvailable()
      val g0 = StreamingUpsert.readSnapshot(spark, root)
        .as[(Long, String, Double)].collect().toSet
      assert(g0 == Set((1L, "a", 10.0), (2L, "b", 20.0)))
      // update 2, delete 1, insert 3 — later generation wins
      in.addData((2L, "b", 21.0, 2L, "U"), (1L, "a", 10.0, 2L, "D"),
        (3L, "c", 30.0, 2L, "I"))
      q.processAllAvailable()
      val g1 = StreamingUpsert.readSnapshot(spark, root)
        .as[(Long, String, Double)].collect().toSet
      assert(g1 == Set((2L, "b", 21.0), (3L, "c", 30.0)))
      assert(StreamingUpsert.currentGeneration(spark, root).contains(1L))
      // replaying a batch id publishes a NEW attempt directory with
      // identical content — the already-published directory is never
      // rewritten underneath a concurrent reader
      val publishedDirs = new java.io.File(root).list().toSet
      StreamingUpsert.applyBatch(
        Seq((2L, "b", 21.0, 2L, "U"), (1L, "a", 10.0, 2L, "D"),
          (3L, "c", 30.0, 2L, "I")).toDF("k", "name", "v", "seq", "op"),
        1L, root, Seq("k"), "seq", Some("op"))
      val g1b = StreamingUpsert.readSnapshot(spark, root)
        .as[(Long, String, Double)].collect().toSet
      assert(g1b == g1)
      val after = new java.io.File(root).list().toSet
      assert(publishedDirs.filter(_.startsWith("gen-"))
        .subsetOf(after), "a published generation dir was removed")
      assert(after.count(_.startsWith("gen-1-")) == 2,
        s"replay should add a second gen-1 attempt: $after")
    } finally q.stop()
  }

  test("readSnapshot before any commit fails loudly") {
    val root = java.nio.file.Files.createTempDirectory("supsert_e").toString
    assertThrows[IllegalStateException] {
      StreamingUpsert.readSnapshot(spark, root)
    }
  }
}
