package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._
  import EventStreams._

  test("windowed counts with watermark over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_type", "ts")
    val q = windowedEventCounts(events, "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("update").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      input.addData((1L, "click", ts(0)), (1L, "click", ts(1)),
        (2L, "view", ts(6)))
      q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select(col("event_type"), col("n")).as[(String, Long)]
        .collect().toSet
      assert(rows == Set(("click", 2L), ("view", 1L)))
    } finally q.stop()
  }

  test("top-k entities per window: chained stateful aggs with the heap aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_type", "ts")
    val q = topEntitiesPerWindow(events, "user_id", "5 minutes", k = 2,
      watermark = "10 minutes")
      .writeStream.format("memory").queryName("topents")
      .outputMode("append").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      // window [10:00,10:05): user 1 × 3, user 2 × 2, user 3 × 1
      input.addData(
        (1L, "c", ts(0)), (1L, "c", ts(1)), (1L, "c", ts(2)),
        (2L, "c", ts(0)), (2L, "c", ts(3)),
        (3L, "c", ts(4)))
      q.processAllAvailable()
      // advance the watermark past the window so append emits it
      input.addData((9L, "c", ts(40)))
      q.processAllAvailable()
      val rows = spark.table("topents")
        .select("user_id", "n", "rank").as[(Long, Long, Int)]
        .collect().toSet
      assert(rows === Set((1L, 3L, 1), (2L, 2L, 2)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events on key within the bound " +
    "and drops late conversions") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Long, java.sql.Timestamp, String)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp, String)]
    val joined = EventStreams.intervalJoin(
      impressions.toDF().toDF("user_id", "imp_ts", "ad"),
      clicks.toDF().toDF("user_id", "click_ts", "page"),
      keyCol = "user_id", leftTsCol = "imp_ts", rightTsCol = "click_ts",
      within = "10 minutes", watermark = "10 minutes")
    val q = joined.writeStream.format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      impressions.addData((1L, ts(0), "adA"), (2L, ts(0), "adB"))
      clicks.addData(
        (1L, ts(5), "p1"),   // within 10 min of user 1's impression
        (2L, ts(25), "p2"),  // 25 min later — outside the bound
        (3L, ts(5), "p3"))   // no impression for user 3
      q.processAllAvailable()
      val rows = spark.table("attributed")
        .select("user_id", "ad", "page").as[(Long, String, String)]
        .collect().toSet
      assert(rows == Set((1L, "adA", "p1")))
    } finally q.stop()
  }

  test("intervalJoin rejects inputs sharing more than the key column") {
    val a = Seq((1L, 1L)).toDF("k", "ts")
    val b = Seq((1L, 1L)).toDF("k", "ts")
    assertThrows[IllegalArgumentException] {
      EventStreams.intervalJoin(a, b, "k", "ts", "ts")
    }
  }

  test("stateful sessionisation: gap closes a session, tail stays open") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(spark, input.toDS(), gapMicros = 60L * 1000000)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      val m = 1000000L
      // user 1: events at 0s, 30s (same session), then 300s (new session)
      input.addData(Event(1, "click", 0), Event(1, "view", 30 * m),
        Event(1, "click", 300 * m))
      q.processAllAvailable()
      val rows = spark.table("sessions")
        .as[SessionOut].collect()
      val closed = rows.filter(_.closed)
      assert(closed.length == 1)
      assert(closed.head.nEvents == 2 && closed.head.startMicros == 0 &&
        closed.head.endMicros == 30 * m)
      val open = rows.filter(!_.closed)
      assert(open.exists(s => s.startMicros == 300 * m && s.nEvents == 1))
    } finally q.stop()
  }
}
