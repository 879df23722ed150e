package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UpsertSpec extends SparkSpec {
  import spark.implicits._

  private def snap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("k", "name", "v")

  test("latest-wins upsert with deletes and inserts") {
    val delta = Seq(
      (2L, "b", 21.0, 1L, "U"),
      (2L, "b", 22.0, 2L, "U"), // later seq wins
      (3L, "c", 30.0, 1L, "D"), // delete
      (5L, "e", 50.0, 1L, "I")) // insert
      .toDF("k", "name", "v", "seq", "op")
    val out = Upsert.applyDelta(snap, delta, Seq("k"), "seq", Some("op"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out === Seq((1L, "a", 10.0), (2L, "b", 22.0),
      (4L, "d", 40.0), (5L, "e", 50.0)))
  }

  test("seq ties break by op precedence: delete beats upsert") {
    val delta = Seq(
      (2L, "b", 99.0, 1L, "U"),
      (2L, "b", 20.0, 1L, "D"))
      .toDF("k", "name", "v", "seq", "op")
    val out = Upsert.applyDelta(snap, delta, Seq("k"), "seq", Some("op"))
    assert(!out.select("k").as[Long].collect().contains(2L))
  }

  test("seq ties between U and I resolve to U in both arrival orders") {
    val rows = Seq((5L, "e", 20.0, 1L, "U"), (5L, "e", 10.0, 1L, "I"))
    for (d <- Seq(rows, rows.reverse)) {
      val out = Upsert.applyDelta(snap, d.toDF("k", "name", "v", "seq", "op"),
        Seq("k"), "seq", Some("op"))
      assert(out.filter($"k" === 5L).select("v").as[Double].head() === 20.0)
    }
  }

  test("pure upsert mode (no op column) and idempotence") {
    val delta = Seq((1L, "a", 11.0, 7L), (9L, "z", 90.0, 7L))
      .toDF("k", "name", "v", "seq")
    val once = Upsert.applyDelta(snap, delta, Seq("k"), "seq")
    val twice = Upsert.applyDelta(once, delta, Seq("k"), "seq")
    assert(once.orderBy("k").collect() === twice.orderBy("k").collect())
    assert(once.filter($"k" === 1L).select("v").as[Double].head() === 11.0)
  }

  test("snapshotDiff classifies added/removed/changed/unchanged, " +
    "nulls compare equal to nulls and unequal to values") {
    val oldS = Seq((1L, Option("a")), (2L, Option("b")),
      (3L, Option.empty[String]), (4L, Option("d")))
      .toDF("k", "v")
    val newS = Seq((2L, Option("B")), (3L, Option.empty[String]),
      (4L, Option("d")), (5L, Option("e")))
      .toDF("k", "v")
    val got = Upsert.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "changed",
      3L -> "unchanged", 4L -> "unchanged", 5L -> "added"))
    // the digest join ships no payload and uses no window
    val plan = Upsert.snapshotDiff(oldS, newS, Seq("k"), Seq("v"))
      .queryExecution.optimizedPlan
    assert(plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty)
  }

  test("snapshot side sees no window — only the delta is windowed") {
    val delta = Seq((2L, "b", 21.0, 1L, "U")).toDF("k", "name", "v", "seq", "op")
    val out = Upsert.applyDelta(snap, delta, Seq("k"), "seq", Some("op"))
    val optimized = out.queryExecution.optimizedPlan
    // exactly one Window node (the delta-side row_number), and the
    // snapshot joins anti — never inner/outer against the full delta
    val windows = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size === 1, optimized.toString)
    assert(optimized.toString.toLowerCase.contains("leftanti"), optimized.toString)
  }
}
