package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {
  import spark.implicits._

  test("logsumexp aggregate matches log(sum(exp)) per group, incl partial merge") {
    val df = (1 to 1000).map(i => (i % 7, i / 100.0)).toDF("g", "x")
      .repartition(4) // force map-side partials + merge path
    val got = df.groupBy("g").agg(LogSumExp.logsumexp(col("x")).as("lse"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val want = (1 to 1000).map(i => (i % 7, i / 100.0)).groupBy(_._1)
      .map { case (g, xs) => g -> StatMath2.lse(xs.map(_._2)) }
    want.foreach { case (g, w) => assert(math.abs(got(g) - w) < 1e-10, s"group $g") }
  }

  test("logsumexp handles extreme magnitudes without overflow") {
    val df = Seq((1, 1000.0), (1, 1000.0), (1, -1000.0)).toDF("g", "x")
    val got = df.groupBy("g").agg(LogSumExp.logsumexp(col("x"))).head.getDouble(1)
    assert(math.abs(got - (1000.0 + math.log(2.0))) < 1e-9)
  }

  test("logsumexp of all-null group is null") {
    val df = Seq((1, None: Option[Double]), (1, None)).toDF("g", "x")
    assert(df.groupBy("g").agg(LogSumExp.logsumexp(col("x"))).head.isNullAt(1))
  }

  test("array_cumsum is a linear running sum preserving nulls") {
    val df = Seq(Tuple1(Seq(Some(1.0), None, Some(2.5), Some(0.5)))).toDF("a")
      .select(ArrayCumSum.array_cumsum(col("a")).as("c"))
    val out = df.as[Seq[Option[Double]]].head
    assert(out == Seq(Some(1.0), None, Some(3.5), Some(4.0)))
  }

  test("array_cumsum on large arrays (would be quadratic in the reference)") {
    val n = 10000
    val df = Seq(Tuple1((1 to n).map(_.toDouble))).toDF("a")
      .select(ArrayCumSum.array_cumsum(col("a")).as("c"))
    val out = df.as[Seq[Double]].head
    assert(out.last == n.toLong * (n + 1) / 2.0 && out(2) == 6.0)
  }

  test("rankBy excludes NaN scores on both the heap and window paths") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, Double.NaN), (1L, 12L, 2.0))
      .toDF("g", "id", "s")
    // heap path (integral id): a NaN admitted while the heap is below
    // capacity can never be displaced — it must never enter at all
    val heap = TopK.rankBy(df, Seq("g"), "s", "id", 2)
      .orderBy("rank").select("id").as[Long].collect().toSeq
    assert(heap == Seq(12L, 10L))
    // window path (string id): same contract
    val str = df.select($"g", concat(lit("x"), $"id").as("id"), $"s")
    val win = TopK.rankBy(str, Seq("g"), "s", "id", 2)
      .orderBy("rank").select("id").as[String].collect().toSeq
    assert(win == Seq("x12", "x10"))
  }

  test("rankBy heap path matches the window-rank path row-for-row on " +
    "random data with heavy score ties") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 600).map(i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(12).toDouble))
    val df = rows.toDF("g", "id", "s").repartition(5)
    val heap = TopK.rankBy(df, Seq("g"), "s", "id", 7)
      .orderBy("g", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    // force the window path by disguising the id as a string, then map back
    val win = TopK.rankBy(
        df.select($"g", concat(lit("k"), format_string("%06d", $"id")).as("id"), $"s"),
        Seq("g"), "s", "id", 7)
      .orderBy("g", "rank")
      .as[(Long, String, Double, Int)].collect().toSeq
      .map(r => (r._1, r._2.drop(1).toLong, r._3, r._4))
    assert(heap == win)
  }

  test("rankBy keeps the id and score types of its input") {
    val df = Seq((1L, 10L, 3L), (1L, 11L, 5L)).toDF("g", "id", "n")
    val out = TopK.rankBy(df, Seq("g"), "n", "id", 1)
    assert(out.schema("id").dataType.typeName == "long")
    assert(out.schema("n").dataType.typeName == "long")
    assert(out.select("id", "n").as[(Long, Long)].collect().toSeq ==
      Seq((11L, 5L)))
  }
}

private object StatMath2 {
  def lse(xs: Seq[Double]): Double = {
    val m = xs.max
    m + math.log(xs.map(x => math.exp(x - m)).sum)
  }
}
