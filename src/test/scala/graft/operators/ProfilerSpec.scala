package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq[(java.lang.Long, String)](
    (1L, "aa"), (2L, "bbbb"), (2L, null), (4L, "cc"), (null, "dd")
  ).toDF("k", "s")

  test("exact profile computes null/distinct/range/mean per column") {
    val m = Profiler.profile(df, Seq("k", "s"), approxDistinct = false)
      .as[(String, String, Double)].collect()
      .map { case (c, mt, v) => (c, mt) -> v }.toMap
    assert(m(("k", "n_nonnull")) == 4.0)
    assert(m(("k", "n_null")) == 1.0)
    assert(m(("k", "n_distinct")) == 3.0) // 1,2,4
    assert(m(("k", "min")) == 1.0 && m(("k", "max")) == 4.0)
    assert(math.abs(m(("k", "mean")) - 9.0 / 4) < 1e-12)
    // string column measures lengths: 2,4,2,2 (null skipped)
    assert(m(("s", "n_nonnull")) == 4.0)
    assert(m(("s", "n_null")) == 1.0)
    assert(m(("s", "n_distinct")) == 4.0)
    assert(m(("s", "min")) == 2.0 && m(("s", "max")) == 4.0)
    assert(math.abs(m(("s", "mean")) - 10.0 / 4) < 1e-12)
  }

  test("approx profile matches exact on small cardinalities") {
    val approx = Profiler.profile(df, Seq("k"), approxDistinct = true)
      .as[(String, String, Double)].collect()
      .map { case (c, mt, v) => (c, mt) -> v }.toMap
    // HLL++ is exact at tiny cardinality; every other metric identical
    assert(approx(("k", "n_distinct")) == 3.0)
    assert(approx(("k", "n_nonnull")) == 4.0)
  }

  test("profile is a single aggregate: one row before the unpivot") {
    val plan = Profiler.profile(df, Seq("k", "s"))
      .queryExecution.optimizedPlan.toString
    // the generator (unpivot) sits over exactly one Aggregate chain —
    // no join, no union of per-column scans
    assert(!plan.contains("Join") && !plan.contains("Union"))
  }

  test("histogram bins values, clamps outliers, and drops nulls") {
    val vals = Seq[java.lang.Double](0.5, 1.5, 1.9, 2.5, 9.9, -3.0, 12.0, null)
      .toDF("v")
    val h = Profiler.histogram(vals, "v", bins = 5, lo = 0.0, hi = 10.0)
      .as[(Long, Double, Double, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // width 2: bin0=[0,2): 0.5,1.5,1.9 and clamped -3.0; bin1=[2,4): 2.5;
    // bin4=[8,10): 9.9 and clamped 12.0; null dropped
    assert(h == Map(0L -> 4L, 1L -> 1L, 4L -> 2L))
  }

  test("unsupported column types fail loudly") {
    val arr = Seq((1L, Seq(1, 2))).toDF("k", "a")
    intercept[IllegalArgumentException] {
      Profiler.profile(arr, Seq("a"))
    }
  }
}
