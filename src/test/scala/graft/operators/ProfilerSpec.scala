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

  test("unsupported column types fail loudly") {
    val arr = Seq((1L, Seq(1, 2))).toDF("k", "a")
    intercept[IllegalArgumentException] {
      Profiler.profile(arr, Seq("a"))
    }
  }
}
