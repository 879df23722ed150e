package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** One-pass column profiler: per-column null / distinct / range /
  * central statistics in a SINGLE aggregate over the table, emitted in
  * long format `(col_name, metric, value)`.
  *
  * The whole profile is one `Aggregate` node — map-side partial
  * aggregation reduces every partition to one buffer row, the final
  * merge sees one row per shuffle partition, and the unpivot to long
  * format happens on that single merged row. Cost at 100 TB = one scan
  * + a few KB of shuffle, independent of table cardinality.
  *
  * Distinct counts: `approxDistinct = true` (default) uses
  * HyperLogLog++ (`approx_count_distinct`, rsd configurable) and keeps
  * the plan a genuine single pass. `approxDistinct = false` uses exact
  * `count_distinct`, which Catalyst plans via an `Expand` (one
  * duplicated stream per distinct aggregate) — exact numbers for an
  * oracle or a small table, but a deliberate multi-stream scan; don't
  * use it at the 100 TB tier.
  *
  * Numeric columns report min/max/mean of the value; string columns
  * report min/max/mean of `length(value)` — both as doubles so one
  * long-format schema carries every column type.
  */
object Profiler {

  private case class MetricExpr(colName: String, metric: String, expr: Column)

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = true,
              rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val metrics: Seq[MetricExpr] = cols.flatMap { name =>
      val c = col(name)
      val dt = df.schema(name).dataType
      val measured: Column = dt match {
        case _: NumericType => c.cast("double")
        case StringType     => length(c).cast("double")
        case other =>
          throw new IllegalArgumentException(
            s"profile: unsupported type $other for column $name")
      }
      val distinct =
        if (approxDistinct) approx_count_distinct(c, rsd) else count_distinct(c)
      Seq(
        MetricExpr(name, "n_nonnull", count(c).cast("double")),
        MetricExpr(name, "n_null", count_if(c.isNull).cast("double")),
        MetricExpr(name, "n_distinct", distinct.cast("double")),
        MetricExpr(name, "min", min(measured)),
        MetricExpr(name, "max", max(measured)),
        MetricExpr(name, "mean", avg(measured)))
    }
    val aggs = metrics.zipWithIndex.map { case (m, i) => m.expr.as(s"_m$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single row: stack(n, 'col','metric',_m0, ...)
    val stackArgs: Seq[Column] = metrics.zipWithIndex.flatMap { case (m, i) =>
      Seq(lit(m.colName), lit(m.metric), col(s"_m$i"))
    }
    one.select(
      stack((lit(metrics.size) +: stackArgs): _*)
        .as(Seq("col_name", "metric", "value")))
  }

  /** Equi-width histogram of a numeric column over an explicit
    * `[lo, hi)` range in one pass: `(bin, lo, hi, n)` with values
    * below/above the range clamped into the edge bins. Explicit
    * bounds keep it a single scan (a data-derived range would need a
    * min/max pre-pass); one tiny groupBy on the bin id — cost at
    * 100 TB = one scan + `bins` rows of shuffle. Nulls are dropped. */
  def histogram(df: DataFrame, colName: String, bins: Int,
                lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo, got $bins [$lo,$hi)")
    val width = (hi - lo) / bins
    val raw = floor((col(colName).cast("double") - lit(lo)) / lit(width))
    val bin = least(greatest(raw, lit(0.0)), lit((bins - 1).toDouble))
      .cast("long")
    df.filter(col(colName).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * width).as("lo"),
        (lit(lo) + (col("bin") + 1) * width).as("hi"),
        col("n"))
  }
}
