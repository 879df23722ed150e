package graft.core

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Audited writes: collect pipeline-observability metrics in the SAME
  * pass as a parquet write via `Dataset.observe` — row count, per-column
  * null counts, and an order-independent content fingerprint — so a
  * 100 TB write never pays a second scan to know what it wrote. The
  * fingerprint (sum of per-row xxhash64 over the audited columns) lets
  * two runs of the same step be compared for drift by metadata alone.
  */
object WriteAudit {

  /** Write `df` to `path` (overwrite) and return the audit metrics:
    * `rows`, `null_<col>` for each of `auditCols`, and `fingerprint`.
    * Metrics are computed by accumulator-style observers inside the
    * write job itself — no extra action, no caching. */
  def writeWithAudit(df: DataFrame, path: String,
                     auditCols: Seq[String] = Nil): Map[String, Long] = {
    val cols = if (auditCols.nonEmpty) auditCols else df.columns.toSeq
    val obs = Observation()
    val metrics =
      count(lit(1)).as("rows") +:
        // decimal(38) accumulator: ANSI mode would overflow a long sum
        // of 2^63-range hashes; the sum stays order-independent
        sum(xxhash64(cols.map(col): _*).cast("decimal(38,0)"))
          .as("fingerprint") +:
        cols.map(c => count_if(col(c).isNull).as(s"null_$c"))
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.mode("overwrite").parquet(path)
    val wrap = java.math.BigDecimal.valueOf(Long.MaxValue)
      .add(java.math.BigDecimal.ONE)
    obs.get.map {
      case (k, v: Long) => k -> v
      case (k, null) => k -> 0L
      case (k, v: java.math.BigDecimal) =>
        k -> v.remainder(wrap).longValue()
      case (k, v: Number) => k -> v.longValue()
      case (k, v) => k -> v.toString.toLong
    }
  }

  /** [[writeWithAudit]] plus a JSON sidecar (`<path>._audit.json`)
    * recording the metrics next to the data. */
  def writeWithAuditSidecar(df: DataFrame, path: String,
                            auditCols: Seq[String] = Nil): Map[String, Long] = {
    val m = writeWithAudit(df, path, auditCols)
    val json = m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val p = new org.apache.hadoop.fs.Path(path + "._audit.json")
    val fs = p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write((json + "\n").getBytes("UTF-8")) finally out.close()
    m
  }
}
