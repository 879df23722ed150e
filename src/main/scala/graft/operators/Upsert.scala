package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance: apply a CDC delta to a keyed snapshot
  * (latest-wins upsert + delete), the daily table-maintenance shape of
  * a 100 TB corpus — the standing snapshot is the big side and must be
  * touched exactly once, with no window function over it.
  *
  * Shape: the per-key "latest" reduction runs on the DELTA only (a
  * window over the small side); the snapshot participates in a single
  * left-anti join against the delta's distinct keys — broadcastable
  * whenever the delta fits, so at typical delta:snapshot ratios the
  * snapshot is one scan + zero shuffles. Output = surviving snapshot
  * rows ∪ surviving delta rows.
  */
object Upsert {

  /** Apply `delta` to `snapshot`.
    *
    * @param keys   join key columns (present in both frames)
    * @param seqCol monotone sequence column on the delta (commit ts /
    *               LSN); the row with the highest value per key wins.
    *               (key, seqCol) is assumed unique within the delta —
    *               ties are broken by op precedence (D > U > I) so the
    *               result stays deterministic even when it is not.
    * @param opCol  optional change-op column on the delta with values
    *               I/U (upsert) or D (delete). Absent ⇒ pure upsert.
    *
    * The result has exactly the snapshot's schema; delta-only columns
    * (`seqCol`, `opCol`) are dropped.
    */
  def applyDelta(snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
                 seqCol: String, opCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "applyDelta needs at least one key column")
    val outCols = snapshot.columns.toSeq

    val ordered = opCol match {
      case Some(op) => Seq(col(seqCol).desc,
        // op precedence on seq ties: D > U > I — all three distinct,
        // or a U/I tie would resolve by arrival order
        when(col(op) === "D", 2).when(col(op) === "U", 1).otherwise(0).desc)
      case None => Seq(col(seqCol).desc)
    }
    val latest = delta
      .withColumn("__rk", row_number().over(
        Window.partitionBy(keys.map(col): _*).orderBy(ordered: _*)))
      .filter(col("__rk") === 1)

    val survivors = opCol match {
      case Some(op) => latest.filter(col(op) =!= "D")
      case None => latest
    }

    val untouched = snapshot.join(
      delta.select(keys.map(col): _*).distinct(), keys, "left_anti")

    untouched.unionByName(survivors.select(outCols.map(col): _*))
  }

  /** Keyed diff of two snapshot generations: one row per key with
    * status added / removed / changed / unchanged — the drift report
    * behind "what did yesterday's rebuild actually touch?". `changed`
    * compares an md5 digest of `compareCols` (nulls sentinel-coded,
    * control-char-separated), so the comparison ships one 32-char column
    * per side instead of the payload.
    *
    * Scale: two map-side digest projections and ONE full-outer
    * equi-join on the keys — no window, no payload shuffle. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    def dig(df: DataFrame, as: String): DataFrame =
      df.select(keys.map(col) :+
        md5(concat_ws("\u0001", compareCols.map(c =>
          coalesce(col(c).cast("string"), lit("\u0000null"))): _*)).as(as): _*)
    dig(oldSnap, "_do").join(dig(newSnap, "_dn"), keys, "full_outer")
      .select(keys.map(col) :+
        when(col("_do").isNull, "added")
          .when(col("_dn").isNull, "removed")
          .when(col("_do") =!= col("_dn"), "changed")
          .otherwise("unchanged").as("status"): _*)
  }
}
