package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Upsert

/** Streaming CDC snapshot maintenance: fold a change stream into a
  * standing keyed snapshot with [[Upsert.applyDelta]] semantics
  * (latest-wins upsert + delete), one generation per micro-batch.
  *
  * Each batch writes a NEW generation directory named by its batch id
  * and then publishes it by rewriting the `_CURRENT` marker — readers
  * resolve the marker and never observe a half-written snapshot, and
  * a replayed batch (foreachBatch's at-least-once contract) rewrites
  * the same generation directory, making the sink idempotent.
  *
  * Scale: per batch, the standing snapshot is read once and pays one
  * anti-join against the batch's keys (the [[Upsert.applyDelta]]
  * shape); the window runs on the batch only. A production deployment
  * would compact/expire old generations with the `compact` step. */
object StreamingUpsert {

  private val Marker = "_CURRENT"

  /** The published generation id, if any batch has committed. */
  def currentGeneration(spark: org.apache.spark.sql.SparkSession,
                        root: String): Option[Long] = {
    val p = new Path(root, Marker)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  /** The published snapshot (empty-schema error if nothing committed). */
  def readSnapshot(spark: org.apache.spark.sql.SparkSession,
                   root: String): DataFrame = {
    val gen = currentGeneration(spark, root).getOrElse(
      throw new IllegalStateException(s"no published snapshot under $root"))
    spark.read.parquet(s"$root/gen-$gen")
  }

  /** Generations with a completed parquet write (_SUCCESS present) —
    * directory existence alone is not commitment. */
  private def committedGenerations(
      spark: org.apache.spark.sql.SparkSession, root: String): Seq[Long] = {
    val rp = new Path(root)
    val fs = rp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rp)) Seq.empty
    else fs.listStatus(rp).toSeq
      .map(_.getPath)
      .filter(p => p.getName.startsWith("gen-") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.stripPrefix("gen-").toLong)
  }

  /** Apply one delta batch and publish its generation — also the
    * foreachBatch body, exposed for direct batch use and tests.
    *
    * The snapshot SOURCE is the newest committed generation strictly
    * BELOW `batchId`, never the marker: a replayed batch (restart
    * after commit but before the checkpoint advanced) would otherwise
    * read gen-N while overwriting gen-N — a read-under-overwrite that
    * corrupts the snapshot. Reading below the batch id makes the
    * replay rebuild the same generation from the same source. */
  def applyBatch(batch: DataFrame, batchId: Long, root: String,
                 keys: Seq[String], seqCol: String,
                 opCol: Option[String]): Unit = {
    val spark = batch.sparkSession
    val outCols = batch.columns.filterNot(c =>
      c == seqCol || opCol.contains(c)).toSeq
    val snapshot =
      committedGenerations(spark, root).filter(_ < batchId) match {
        case gens if gens.nonEmpty =>
          spark.read.parquet(s"$root/gen-${gens.max}")
        case _ =>
          import org.apache.spark.sql.functions.{col, lit}
          batch.select(outCols.map(col): _*).filter(lit(false))
      }
    val next = Upsert.applyDelta(snapshot, batch, keys, seqCol, opCol)
    next.write.mode("overwrite").parquet(s"$root/gen-$batchId")
    // publish: never move the marker backwards (a replay of an old
    // batch must not unpublish a later generation)
    if (currentGeneration(spark, root).forall(_ <= batchId)) {
      val p = new Path(root, Marker)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val out = fs.create(p, true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Start the maintenance stream over a streaming delta frame. */
  def maintain(delta: DataFrame, root: String, keys: Seq[String],
               seqCol: String, opCol: Option[String],
               checkpoint: String): StreamingQuery =
    delta.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, root, keys, seqCol, opCol)
      }
      .start()
}
