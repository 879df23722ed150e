package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming deduplication for a document stream — the incremental
  * counterpart of [[graft.operators.Dedup]] (beyond the batch-only
  * reference, SURVEY §2.11).
  *
  * Exact dedup composes the built-in
  * `dropDuplicatesWithinWatermark` over a content digest, so state is
  * watermark-bounded and Spark manages it (no custom operator where a
  * built-in expresses the semantics). Near-dup detection keys the
  * stream by MinHash LSH band buckets — the same banding as the batch
  * operator, via the native one-pass signature expression — and keeps
  * a bounded per-bucket signature list in `flatMapGroupsWithState`;
  * an arriving document is flagged when any stored bucket-mate's
  * signature agrees on ≥ `threshold` of the minima. Per-bucket caps
  * bound both state size and comparison cost, mirroring the batch
  * hot-bucket cap.
  */
object StreamingDedup {

  /** Exact near-real-time dedup: first arrival of each digest within
    * the watermark survives. Input needs an event-time column `ts`. */
  def exactDedup(docs: DataFrame, textCol: String,
                 watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("_digest", md5(col(textCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("_digest")
      .drop("_digest")

  /** Streaming incremental exact dedup against a static digest index
    * ([[graft.operators.IncrementalDedup.exactIndex]] output): a
    * micro-batch arrival whose digest already stands in the corpus is
    * dropped by a stream-static anti-join (the static side is planned
    * per micro-batch, never held as stream state), and in-stream
    * duplicates by watermark-bounded digest state — the streaming
    * face of the batch `incrementalExactDedup`. */
  def incrementalExactDedup(docs: DataFrame, index: DataFrame,
                            textCol: String,
                            watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("_digest", md5(col(textCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("_digest")
      .join(index.select(col("digest").as("_digest")), Seq("_digest"),
        "left_anti")
      .drop("_digest")

  case class BandedDoc(band: Int, bandHash: Long, docId: String,
                       sig: Seq[Long])
  case class BandedDocT(ts: java.sql.Timestamp, band: Int, bandHash: Long,
                        docId: String, sig: Seq[Long])
  /** `expireAtMs` mirrors the event-time timeout registered for the
    * bucket ([[nearDupFlagsEvicting]]); the processing-time variant
    * leaves it at the unset default. */
  case class BucketState(sigs: List[(String, Seq[Long])],
                         expireAtMs: Long = Long.MaxValue)
  case class NearDupFlag(docId: String, band: Int, matchedDocId: String,
                         similarity: Double)

  /** Expand a document stream into LSH band-bucket rows carrying the
    * full MinHash signature. */
  def bandedStream(docs: DataFrame, textCol: String, idCol: String,
                   shingleSize: Int = 3, numHashes: Int = 64,
                   bands: Int = 16): Dataset[BandedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    docs
      .select(col(idCol).cast("string").as("docId"),
        graft.plans.SketchFunctions
          .minhashSignature(col(textCol), shingleSize, numHashes).as("sig"))
      .select(col("docId"), col("sig"),
        explode(graft.operators.Dedup.lshBandKeys(col("sig"), bands,
          rowsPerBand)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bandHash").as("bandHash"),
        col("docId"), col("sig"))
      .as[BandedDoc]
  }

  /** Shared per-arrival bucket kernel of both stateful near-dup
    * operators: compare `sig` against every stored bucket-mate
    * (flagging estimated Jaccard ≥ threshold), then store it under the
    * per-bucket cap. Returns the updated signature list. */
  private def compareAndStore(
      docId: String, sig: Seq[Long], band: Int,
      sigs0: List[(String, Seq[Long])], threshold: Double, maxBucket: Int,
      out: scala.collection.mutable.ArrayBuffer[NearDupFlag])
    : List[(String, Seq[Long])] = {
    var sigs = sigs0
    sigs.foreach { case (otherId, otherSig) =>
      if (otherId != docId) {
        val n = math.min(sig.length, otherSig.length)
        var m = 0
        var i = 0
        while (i < n) {
          if (sig(i) == otherSig(i)) m += 1
          i += 1
        }
        val est = if (n == 0) 0.0 else m.toDouble / n
        if (est >= threshold)
          out += NearDupFlag(docId, band, otherId, est)
      }
    }
    if (sigs.length < maxBucket && !sigs.exists(_._1 == docId))
      sigs = (docId, sig) :: sigs
    sigs
  }

  /** Stateful near-dup flagging: one state entry per live band bucket,
    * holding at most `maxBucket` (docId, signature) pairs; each
    * arriving doc is compared against its bucket-mates and flagged
    * when estimated Jaccard (matching minima fraction) ≥ `threshold`.
    * With `idleTimeout` set, a processing-time timeout expires idle
    * buckets so state cannot grow without bound; leave it None in
    * tests — the periodic timeout wake-up batches never let
    * `processAllAvailable` settle (same caveat as
    * [[EventStreams.sessionize]]). */
  def nearDupFlags(spark: SparkSession, banded: Dataset[BandedDoc],
                   threshold: Double = 0.7, maxBucket: Int = 64,
                   idleTimeout: Option[String] = Some("30 minutes"))
    : Dataset[NearDupFlag] = {
    import spark.implicits._
    banded
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState(OutputMode.Append,
        if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(
        (key: (Int, Long), batch: Iterator[BandedDoc],
         state: GroupState[BucketState]) => {
          if (batch.isEmpty && state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var sigs = state.getOption.map(_.sigs).getOrElse(Nil)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupFlag]
            batch.foreach { d =>
              sigs = compareAndStore(d.docId, d.sig, key._1, sigs,
                threshold, maxBucket, out)
            }
            state.update(BucketState(sigs))
            idleTimeout.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }

  /** [[nearDupFlags]] with WATERMARK-BOUNDED bucket state: the same
    * banding and per-bucket signature cap, but keyed state carries an
    * EVENT-time timeout — a bucket that receives no arrival for
    * `evictAfter` of event time past the watermark is removed by the
    * engine. This bounds the bucket COUNT by (arrival rate ×
    * watermark horizon) instead of by distinct corpus content — the
    * same state contract as [[exactDedup]]'s digest state — at the
    * documented semantic trade: near-duplicates are not flagged
    * against each other once the watermark has passed the bucket's
    * horizon (last arrival + `evictAfterMs`). The horizon is honoured
    * in the DATA branch too: when new data for a lapsed bucket lands
    * in the same micro-batch its timeout would have fired, the engine
    * delivers it with `hasTimedOut=false` and the stale state intact —
    * the kernel checks the stored expiry against the current watermark
    * and drops the lapsed signatures before comparing, so past-horizon
    * flagging cannot depend on micro-batch boundaries. (Arrivals
    * between the horizon and horizon + watermark delay may still
    * compare — watermark granularity, the same slack every
    * watermark-bounded operator carries.)
    *
    * Unlike a processing-time timeout, event-time expiry is driven by
    * the data's own watermark, so `processAllAvailable` settles and
    * the eviction is deterministic and testable (see the operator
    * spec and STREAMBENCH state maxima).
    *
    * The registered expiry is COARSENED to `evictAfterMs / 4`
    * granularity (rounded up), and state + timeout are re-written only
    * when the signature list or the coarsened expiry actually changes —
    * a hot bucket at its cap pays one state write per granularity step
    * of event time instead of one per micro-batch. The trade is
    * retention, not flags: a bucket may outlive its exact horizon by
    * up to one granularity step (the state bound gains a constant
    * ≤ 25% slack; flags can only move TOWARD the non-evicting
    * variant's, never drop). */
  def nearDupFlagsEvicting(docs: DataFrame, textCol: String, idCol: String,
                           tsCol: String = "ts",
                           threshold: Double = 0.7, maxBucket: Int = 64,
                           shingleSize: Int = 3, numHashes: Int = 64,
                           bands: Int = 16,
                           watermark: String = "10 minutes",
                           evictAfterMs: Long = 10 * 60 * 1000L)
    : Dataset[NearDupFlag] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    // project/cast FIRST, watermark AFTER: an alias or cast applied on
    // top of a watermarked column mints a new attribute without the
    // watermark tag, and the event-time-timeout check then fails
    val banded = docs
      .select(col(tsCol).cast("timestamp").as("ts"),
        col(idCol).cast("string").as("docId"),
        graft.plans.SketchFunctions
          .minhashSignature(col(textCol), shingleSize, numHashes).as("sig"))
      .withWatermark("ts", watermark)
      .select(col("ts"), col("docId"), col("sig"),
        explode(graft.operators.Dedup.lshBandKeys(col("sig"), bands,
          rowsPerBand)).as("bk"))
      .select(col("ts"), col("bk.band").as("band"),
        col("bk.bandHash").as("bandHash"), col("docId"), col("sig"))
      .as[BandedDocT]
    banded
      .groupByKey(d => (d.band, d.bandHash))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, Long), batch: Iterator[BandedDocT],
         state: GroupState[BucketState]) =>
          evictingKernel(key, batch, state, threshold, maxBucket,
            evictAfterMs))
  }

  /** The per-bucket kernel of [[nearDupFlagsEvicting]], extracted so
    * the same-micro-batch lapse path is directly unit-testable with
    * `TestGroupState` — through `processAllAvailable` the engine's
    * extra timeout batch always runs before new data can reach a
    * lapsed bucket, so that path can never be exercised end-to-end
    * deterministically. */
  private[streaming] def evictingKernel(
      key: (Int, Long), batch: Iterator[BandedDocT],
      state: GroupState[BucketState],
      threshold: Double, maxBucket: Int, evictAfterMs: Long)
    : Iterator[NearDupFlag] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val prior = state.getOption
      val wm = state.getCurrentWatermarkMs()
      // honour the horizon in the data branch: a lapsed bucket
      // (stored expiry behind the watermark) receiving data in the
      // very micro-batch its timeout would have fired gets
      // hasTimedOut=false with the stale state intact — drop the
      // lapsed signatures BEFORE comparing
      val sigs0 = prior match {
        case Some(s) if s.expireAtMs <= wm => Nil
        case Some(s)                       => s.sigs
        case None                          => Nil
      }
      var sigs = sigs0
      val out = scala.collection.mutable.ArrayBuffer.empty[NearDupFlag]
      var maxTs = Long.MinValue
      batch.foreach { d =>
        if (d.ts != null && d.ts.getTime > maxTs) maxTs = d.ts.getTime
        sigs = compareAndStore(d.docId, d.sig, key._1, sigs,
          threshold, maxBucket, out)
      }
      // expire once the WATERMARK passes last-arrival + horizon; fall
      // back to watermark + horizon for all-null-ts batches. The
      // expiry is rounded UP to evictAfterMs/4 granularity so a hot
      // bucket's horizon advances once per granularity step, not once
      // per micro-batch. The engine requires a timeout strictly beyond
      // the current watermark (a late straggler's ts can sit behind
      // it).
      val base = if (maxTs != Long.MinValue) maxTs else wm
      val g = math.max(1L, evictAfterMs / 4)
      val exact = math.max(base + evictAfterMs, wm + 1)
      val expireAt = ((exact + g - 1) / g) * g
      // write state + timeout only when something changed:
      // compareAndStore conses only when it stores, so reference
      // equality detects an unchanged signature list; a capped hot
      // bucket with a non-advancing coarsened horizon pays zero state
      // writes per batch
      if (prior.isEmpty || !(sigs eq prior.get.sigs) ||
          expireAt != prior.get.expireAtMs) {
        state.update(BucketState(sigs, expireAt))
        state.setTimeoutTimestamp(expireAt)
      }
      out.iterator
    }
  }
}
