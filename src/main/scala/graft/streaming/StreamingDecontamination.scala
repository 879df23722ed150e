package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming benchmark decontamination — the incremental counterpart
  * of [[graft.operators.Decontamination]] (beyond the batch-only
  * reference, SURVEY §2.11).
  *
  * The benchmark (eval-suite) side is STATIC and small — megabytes
  * against a petabyte corpus stream — so the whole check is a
  * stateless stream-static broadcast join: each micro-batch of corpus
  * documents is shingled with the native one-pass expression, joined
  * against the broadcast benchmark shingle index, and aggregated to
  * per-(corpus, benchmark) overlap counts WITHIN the document's own
  * rows (the groupBy key includes the corpus id, which is unique per
  * arriving document, so the aggregation needs no cross-batch state
  * and runs in Append mode behind a watermark). Contamination verdicts
  * therefore stream out with one micro-batch of latency and zero
  * state beyond the watermark bookkeeping.
  */
object StreamingDecontamination {

  /** Per-(corpusId, benchId) coverage rows for a corpus document
    * stream against a static benchmark frame. Input stream needs an
    * event-time column `ts`; emits
    * (ts, corpusId, benchId, overlap, benchShingles, coverage) in
    * Append mode.
    *
    * `minCoverage` pre-filters verdicts (0.0 emits every overlapping
    * pair). The benchmark index is computed once per (re)start and
    * broadcast — recompute is trivial because eval suites are small by
    * definition; re-deploy to pick up benchmark changes.
    *
    * `bloomPrefilter` additionally folds the benchmark shingles into a
    * Bloom filter at stream build time (static side, one eager job)
    * and drops non-matching corpus shingles inside the micro-batch's
    * scan stage before the join — same exact-equivalence argument as
    * [[graft.operators.Decontamination.contaminationPairsBloom]] (no
    * false negatives; the join removes false positives), and the same
    * payoff: the per-batch join sees only the plausibly-contaminated
    * slice of the stream. */
  def coverageStream(corpusStream: DataFrame, benchmark: DataFrame,
                     textCol: String, idCol: String,
                     shingleSize: Int = 3,
                     minCoverage: Double = 0.0,
                     watermark: String = "10 minutes",
                     bloomPrefilter: Boolean = false,
                     expectedShingles: Long = 1000000L,
                     numBits: Long = 8388608L): DataFrame = {
    val bench = benchmark.select(
      col(idCol).as("benchId"),
      explode(graft.plans.SketchFunctions
        .distinctShingles(col(textCol), shingleSize)).as("shingle"))
    val benchSizes = bench.groupBy("benchId")
      .agg(count(lit(1)).as("benchShingles"))
    val shingledStream = corpusStream
      .withWatermark("ts", watermark)
      .select(col("ts"), col(idCol).as("corpusId"),
        explode(graft.plans.SketchFunctions
          .distinctShingles(col(textCol), shingleSize)).as("shingle"))
    val prefiltered =
      if (!bloomPrefilter) shingledStream
      else shingledStream.filter(
        graft.operators.Decontamination.bloomShinglePredicate(
          bench, expectedShingles, numBits))
    prefiltered
      .join(broadcast(bench), Seq("shingle"))
      // corpusId is unique per arriving document, so this aggregation
      // never needs rows from another document: grouping on the
      // watermarked event time keeps Spark's state bounded and lets
      // results emit as the watermark passes each document's timestamp
      .groupBy(col("ts"), col("corpusId"), col("benchId"))
      .agg(count(lit(1)).as("overlap"))
      .join(broadcast(benchSizes), Seq("benchId"))
      .withColumn("coverage",
        col("overlap").cast("double") / col("benchShingles"))
      .filter(col("coverage") >= minCoverage)
      .select("ts", "corpusId", "benchId", "overlap", "benchShingles",
        "coverage")
  }
}
