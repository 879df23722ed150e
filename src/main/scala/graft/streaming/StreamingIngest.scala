package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full streaming arrival path of a training-data pipeline as ONE
  * structured stream: stateless quality/language annotation → quality
  * gate → watermark-bounded exact dedup → benchmark-decontamination
  * gate. Each stage is the streaming face of an existing batch
  * operator; this object owns only their composition.
  *
  * Stateful-operator ordering is deliberate: the dedup
  * (`dropDuplicatesWithinWatermark`) runs BEFORE the decontamination
  * aggregation — the chaining Structured Streaming supports in Append
  * mode — and decontamination is a SINGLE stateful aggregation keyed
  * by (ts, id): the unique arrival key keeps groups one-document
  * wide, non-key columns ride along as `first()` aggregates (state
  * never keys on document text), and the per-benchmark coverage
  * maximum is computed from the collected hit list with higher-order
  * array functions so no second stateful aggregation is needed.
  * Benchmark shingles join broadcast (eval suites are MBs against a
  * corpus stream), so per-micro-batch cost is scan + one broadcast
  * join + per-doc state behind the watermark.
  */
object StreamingIngest {

  /** Annotate, gate, dedup and decontaminate a document stream.
    *
    * @param docs       streaming frame with event-time `ts`, `idCol`,
    *                   `textCol`
    * @param benchmark  static eval-suite frame with `idCol`, `textCol`
    * @param minQuality drop arrivals scoring below this
    * @param maxBenchCoverage drop arrivals whose distinct-shingle
    *                   coverage of ANY benchmark doc reaches this
    * Emits surviving rows + `language`/`qualityScore`/`nTokens`/
    * `maxBenchCoverage` in Append mode.
    */
  def ingest(docs: DataFrame, benchmark: DataFrame, textCol: String,
             idCol: String, minQuality: Double = 0.2,
             maxBenchCoverage: Double = 0.6, shingleSize: Int = 3,
             watermark: String = "10 minutes",
             cache: graft.core.CacheHandle =
               graft.core.CacheHandle()): DataFrame = {
    val annotated = docs
      .withColumn("language", TextAnalysis.languageId(col(textCol)))
      .withColumn("qualityScore", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("nTokens", TextAnalysis.tokenCount(col(textCol)))
      .filter(col("qualityScore") >= minQuality)

    val deduped = StreamingDedup.exactDedup(annotated, textCol, watermark)

    val benchShingled = benchmark.select(col(idCol).as("benchId"),
      explode(graft.plans.SketchFunctions
        .distinctShingles(col(textCol), shingleSize)).as("__shingle"))
    // the benchmark index is STATIC but rides inside a streaming plan:
    // without the persist, every micro-batch re-executes the shingle
    // explode + groupBy + self-join (measured 3.3s -> 2.9s per 2k-row
    // micro-batch at 10x corpus scale with a 50-doc benchmark; the gap
    // grows with real MB-scale eval suites). The handle lives as long
    // as the query; release it after query.stop()
    val benchIdx = cache.persist(benchShingled.join(
      benchShingled.groupBy("benchId")
        .agg(count(lit(1)).as("benchShingles")), "benchId"))

    val keys = deduped.columns.toSeq
    val exploded = deduped.select(keys.map(col) :+
      explode_outer(graft.plans.SketchFunctions
        .distinctShingles(col(textCol), shingleSize)).as("__shingle"): _*)
    val hits = exploded.join(broadcast(benchIdx), Seq("__shingle"), "left")

    val carried = keys.filterNot(c => c == "ts" || c == idCol)
    val aggs: Seq[Column] = carried.map(c => first(col(c)).as(c)) :+
      collect_list(when(col("benchId").isNotNull,
        struct(col("benchId"), col("benchShingles")))).as("__hits")
    val perDoc = hits.groupBy(col("ts"), col(idCol))
      .agg(aggs.head, aggs.tail: _*)

    val coverage = array_max(transform(
      array_distinct(transform(col("__hits"), h => h.getField("benchId"))),
      b => {
        val m = filter(col("__hits"), h => h.getField("benchId") === b)
        size(m).cast("double") /
          element_at(m, 1).getField("benchShingles").cast("double")
      }))
    perDoc
      .withColumn("maxBenchCoverage", coalesce(coverage, lit(0.0)))
      .filter(col("maxBenchCoverage") < maxBenchCoverage)
      .drop("__hits")
  }
}
