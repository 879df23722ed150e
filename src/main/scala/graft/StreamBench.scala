package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput benchmark: sustained rows/sec and state-store
  * growth for the two stateful streaming surfaces, on a MemoryStream
  * fed with the ScaleUp-cloned document corpus (10× sf0.1 by
  * default). The streaming specs pin SEMANTICS on toy batches; this
  * main records the evidence they can't: how fast the micro-batch
  * loop drains at corpus scale and how large the state store gets
  * under a bounded watermark.
  *
  * Workloads:
  *  1. `ingest_chain` — [[graft.streaming.StreamingIngest.ingest]]:
  *     annotate → quality gate → watermark dedup → benchmark
  *     decontamination (two stateful operators).
  *  2. `incremental_exact_dedup` —
  *     [[graft.streaming.StreamingDedup.incrementalExactDedup]]:
  *     watermark digest state + stream-static anti-join against a
  *     corpus digest index.
  *
  * Each run feeds `batches` equal chunks, draining the query after
  * every chunk (processAllAvailable ⇒ each chunk is ≥1 real
  * micro-batch through the full stateful pipeline). Event time
  * advances ~1 minute per chunk, so a 10-minute watermark keeps ~10
  * chunks of digest state live — the steady-state shape, neither
  * unbounded nor trivially empty. State metrics come from the
  * engine's own progress events (stateOperators.numRowsTotal /
  * memoryUsedBytes), maxed over the run.
  *
  * Prints one JSON line:
  * {"stream_bench":{workload:{rows_in,rows_out,sec,rows_per_sec,
  * state_rows_max,state_mb_max,batches}},"scale":N,"docs":M}
  */
object StreamBench {

  // (ts, doc_id, text) — a tuple, not a nested case class: the
  // ExpressionEncoder's codegen cannot call a private member class'
  // field accessors
  private type Arrival = (java.sql.Timestamp, Long, String)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val batches = args.lift(2).map(_.toInt).getOrElse(25)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .appName("graft-stream-bench")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // copy-isomorphic 10x clone: real dedup structure scales exactly
    // Nx (see ScaleUp.scaleDocuments), so the digest state sees
    // genuine duplicates, not N identical copies
    val corpus = ScaleUp.scaleDocuments(docs0, factor)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val total = corpus.length
    val chunk = math.max(1, total / batches)
    System.err.println(s"[stream] corpus=$total docs, $batches chunks of ~$chunk")

    // event time advances one minute per chunk: with the 10-minute
    // watermark the engine provably EVICTS old digest state mid-run
    def arrivalsOf(rows: Array[(Long, String)], chunkIdx: Int): Seq[Arrival] =
      rows.toSeq.map { case (id, text) =>
        (new java.sql.Timestamp(1700000000000L + chunkIdx * 60000L),
          id, text)
      }

    def run(name: String,
            build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
      : (String, Long, Long, Double, Long, Double) = {
      val source = MemoryStream[Arrival]
      val out = build(source.toDF().toDF("ts", "doc_id", "text"))
      var rowsOut = 0L
      val query = out.writeStream
        .outputMode("append")
        .trigger(Trigger.ProcessingTime(0))
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          // exclude the end-of-stream flush sentinel from the tally
          rowsOut += df.filter(org.apache.spark.sql.functions
            .col("doc_id") >= 0).count()
        }
        .queryName(name)
        .start()
      var stateRowsMax = 0L
      var stateBytesMax = 0L
      val t0 = System.nanoTime()
      def drainAndSample(): Unit = {
        query.processAllAvailable()
        query.lastProgress match {
          case null => ()
          case p =>
            p.stateOperators.foreach { so =>
              stateRowsMax = math.max(stateRowsMax, so.numRowsTotal)
              stateBytesMax = math.max(stateBytesMax, so.memoryUsedBytes)
            }
        }
      }
      corpus.grouped(chunk).zipWithIndex.foreach { case (rows, i) =>
        source.addData(arrivalsOf(rows, i))
        drainAndSample()
      }
      // end-of-stream flush: one sentinel arrival far past the
      // watermark closes every pending aggregation group, so rows_out
      // reflects the whole corpus (append-mode aggregations emit a
      // group only when the watermark passes it)
      source.addData(Seq((new java.sql.Timestamp(
        1700000000000L + (batches + 60) * 60000L), -1L, "flush sentinel")))
      drainAndSample()
      val sec = (System.nanoTime() - t0) / 1e9
      query.stop()
      System.err.println(f"[stream] $name%-24s in=$total out=$rowsOut " +
        f"${total / sec}%.0f rows/s stateRows=$stateRowsMax " +
        f"stateMB=${stateBytesMax / 1e6}%.1f")
      (name, total.toLong, rowsOut, sec, stateRowsMax, stateBytesMax / 1e6)
    }

    // workload 1: full ingest chain (quality + dedup + decontamination)
    val benchmark = docs0.limit(50)
    val r1 = run("ingest_chain", in =>
      graft.streaming.StreamingIngest.ingest(in, benchmark,
        "text", "doc_id", minQuality = 0.0, maxBenchCoverage = 0.6))

    // workload 2: incremental exact dedup against a static corpus index
    // (the original 1x corpus stands in the index; its clones arrive)
    val index = graft.operators.IncrementalDedup
      .exactIndex(docs0, "text", "doc_id")
    val r2 = run("incremental_exact_dedup", in =>
      graft.streaming.StreamingDedup.incrementalExactDedup(in, index, "text"))

    val js = Seq(r1, r2).map { case (n, ri, ro, s, sr, mb) =>
      "\"" + n + "\":{\"rows_in\":" + ri + ",\"rows_out\":" + ro +
        f""","sec":$s%.2f,"rows_per_sec":${ri / s}%.0f""" +
        f""","state_rows_max":$sr,"state_mb_max":$mb%.1f,"batches":$batches}"""
    }.mkString("{", ",", "}")
    println(s"""{"stream_bench":$js,"scale":$factor,"docs":$total}""")
    spark.stop()
  }
}
