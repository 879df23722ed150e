package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-state canary shared by the long-form artifact recorders
  * (ChainBench, StreamBench) — the chain/stream analogue of
  * `Bench`'s pinned-query gate.
  *
  * The trust problem with absolute chain numbers is machine state:
  * the r11 100× colocalisation stage measured 53 s quiesced vs 256 s
  * when run right after two other 90 g chains (same code, same
  * rows). The bench suite already refuses to record while a pinned
  * cheap query runs >25% over its fresh-box cost; this applies the
  * same protocol with a data-independent probe, so the recorder can
  * run before ANY input exists and the probe cost never moves with
  * the workload under test.
  *
  * The probe is a fixed-size xxhash64 fold over `spark.range` — pure
  * whole-stage-codegen CPU across 32 fixed partitions, no input, no
  * shuffle, ~1 s on the quiesced build box. It detects CPU/scheduler
  * contention (the dominant inflation mode observed); page-cache
  * state on the INPUT it cannot see, which is why cold-read stages
  * additionally document their cold/warm spread in the artifact.
  */
object MachineCanary {

  /** Fresh quiesced cost of [[probeSec]] on the build box (measured
    * r12). Override with SPARK_GRAFT_CHAIN_CANARY_REF on other hosts;
    * <= 0 records a single probe without gating. */
  def refSec: Double =
    sys.env.get("SPARK_GRAFT_CHAIN_CANARY_REF").map(v =>
      v.toDoubleOption.getOrElse(throw new IllegalArgumentException(
        s"SPARK_GRAFT_CHAIN_CANARY_REF must be a number (e.g. 1.0), got '$v'")))
      .getOrElse(1.0)

  val MaxRatio = 1.25

  /** One probe run: fold xxhash64 over a pinned 300M-row range in 32
    * fixed partitions (REPARTITION-free: range emits exactly the
    * requested slices, so AQE cannot re-plan it). The hash is bounded
    * with pmod before summing — ANSI mode (Spark 4 default) turns the
    * raw sum of 300M full-range longs into an overflow error. */
  def probeSec(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0L, 300000000L, 1L, 32)
      .select(sum(pmod(xxhash64(col("id")), lit(1000000L)))).head()
    (System.nanoTime() - t0) / 1e9
  }

  /** Gate: probe, and while the ratio to [[refSec]] exceeds
    * [[MaxRatio]], quiesce and retry (bounded attempts). Returns the
    * FINAL ratio either way — the caller embeds it in the artifact so
    * a reader can judge how much machine state the numbers carry.
    * A non-positive [[refSec]] skips the retry loop (unknown host). */
  def gatedRatio(spark: SparkSession, attempts: Int = 3,
                 quiesceMs: Long = 30000): Double = {
    val ref = refSec
    var ratio = -1.0
    var attempt = 0
    val maxAttempts = if (ref > 0) attempts else 1
    while (attempt < maxAttempts && (ratio < 0 || ratio > MaxRatio)) {
      if (attempt > 0) {
        System.err.println(f"[canary] ratio $ratio%.2f > $MaxRatio — " +
          "quiescing before retry")
        System.gc(); Thread.sleep(quiesceMs)
      }
      val sec = probeSec(spark)
      ratio = if (ref > 0) sec / ref else -1.0
      System.err.println(f"[canary] probe $sec%.2f s (ref $ref%.2f, " +
        f"ratio $ratio%.2f)")
      attempt += 1
    }
    ratio
  }
}
