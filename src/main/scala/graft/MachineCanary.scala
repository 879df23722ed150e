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

  /** Direct per-stage effective-frequency probe — the decision rule
    * the r15 chain recordings lacked. This host's neighbor episodes
    * are FREQUENCY COLLAPSE, not scheduler steal: /proc/stat steal
    * stays ~0 while the guest's thread-CPU clock keeps accruing at
    * the normal rate as the core retires instructions slower — the
    * same standalone stage measured 515 vs 1,168 user-CPU s across
    * windows, so wall ≈ cpu/32 alone cannot certify a clean
    * recording. The probe runs a fixed ALU kernel (xorshift64) on a
    * duty-cycled daemon thread and reports ITERATIONS PER
    * THREAD-CPU-SECOND per stage window:
    *
    *  - frequency collapse → iterations retire slower while
    *    CLOCK_THREAD_CPUTIME advances normally → the rate DROPS in
    *    proportion to the collapse;
    *  - descheduling (true steal, or our own 32-way load crowding
    *    the probe out) → the thread-CPU clock stops with the thread →
    *    the rate is UNAFFECTED.
    *
    * Decision rule for an artifact reader: a stage whose spin_mips is
    * within ~25% of the committed quiet baseline has an honest
    * cpu_sec (wall ≈ cpu/32 then certifies compute-bound); a stage at
    * ≤60% of baseline is episode-contaminated and its cpu_sec is
    * inflated by roughly baseline/spin_mips. SMT-sibling contention
    * from our own full load costs the probe far less than the 2-12×
    * episodes do, and identically across stages of one run. */
  final class SpinProbe extends Thread("graft-spin-probe") {
    setDaemon(true)
    private val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    @volatile private var stopped = false
    private val iters = new java.util.concurrent.atomic.AtomicLong(0)
    private val cpuNs = new java.util.concurrent.atomic.AtomicLong(0)
    // ~4-6 ms of spin per 100 ms of sleep: ~5% of ONE thread (0.15%
    // of a 32-vCPU box) buys ≥50 samples on any stage over 5 s
    private val Chunk = 4000000L
    private var sink = 0x9E3779B97F4A7C15L

    override def run(): Unit =
      try {
        while (!stopped) {
          val c0 = tmx.getCurrentThreadCpuTime
          var i = 0L
          var x = sink
          while (i < Chunk) {
            x ^= x << 13; x ^= x >>> 7; x ^= x << 17
            i += 1
          }
          sink = x // kernel result observed — no dead-code elimination
          val c1 = tmx.getCurrentThreadCpuTime
          if (c1 > c0) {
            iters.addAndGet(Chunk)
            cpuNs.addAndGet(c1 - c0)
          }
          Thread.sleep(100)
        }
      } catch { case _: InterruptedException => () }

    /** Cumulative (iterations, thread-cpu-ns) since start. */
    def snapshot(): (Long, Long) = (iters.get, cpuNs.get)

    /** Million iterations per thread-cpu-second between two
      * snapshots; -1 when the window carried no complete chunk. */
    def mips(from: (Long, Long), to: (Long, Long)): Double = {
      val di = to._1 - from._1
      val dc = to._2 - from._2
      if (di <= 0 || dc <= 0) -1.0 else di / (dc / 1e9) / 1e6
    }

    def shutdown(): Unit = { stopped = true; interrupt() }
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
