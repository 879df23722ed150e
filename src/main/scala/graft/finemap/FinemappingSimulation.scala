package graft.finemap

import breeze.linalg.{diag, eigSym, DenseMatrix, DenseVector}

import scala.util.Random

/** Fine-mapping accuracy simulation benchmark.
  *
  * Simulates GWAS z-scores from a known causal configuration and an LD
  * matrix, runs the (optionally CARMA-guarded) SuSiE-inf chain, and
  * scores the resulting credible sets against the truth — the
  * reference's simulation harness
  * (reference: src/gentropy/finemapping_simulations.py:16-260)
  * without the pandas round-trips: the whole loop is a driver-side
  * kernel over Breeze structures, and the same per-locus kernel is
  * what [[DistributedFineMapper]] runs on executors.
  */
object FinemappingSimulation {

  /** |z| threshold equivalent to p ≤ 5e-8 (two-sided). */
  private val GenomeWideZ = 5.45131

  case class Simulated(z: DenseVector[Double], causal: Set[Int])

  /** Simulate a z-score vector with `nCausal` causal SNPs explaining
    * `he2RegGen` heritability: joint z at causal sites ~
    * N(0, n·he2/nCausal), marginal mean U·jz, observation noise
    * MVN(0, U) via the symmetric square root.
    * reference: finemapping_simulations.py:187-229 */
  def simSumstatFromLd(nCausal: Int, he2RegGen: Double, u: DenseMatrix[Double],
                       n: Int, rng: Random): Simulated = {
    val m = u.rows
    val tau = n * he2RegGen / nCausal
    val causal = rng.shuffle((0 until m).toList).take(nCausal)
    val jz = DenseVector.zeros[Double](m)
    causal.foreach(i => jz(i) = rng.nextGaussian() * math.sqrt(tau))
    val muz = u * jz
    val es = eigSym(u)
    val sqrtU = es.eigenvectors *
      diag(es.eigenvalues.map(v => math.sqrt(math.max(v, 0.0)))) *
      es.eigenvectors.t
    val eps = DenseVector.fill(m)(rng.nextGaussian())
    Simulated(muz + sqrtU * eps, causal.toSet)
  }

  /** One credible set's score against the truth. */
  case class CsScore(iteration: Int, csIndex: Int, size: Int,
                     containsCausal: Boolean, leadIsCausal: Boolean)

  case class Summary(successfulRuns: Int, numberOfCs: Int,
                     expectedResults: Int, falsePositiveRate: Double,
                     accuracy: Double, accuracyLead: Double,
                     sensitivity: Double)

  /** Run `nIter` simulation cycles; iterations whose strongest signal
    * misses genome-wide significance are skipped, as in the reference.
    * reference: finemapping_simulations.py:43-186 */
  def simulationLoop(nIter: Int, u: DenseMatrix[Double], nCausal: Int,
                     he2RegGen: Double, sampleSize: Int,
                     L: Int = 10, runCarma: Boolean = false,
                     seed: Long = 2024L): (Seq[CsScore], Int) = {
    val rng = new Random(seed)
    val scores = Seq.newBuilder[CsScore]
    var successful = 0
    for (iter <- 0 until nIter) {
      val sim = simSumstatFromLd(nCausal, he2RegGen, u, sampleSize, rng)
      if (breeze.linalg.max(breeze.numerics.abs(sim.z)) >= GenomeWideZ) {
        val (z, ld, keptIdx) =
          if (!runCarma) (sim.z, u, (0 until u.rows).toArray)
          else {
            val out = Carma.timeLimitedCarmaSpikeSlabNoEM(sim.z, u,
              secThreshold = 600, seed = rng.nextLong())
            out.outliers match {
              case Some(outliers) if outliers.nonEmpty =>
                val keep = (0 until u.rows).filterNot(outliers.contains).toArray
                val sub = DenseMatrix.tabulate[Double](keep.length, keep.length) {
                  (a, b) => u(keep(a), keep(b))
                }
                (DenseVector(keep.map(sim.z(_))), sub, keep)
              case _ => (sim.z, u, (0 until u.rows).toArray)
            }
          }
        val res = SusieInf.susieInf(z, ld, n = sampleSize, L = L)
        val pip = SusieInf.marginalPip(res)
        val credSets = SusieInf.credInf(res.pip, ld)
        if (credSets.nonEmpty) {
          successful += 1
          credSets.zipWithIndex.foreach { case (cs, k) =>
            val orig = cs.map(keptIdx(_))
            val lead = orig.maxBy(i => pip(keptIdx.indexOf(i)))
            scores += CsScore(iter, k + 1, cs.size,
              containsCausal = orig.exists(sim.causal.contains),
              leadIsCausal = sim.causal.contains(lead))
          }
        }
      }
    }
    (scores.result(), successful)
  }

  /** Aggregate metrics, as the reference's ProvideSummary.
    * reference: finemapping_simulations.py:19-41 */
  def provideSummary(scores: Seq[CsScore], nCausal: Int,
                     successfulRuns: Int): Summary = {
    val n = scores.size
    val hits = scores.count(_.containsCausal)
    val leadHits = scores.count(_.leadIsCausal)
    Summary(
      successfulRuns = successfulRuns,
      numberOfCs = n,
      expectedResults = nCausal * successfulRuns,
      falsePositiveRate = if (n == 0) 0.0 else (n - hits).toDouble / n,
      accuracy = if (n == 0) 0.0 else hits.toDouble / n,
      accuracyLead = if (n == 0) 0.0 else leadHits.toDouble / n,
      sensitivity =
        if (successfulRuns == 0) 0.0
        else hits.toDouble / (nCausal * successfulRuns))
  }

  /** Convenience: loop + summary. */
  def benchmark(nIter: Int, u: DenseMatrix[Double], nCausal: Int,
                he2RegGen: Double, sampleSize: Int, L: Int = 10,
                runCarma: Boolean = false, seed: Long = 2024L): Summary = {
    val (scores, successful) = simulationLoop(nIter, u, nCausal, he2RegGen,
      sampleSize, L, runCarma, seed)
    provideSummary(scores, nCausal, successful)
  }
}
