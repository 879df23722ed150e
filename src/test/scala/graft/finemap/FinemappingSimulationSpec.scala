package graft.finemap

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite

class FinemappingSimulationSpec extends AnyFunSuite {

  /** Block LD: within-block r, identity across blocks. */
  private def blockLd(p: Int, blockSize: Int, r: Double): DenseMatrix[Double] =
    DenseMatrix.tabulate[Double](p, p) { (i, j) =>
      if (i == j) 1.0
      else if (i / blockSize == j / blockSize) r
      else 0.0
    }

  test("simulated z-scores concentrate at causal sites") {
    val u = DenseMatrix.eye[Double](50)
    val rng = new scala.util.Random(7)
    val sim = FinemappingSimulation.simSumstatFromLd(
      nCausal = 2, he2RegGen = 0.003, u = u, n = 100000, rng = rng)
    assert(sim.causal.size == 2)
    val causalMin = sim.causal.map(i => math.abs(sim.z(i))).min
    val nullMax = (0 until 50).filterNot(sim.causal.contains)
      .map(i => math.abs(sim.z(i))).max
    // Tau = 150: causal |z| ~ N(0, sqrt(150)) >> null |z| ~ N(0,1)
    // (probabilistic but overwhelmingly separated at this heritability)
    assert(causalMin > 2.0 || nullMax < causalMin,
      s"causalMin=$causalMin nullMax=$nullMax")
  }

  test("benchmark recovers causal SNPs with high accuracy on block LD") {
    val u = blockLd(p = 40, blockSize = 4, r = 0.4)
    val summary = FinemappingSimulation.benchmark(
      nIter = 8, u = u, nCausal = 2, he2RegGen = 0.005,
      sampleSize = 100000, L = 5, seed = 11L)
    assert(summary.successfulRuns >= 6, summary.toString)
    assert(summary.numberOfCs > 0)
    assert(summary.accuracy > 0.7, summary.toString)
    assert(summary.accuracyLead > 0.6, summary.toString)
    assert(summary.sensitivity > 0.4, summary.toString)
  }

  test("CARMA-guarded chain also runs through the simulation") {
    val u = blockLd(p = 20, blockSize = 4, r = 0.3)
    val summary = FinemappingSimulation.benchmark(
      nIter = 2, u = u, nCausal = 1, he2RegGen = 0.005,
      sampleSize = 100000, L = 3, runCarma = true, seed = 5L)
    assert(summary.successfulRuns >= 1, summary.toString)
    assert(summary.accuracy > 0.5, summary.toString)
  }
}
