package graft.finemap

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

class SusieInfSpec extends AnyFunSuite {

  /** Correlated-pair LD helper. */
  private def ldWithPair(p: Int, a: Int, b: Int, r: Double): DenseMatrix[Double] = {
    val ld = DenseMatrix.eye[Double](p)
    ld(a, b) = r
    ld(b, a) = r
    ld
  }

  test("single strong signal concentrates PIP on the causal SNP") {
    val p = 20
    val z = DenseVector.zeros[Double](p)
    z(7) = 8.0 // genome-wide significant
    val res = SusieInf.susieInf(z, DenseMatrix.eye[Double](p), n = 10000, L = 3)
    val pip = SusieInf.marginalPip(res)
    assert(pip(7) > 0.95, s"pip(7)=${pip(7)}")
    assert((0 until p).filter(_ != 7).map(pip(_)).max < 0.1)
    val cred = SusieInf.credInf(res.pip, DenseMatrix.eye[Double](p))
    assert(cred.exists(_.contains(7)))
  }

  test("two independent signals are assigned to separate effects") {
    val p = 30
    val z = DenseVector.zeros[Double](p)
    z(3) = 7.0
    z(21) = 6.5
    val res = SusieInf.susieInf(z, DenseMatrix.eye[Double](p), n = 10000, L = 5)
    val pip = SusieInf.marginalPip(res)
    assert(pip(3) > 0.9 && pip(21) > 0.9)
    val cred = SusieInf.credInf(res.pip, DenseMatrix.eye[Double](p))
    assert(cred.exists(_.contains(3)) && cred.exists(_.contains(21)))
  }

  test("LD-shared signal spreads PIP across the correlated pair") {
    val p = 10
    val ld = ldWithPair(p, 2, 3, 0.98)
    val z = DenseVector.zeros[Double](p)
    z(2) = 6.0
    z(3) = 5.9 // nearly the same association through LD
    val res = SusieInf.susieInf(z, ld, n = 10000, L = 2)
    val pip = SusieInf.marginalPip(res)
    assert(pip(2) + pip(3) > 0.9)
    assert(pip(2) < 0.9 && pip(3) < 0.9) // neither resolves alone
    // the 99% credible set must contain both, and survives purity 0.5
    val cred = SusieInf.credInf(res.pip, ld)
    assert(cred.exists(cs => cs.contains(2) && cs.contains(3)))
  }

  test("null z-scores give diffuse PIPs and no credible set") {
    val p = 15
    val res = SusieInf.susieInf(DenseVector.zeros[Double](p),
      DenseMatrix.eye[Double](p), n = 10000, L = 2)
    val pip = SusieInf.marginalPip(res)
    assert(breeze.linalg.max(pip) < 0.5)
    // uniform PIP columns -> credible sets cover most of the locus and
    // fail the purity filter against identity off-diagonals
    val cred = SusieInf.credInf(res.pip, DenseMatrix.eye[Double](p))
    assert(cred.forall(_.size == 1) || cred.isEmpty)
  }

  test("golden-section minimiser finds bounded minimum") {
    val x = SusieInf.minimizeScalar(v => (v - 0.3) * (v - 0.3), 0.0, 1.0)
    assert(math.abs(x - 0.3) < 1e-5)
    val edge = SusieInf.minimizeScalar(v => v, 0.0, 1.0)
    assert(edge < 1e-5)
  }
}

class RaissSpec extends AnyFunSuite {

  test("imputation recovers z of a perfectly correlated missing SNP") {
    // typed SNPs 0,1; missing SNP correlated 0.99 with typed 0
    val zKnown = DenseVector(5.0, 0.5)
    val ldKnown = DenseMatrix((1.0, 0.1), (0.1, 1.0))
    val ldMissing = DenseMatrix((0.99, 0.1))
    val imp = Raiss.raissModel(zKnown, ldKnown, ldMissing)
    assert(math.abs(imp.mu(0) - 5.0) < 0.5, s"mu=${imp.mu(0)}")
    assert(imp.imputationR2(0) > 0.9)
    assert(imp.ldScore(0) > 0.9)
  }

  test("uncorrelated missing SNP imputes to ~0 with low R2") {
    val zKnown = DenseVector(5.0, 0.5)
    val ldKnown = DenseMatrix((1.0, 0.1), (0.1, 1.0))
    val ldMissing = DenseMatrix((0.0, 0.0))
    val imp = Raiss.raissModel(zKnown, ldKnown, ldMissing)
    assert(math.abs(imp.mu(0)) < 1e-9)
    assert(imp.imputationR2(0) < 0.1)
  }

  test("regularised inversion is stable on a singular LD matrix") {
    val ldKnown = DenseMatrix((1.0, 1.0), (1.0, 1.0)) // rank 1
    val inv = Raiss.invertSigT(ldKnown, lamb = 0.01, rtol = 0.01)
    assert(inv.forall(v => !v.isNaN && !v.isInfinite))
  }
}
