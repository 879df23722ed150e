package graft.finemap

import breeze.linalg.{DenseMatrix, DenseVector, eigSym, sum}

/** RAISS summary-statistics imputation: estimate z-scores of untyped
  * SNPs from typed neighbours through a regularised LD inversion.
  *
  * Semantics match the reference
  * (reference: src/gentropy/method/sumstat_imputation.py:14-172):
  * diagonal loading (lambda), eigenvalue-thresholded pseudo-inverse
  * (rtol), variance bounds, R² rescaling of the imputed mean.
  */
object Raiss {

  case class Imputation(
    mu: DenseVector[Double], // imputed z-scores
    variance: DenseVector[Double],
    ldScore: DenseVector[Double],
    imputationR2: DenseVector[Double])

  /** Eigenvalue-thresholded pseudo-inverse of the (diagonally loaded)
    * known-LD matrix. */
  private[finemap] def invertSigT(sigT0: DenseMatrix[Double], lamb: Double,
                                  rtol: Double): DenseMatrix[Double] = {
    val p = sigT0.rows
    val sigT = sigT0.copy
    var i = 0
    while (i < p) { sigT(i, i) = 1.0 + lamb; i += 1 }
    val es = eigSym(sigT)
    val maxEv = breeze.linalg.max(es.eigenvalues.map(math.abs))
    val inv = DenseMatrix.zeros[Double](p, p)
    var k = 0
    while (k < p) {
      val ev = es.eigenvalues(k)
      if (math.abs(ev) > rtol * maxEv) {
        val vk = es.eigenvectors(::, k)
        val w = 1.0 / ev
        var a = 0
        while (a < p) {
          var b = 0
          val va = vk(a) * w
          while (b < p) { inv(a, b) += va * vk(b); b += 1 }
          a += 1
        }
      }
      k += 1
    }
    inv
  }

  /** Impute z-scores for untyped SNPs.
    *
    * @param zKnown        z-scores of typed SNPs (length t)
    * @param ldKnown       t x t LD among typed SNPs
    * @param ldMissingKnown i x t LD between untyped and typed SNPs
    */
  def raissModel(
      zKnown: DenseVector[Double],
      ldKnown: DenseMatrix[Double],
      ldMissingKnown: DenseMatrix[Double],
      lamb: Double = 0.01,
      rtol: Double = 0.01): Imputation = {
    val sigTInv = invertSigT(ldKnown, lamb, rtol)
    val nMissing = ldMissingKnown.rows

    val mu0 = ldMissingKnown * (sigTInv * zKnown)
    // var_i = (1+lamb) - sig_i_t sig_t_inv sig_i_t'
    val variance = DenseVector.tabulate(nMissing) { i =>
      val row = ldMissingKnown(i, ::).t
      (1.0 + lamb) - (row dot (sigTInv * row))
    }
    val ldScore = DenseVector.tabulate(nMissing) { i =>
      sum(ldMissingKnown(i, ::).t.map(x => x * x))
    }
    val varNorm = variance.map { v0 =>
      if (v0 < 0) 0.0 else if (v0 > 0.99999 + lamb) 1.0 else v0
    }
    val r2 = varNorm.map(v0 => (1.0 + lamb) - v0)
    val mu = DenseVector.tabulate(nMissing)(i => mu0(i) / math.sqrt(r2(i)))
    Imputation(mu, variance, ldScore, variance.map(v0 => 1.0 - v0))
  }
}
