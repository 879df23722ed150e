package graft.finemap

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

import scala.io.Source

/** Parity tests against the reference CARMA fixtures
  * (reference: tests/gentropy/method/test_carma.py with
  * tests/gentropy/data_samples/01_test_{z,ld}.csv + 01_test_PIPs.txt). */
class CarmaSpec extends AnyFunSuite {

  private val sampleDir = "/root/reference/tests/gentropy/data_samples"

  private def readLines(path: String): Seq[String] = {
    val src = Source.fromFile(path)
    try src.getLines().toList finally src.close()
  }

  private lazy val z: DenseVector[Double] = DenseVector(
    readLines(s"$sampleDir/01_test_z.csv").drop(1)
      .map(_.split(",")(1).toDouble).toArray)

  private lazy val ld: DenseMatrix[Double] = {
    val rows = readLines(s"$sampleDir/01_test_ld.csv")
      .map(_.split(",").map(_.toDouble))
    DenseMatrix(rows: _*)
  }

  private lazy val expectedPips: Array[Double] =
    readLines(s"$sampleDir/01_test_PIPs.txt").drop(1).map(_.toDouble).toArray

  private def corr(a: Array[Double], b: Array[Double]): Double = {
    val ma = a.sum / a.length
    val mb = b.sum / b.length
    val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val va = a.map(x => (x - ma) * (x - ma)).sum
    val vb = b.map(x => (x - mb) * (x - mb)).sum
    cov / math.sqrt(va * vb)
  }

  test("spike-slab noEM PIPs correlate with the reference fixture") {
    val out = Carma.carmaSpikeSlabNoEM(z = z, ld = ld)
    val pips = out.pips.get
    assert(math.round(corr(pips, expectedPips) * 100) / 100.0 == 1.0,
      s"corr=${corr(pips, expectedPips)}")
  }

  test("outlier detection flags SNP 5") {
    val out = Carma.carmaSpikeSlabNoEM(z = z, ld = ld)
    assert(out.outliers.contains(List(5)), s"outliers=${out.outliers}")
  }

  test("MCS_modified + PIP_func reproduce the PIPs directly") {
    val mcs = Carma.mcsModified(
      z = z, ldMatrix = ld, outlierBFIndex = 1.0 / 3.2,
      inputConditionalSList = None, lambdaVal = 1,
      epsilon = 1e-5 * 21, outlierSwitch = true, tau = 0.04,
      rng = new scala.util.Random(2024))
    val pips = Carma.pipFunc(
      mcs.bList.map(_._1), mcs.bList.map(_._2), p = 21, numCausal = 10)
    assert(math.round(corr(pips, expectedPips) * 100) / 100.0 == 1.0,
      s"corr=${corr(pips, expectedPips)}")
  }

  test("liberal time limit returns PIPs; zero limit returns None") {
    val ok = Carma.timeLimitedCarmaSpikeSlabNoEM(z, ld, secThreshold = 600)
    assert(ok.pips.isDefined && ok.outliers.isDefined)
    val timedOut = Carma.timeLimitedCarmaSpikeSlabNoEM(z, ld, secThreshold = 0.001)
    assert(timedOut.pips.isEmpty && timedOut.outliers.isEmpty)
  }

  test("eigen outlier test matches the matrix-path ridge formulation") {
    // outlierTestEigen must equal the original [ridge-search +
    // outlierLikelihood twice] computation on random PSD LD blocks —
    // the shared-eigenbasis path is an analytic refactor, not a new
    // approximation. Small relative slack: the two golden-section
    // searches run in different arithmetic and can stop an ulp apart
    // on the (flat-at-minimum) objective.
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 25) {
      val p = 3 + rnd.nextInt(6)
      val a = DenseMatrix.tabulate(p, p)((_, _) => rnd.nextGaussian())
      val raw = a * a.t
      val sigma = DenseMatrix.tabulate(p, p)((i, j) =>
        raw(i, j) / math.sqrt(raw(i, i) * raw(j, j)))
      val zv = DenseVector.tabulate(p)(_ => rnd.nextGaussian() * 3)
      val k = 2 + rnd.nextInt(p - 1)
      val testS = rnd.shuffle((0 until p).toList).take(k).sorted.toArray
      val tau = 0.04
      val n = testS.length
      val modiLdS0 = DenseMatrix.tabulate(n, n)((x, y) =>
        sigma(testS(x), testS(y)))
      val xOpt = SusieInf.minimizeScalar(
        x => Carma.ridgeFun(x, sigma, modiLdS0, testS, zv, tau), 0.0, 1.0)
      val modiLd = modiLdS0 * xOpt + DenseMatrix.eye[Double](n) * (1.0 - xOpt)
      val modiSigma = sigma.copy
      for (x <- 0 until n; y <- 0 until n)
        modiSigma(testS(x), testS(y)) = modiLd(x, y)
      val expected = -math.abs(
        Carma.outlierLikelihood(testS, sigma, zv, tau) -
          Carma.outlierLikelihood(testS, modiSigma, zv, tau))
      val got = Carma.outlierTestEigen(testS, sigma, zv, tau)
      assert(math.abs(got - expected) <=
        1e-5 * math.max(1.0, math.abs(expected)),
        s"p=$p testS=${testS.mkString(",")} got=$got expected=$expected")
    }
  }

  test("rank-deficient block (duplicate variants) still removes the candidate") {
    // |r|=1 duplicate columns make Σ_S singular: at x=1 the eigen path
    // drops a spectral dimension and olik(1.0) is exactly −∞. Before
    // the non-finite guard, a −∞ − −∞ difference turned into NaN and
    // exp(NaN) < outlierBFIndex was false — the candidate was KEPT,
    // diverging from the matrix path which removes it. The contract is
    // DECISION parity on singular blocks: both paths must remove.
    val outlierBFIndex = 1.0 / 3.2
    val sigma = DenseMatrix(
      (1.0, 1.0, 0.3),
      (1.0, 1.0, 0.3),
      (0.3, 0.3, 1.0))
    val zv = DenseVector(4.0, 4.0, 0.5)
    val testS = Array(0, 1, 2)
    val tau = 0.04
    val got = Carma.outlierTestEigen(testS, sigma, zv, tau)
    assert(!got.isNaN, s"eigen path returned NaN on a singular block")
    assert(math.exp(got) < outlierBFIndex,
      s"eigen path kept the candidate on a singular block: got=$got")
    // matrix-path decision on the same block
    val n = testS.length
    val modiLdS0 = DenseMatrix.tabulate(n, n)((x, y) => sigma(testS(x), testS(y)))
    val xOpt = SusieInf.minimizeScalar(
      x => Carma.ridgeFun(x, sigma, modiLdS0, testS, zv, tau), 0.0, 1.0)
    val modiLd = modiLdS0 * xOpt + DenseMatrix.eye[Double](n) * (1.0 - xOpt)
    val modiSigma = sigma.copy
    for (x <- 0 until n; y <- 0 until n)
      modiSigma(testS(x), testS(y)) = modiLd(x, y)
    val matrixBF = -math.abs(
      Carma.outlierLikelihood(testS, sigma, zv, tau) -
        Carma.outlierLikelihood(testS, modiSigma, zv, tau))
    assert(matrixBF.isNaN || math.exp(matrixBF) < outlierBFIndex,
      s"matrix path kept the candidate: $matrixBF — decision parity broken")
  }

  test("priors and marginal likelihood match reference doctest values") {
    // reference: src/gentropy/method/carma.py doctests
    assert(math.abs(Carma.priorDist(3, 1.0, 4) - (-3.17805)) < 1e-4)
    val sigma = DenseMatrix((1.0, 0.5, 0.2), (0.5, 1.0, 0.3), (0.2, 0.3, 1.0))
    val zv = DenseVector(10.0, 11.0, 10.0)
    val m = Carma.marginalLikelihood(Array(0, 1), sigma, zv, tau = 1.0)
    assert(math.abs(m - 43.60579) < 1e-4, s"marginal=$m")
    val zo = DenseVector(0.1, 0.2, 0.3)
    val o = Carma.outlierLikelihood(Array(0, 1, 2), sigma, zo, tau = 1.0 / 0.0025)
    assert(math.abs(o - (-8.8497)) < 1e-3, s"outlier=$o")
  }
}
