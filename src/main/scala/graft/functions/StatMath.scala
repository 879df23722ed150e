package graft.functions

import org.apache.commons.math3.special.{Erf, Gamma}

/** Scalar statistical kernels, callable from generated Java code
  * (scalac emits static forwarders for top-level objects, so
  * `graft.functions.StatMath.normSf(x)` compiles inside whole-stage
  * codegen).
  *
  * Replaces the reference's scipy-backed Python UDFs
  * (reference: src/gentropy/common/spark_helpers.py:101-134,
  * src/gentropy/method/sumstat_quality_controls.py:83-90).
  */
object StatMath {

  private val SqrtTwo = math.sqrt(2.0)

  /** Standard normal survival function: P(X > x) = erfc(x/√2)/2. */
  def normSf(x: Double): Double = 0.5 * Erf.erfc(x / SqrtTwo)

  /** Standard normal CDF. */
  def normCdf(x: Double): Double = 0.5 * Erf.erfc(-x / SqrtTwo)

  /** Standard normal quantile (inverse CDF / probit). */
  def normPpf(p: Double): Double =
    if (p <= 0.0) Double.NegativeInfinity
    else if (p >= 1.0) Double.PositiveInfinity
    else -SqrtTwo * Erf.erfcInv(2.0 * p)

  /** Chi-squared survival function with `df` degrees of freedom. */
  def chi2Sf(x: Double, df: Double): Double =
    if (x <= 0.0) 1.0 else Gamma.regularizedGammaQ(df / 2.0, x / 2.0)

  /** Chi-squared quantile (inverse of 1 - chi2Sf); used for GC lambda.
    * Bisection on the monotone survival function — called once per
    * aggregate group, never per row. */
  def chi2Ppf(p: Double, df: Double): Double = {
    if (p <= 0.0) return 0.0
    if (p >= 1.0) return Double.PositiveInfinity
    var lo = 0.0
    var hi = 1.0
    while (1.0 - chi2Sf(hi, df) < p) hi *= 2.0
    var i = 0
    while (i < 200 && hi - lo > 1e-12 * math.max(1.0, hi)) {
      val mid = 0.5 * (lo + hi)
      if (1.0 - chi2Sf(mid, df) < p) lo = mid else hi = mid
      i += 1
    }
    0.5 * (lo + hi)
  }

  /** log(sum(exp(xs))) with max extraction, matching the reference's
    * NumPy `get_logsum` (reference: src/gentropy/common/utils.py:258-276). */
  def logSumExp(xs: Array[Double]): Double = {
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) { if (xs(i) > mx) mx = xs(i); i += 1 }
    if (mx == Double.NegativeInfinity) return Double.NegativeInfinity
    var s = 0.0
    i = 0
    while (i < xs.length) { s += math.exp(xs(i) - mx); i += 1 }
    mx + math.log(s)
  }
}
