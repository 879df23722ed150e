package graft.finemap

import breeze.linalg.{det, diag, max => bmax, svd, DenseMatrix, DenseVector}
import breeze.numerics.lgamma

import scala.collection.mutable
import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.util.Random

/** CARMA outlier detection / fine-mapping (spike-and-slab, no EM).
  *
  * Re-implementation of the published CARMA shotgun stochastic search
  * over causal-SNP configurations with LD-discordance ("outlier")
  * detection, as used by the reference pipeline
  * (reference: src/gentropy/method/carma.py:21-919) as a pre-step of
  * its CARMA→RAISS→SuSiE fine-mapping chain
  * (reference: src/gentropy/susie_finemapper.py:546-611).
  *
  * The algorithm is inherently driver/executor-local (a per-locus
  * kernel over a dense LD block); distribution happens one level up in
  * [[DistributedFineMapper]], which runs one kernel per locus inside
  * `cogroup`. This port uses Breeze in place of NumPy/SciPy:
  *  - `scipy.optimize.minimize_scalar(bounded)` → golden-section
  *    search ([[SusieInf.minimizeScalar]]);
  *  - `scipy.linalg.pinv(rtol)` → SVD pseudo-inverse with the same
  *    relative singular-value cutoff;
  *  - `np.random.choice(p=…)` → cumulative-weight sampling from a
  *    seeded [[scala.util.Random]] (the reference draws from global
  *    NumPy state; a seed parameter makes runs reproducible).
  */
object Carma {

  /** Sorted-desc (margin, configString) model list + outlier indices. */
  case class McsResult(bList: IndexedSeq[(Double, String)],
                       conditionalS: List[Int])

  /** Final CARMA output; fields are None when the time budget expired. */
  case class CarmaOutput(pips: Option[Array[Double]],
                         bList: Option[IndexedSeq[(Double, String)]],
                         outliers: Option[List[Int]])

  // ---------------------------------------------------------------- //
  // Likelihoods                                                      //
  // ---------------------------------------------------------------- //

  /** reference: src/gentropy/method/carma.py:149-172 */
  private[finemap] def marginalFunIndi(zSigmazS: Double, tau: Double,
                                       pS: Int, detS: Double): Double =
    pS / 2.0 * math.log(tau) - 0.5 * math.log(detS) + zSigmazS / 2.0

  private def subMatrix(m: DenseMatrix[Double], idx: Array[Int]): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](idx.length, idx.length)
    var i = 0
    while (i < idx.length) {
      var j = 0
      while (j < idx.length) { out(i, j) = m(idx(i), idx(j)); j += 1 }
      i += 1
    }
    out
  }

  private def subVector(v: DenseVector[Double], idx: Array[Int]): DenseVector[Double] =
    DenseVector(idx.map(v(_)))

  /** Marginal likelihood of a configuration (0-based indices).
    * reference: src/gentropy/method/carma.py:174-217 */
  private[finemap] def marginalLikelihood(idx: Array[Int], sigma: DenseMatrix[Double],
                                          z: DenseVector[Double], tau: Double): Double = {
    val pS = idx.length
    val m = subMatrix(sigma, idx) + DenseMatrix.eye[Double](pS) * tau
    val detS = det(m)
    val mInv = breeze.linalg.inv(m)
    val sub = subVector(z, idx)
    val zSigmazS = sub dot (mInv * sub)
    marginalFunIndi(zSigmazS, tau, pS, detS)
  }

  /** SVD pseudo-inverse with relative singular-value cutoff, matching
    * `scipy.linalg.pinv(..., rtol=…)`. */
  private[finemap] def pinvRtol(m: DenseMatrix[Double], rtol: Double): DenseMatrix[Double] = {
    val svd.SVD(u, s, vt) = svd(m)
    val cutoff = rtol * bmax(s)
    val sInv = s.map(x => if (x > cutoff) 1.0 / x else 0.0)
    vt.t * diag(sInv) * u.t
  }

  /** Likelihood of the outlier model for a configuration.
    * reference: src/gentropy/method/carma.py:219-266 */
  private[finemap] def outlierLikelihood(idx: Array[Int], sigma: DenseMatrix[Double],
                                         z: DenseVector[Double], tau: Double): Double = {
    val pS = idx.length
    val sigmaS = subMatrix(sigma, idx)
    val a = DenseMatrix.eye[Double](pS) * tau
    val sigmaSIInv = pinvRtol(sigmaS + a, 1e-5)
    val sigmaSInv = pinvRtol(sigmaS, 1e-5)
    val detS = math.abs(det(sigmaSInv))
    val detIS = math.abs(det(sigmaSIInv))
    val sub = subVector(z, idx)
    val zSigmazS = sub dot (sigmaSInv * sub)
    val zSigmazIS = sub dot (sigmaSIInv * sub)
    0.5 * (math.log(detS) + math.log(detIS)) - 0.5 * (zSigmazS - zSigmazIS)
  }

  /** The whole per-candidate outlier test (ridge search + the two
    * final outlier likelihoods) through ONE symmetric
    * eigendecomposition. Every matrix the test touches is
    * B(x) = x·Σ_S + (1−x)·I (optionally +τI) for the candidate's LD
    * block Σ_S — all sharing Σ_S's eigenvectors V, with eigenvalues
    * xλ+(1−x)(+τ). So after one eigSym, each ridge evaluation's two
    * pseudo-inverses, their determinants and both quadratic forms are
    * O(n) in the rotated basis — replacing ~60 small SVDs per
    * candidate (the sampled profile put 79% of CARMA's wall in those
    * SVDs). Matches [[outlierLikelihood]]∘[[pinvRtol]] analytically:
    * pinv(B) = V diag(1/e · [|e| > rtol·max|e|]) Vᵀ,
    * log|det pinv(B)| = −Σ log|e| over the kept spectrum (−∞ when a
    * dimension is dropped — the reconstructed pinv is singular), and
    * zᵀ pinv(B) z = Σ w²/e with w = Vᵀ z_S.
    * reference: src/gentropy/method/carma.py:219-266,458-502 */
  private[finemap] def outlierTestEigen(testS: Array[Int], sigma: DenseMatrix[Double],
                               z: DenseVector[Double],
                               tau: Double): Double = {
    // Fast path (r14): a duplicate variant pair inside the test set
    // (|r| = 1 up to double noise) makes Σ_S provably rank-deficient at
    // x = 1 — the spectral path below then finds a zero eigenvalue,
    // olik(1.0) lands at −∞ and the non-finite guard returns −∞. The
    // direct pair scan reaches the SAME decision without paying the
    // eigendecomposition + scalar search (decision parity covered by
    // CarmaSpec). NOTE measured honestly: this does NOT recover the
    // 9x x10-chain susie cost the r13 guard introduced (504.7 s vs
    // 55.7 s pre-guard, identical 52,625 credible sets both ways —
    // CHAIN_r14.json attribution) — there the cost is the
    // outlier-switch drain loop's search expansion (each −∞ removes a
    // candidate, grows conditionalS and re-samples), not per-test
    // eigen work. The structural fix is upstream: deduplicate
    // |r|=1 variants at LD-block build so rank-deficient configs never
    // enter the search (next-round item).
    var da = 0
    while (da < testS.length) {
      var db = da + 1
      while (db < testS.length) {
        if (math.abs(sigma(testS(da), testS(db))) >= 1.0 - 1e-9)
          return Double.NegativeInfinity
        db += 1
      }
      da += 1
    }
    val lam = breeze.linalg.eigSym(subMatrix(sigma, testS))
    val w: DenseVector[Double] = lam.eigenvectors.t * subVector(z, testS)
    val n = testS.length
    // outlier likelihood of B(x) (see scaladoc); rtol matches pinvRtol
    def olik(x: Double): Double = {
      val rtol = 1e-5
      var maxB = 0.0
      var maxBI = 0.0
      var i = 0
      while (i < n) {
        val e = x * lam.eigenvalues(i) + (1.0 - x)
        if (math.abs(e) > maxB) maxB = math.abs(e)
        if (math.abs(e + tau) > maxBI) maxBI = math.abs(e + tau)
        i += 1
      }
      var logDetS = 0.0   // log |det pinv(B)|
      var logDetIS = 0.0  // log |det pinv(B+τI)|
      var zS = 0.0        // zᵀ pinv(B) z
      var zIS = 0.0       // zᵀ pinv(B+τI) z
      i = 0
      while (i < n) {
        val e = x * lam.eigenvalues(i) + (1.0 - x)
        val eI = e + tau
        if (math.abs(e) > rtol * maxB) {
          logDetS -= math.log(math.abs(e)); zS += w(i) * w(i) / e
        } else logDetS = Double.NegativeInfinity
        if (math.abs(eI) > rtol * maxBI) {
          logDetIS -= math.log(math.abs(eI)); zIS += w(i) * w(i) / eI
        } else logDetIS = Double.NegativeInfinity
        i += 1
      }
      0.5 * (logDetS + logDetIS) - 0.5 * (zS - zIS)
    }
    val xOpt = SusieInf.minimizeScalar(x => -olik(x), 0.0, 1.0)
    val atOne = olik(1.0)
    val atOpt = olik(xOpt)
    // Rank-deficient Σ_S (e.g. |r|=1 duplicate variants) drops a
    // spectral dimension at x=1, making olik(1.0) exactly −∞; if
    // olik(xOpt) is also non-finite the difference would be NaN, and
    // exp(NaN) < outlierBFIndex is false — silently KEEPING a candidate
    // the matrix path removes. Any non-finite likelihood means the
    // shrunk-vs-unshrunk comparison is undefined on this block, so the
    // test fails outright: return −∞ (candidate removed).
    if (!java.lang.Double.isFinite(atOne) || !java.lang.Double.isFinite(atOpt))
      Double.NegativeInfinity
    else -math.abs(atOne - atOpt)
  }

  /** Negative outlier likelihood of the ridge-shrunk LD block; the
    * scalar being minimised over x ∈ [0, 1]. Superseded in the hot
    * path by [[outlierTestEigen]]; kept as the parity baseline for
    * CarmaSpec's eigen-vs-matrix check.
    * reference: src/gentropy/method/carma.py:458-502 */
  private[finemap] def ridgeFun(x: Double, sigma: DenseMatrix[Double],
                       modiLdS: DenseMatrix[Double], testS: Array[Int],
                       z: DenseVector[Double], outlierTau: Double): Double = {
    val n = modiLdS.rows
    val temp = sigma.copy
    val tempLd = modiLdS * x + DenseMatrix.eye[Double](n) * (1.0 - x)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) { temp(testS(i), testS(j)) = tempLd(i, j); j += 1 }
      i += 1
    }
    -outlierLikelihood(testS, temp, z, outlierTau)
  }

  /** Model prior: dim·log λ + lgamma(p−dim+1) − lgamma(p+1).
    * reference: src/gentropy/method/carma.py:504-529 */
  private[finemap] def priorDist(dim: Int, lambdaVal: Double, p: Int): Double =
    dim * math.log(lambdaVal) + lgamma((p - dim + 1).toDouble) - lgamma((p + 1).toDouble)

  // ---------------------------------------------------------------- //
  // Configuration neighbourhoods                                     //
  // ---------------------------------------------------------------- //

  /** One sorted row per (element of sSub) appended to y.
    * reference: src/gentropy/method/carma.py:268-286 */
  private def addFunction(sSub: Array[Int], y: Array[Int]): Array[Array[Int]] =
    sSub.map(x => (y :+ x).sorted)

  /** Neighbour sets {remove-one, add-one, swap-one} of configuration S,
    * optionally conditioning away outlier indices.
    * reference: src/gentropy/method/carma.py:288-420 */
  private[finemap] def setGammaFunc(inputS: Seq[Int], p: Int,
                                    conditionIndex: Seq[Int]): Array[Option[Array[Array[Int]]]] = {
    val out = Array.fill[Option[Array[Array[Int]]]](3)(None)
    if (conditionIndex.isEmpty) {
      val s = inputS.toArray
      if (s.isEmpty) {
        out(1) = Some(Array.range(0, p).map(Array(_)))
      } else if (s.length == 1) {
        val sSub = Array.range(0, p).filterNot(s.contains)
        out(1) = Some(addFunction(sSub, s))
        out(2) = Some(sSub.map(Array(_)))
      } else {
        val sSub = Array.range(0, p).filterNot(s.contains)
        val sorted = s.sorted
        val combos = sorted.toSeq.combinations(sorted.length - 1).map(_.toArray).toArray
        out(0) = Some(combos)
        out(1) = Some(addFunction(sSub, sorted))
        out(2) = Some(combos.flatMap(row => addFunction(sSub, row)))
      }
    } else {
      val s = inputS.toArray.diff(conditionIndex)
      if (s.isEmpty) {
        val sSub = Array.range(0, p).filterNot(conditionIndex.contains)
        out(1) = Some(sSub.map(Array(_)))
      } else if (s.length == 1) {
        val sSub = Array.range(0, p).filterNot(inputS.contains)
        out(1) = Some(addFunction(sSub, s))
        out(2) = Some(sSub.map(Array(_)))
      } else {
        val sSub = Array.range(0, p).filterNot(inputS.contains)
        val sorted = s.sorted
        val combos = sorted.toSeq.combinations(sorted.length - 1).map(_.toArray).toArray
        out(0) = Some(combos)
        out(1) = Some(addFunction(sSub, sorted))
        out(2) = Some(combos.flatMap(row => addFunction(sSub, row)))
      }
    }
    out
  }

  private def configKey(cfg: Array[Int]): String = cfg.sorted.mkString(",")

  // ---------------------------------------------------------------- //
  // PIPs                                                             //
  // ---------------------------------------------------------------- //

  /** Posterior inclusion probabilities from the visited-model list.
    * reference: src/gentropy/method/carma.py:531-588 */
  def pipFunc(likeli: IndexedSeq[Double], modelSpace: IndexedSeq[String],
              p: Int, numCausal: Int): Array[Double] = {
    val kept = likeli.zip(modelSpace).filter { case (l, _) => !l.isNaN && !l.isInfinite }
    val rows = kept.map { case (l, cfg) =>
      val idx = if (cfg.isEmpty) Array.empty[Int] else cfg.split(",").map(_.toInt)
      (l, idx)
    }.filter(_._2.length <= numCausal)
    if (rows.isEmpty) return Array.fill(p)(0.0)
    val mx = rows.map(_._1).max
    val probSum = rows.map(r => math.exp(r._1 - mx)).sum
    val result = Array.fill(p)(0.0)
    rows.foreach { case (l, idx) =>
      val w = math.exp(l - mx)
      idx.foreach(i => result(i) += w)
    }
    result.map(_ / probSum)
  }

  // ---------------------------------------------------------------- //
  // Modified shotgun stochastic search                               //
  // ---------------------------------------------------------------- //

  /** Sample an index with probability ∝ exp(margin − max). */
  private def softmaxSample(margins: IndexedSeq[Double], rng: Random): Int = {
    val mx = margins.max
    val w = margins.map(m => math.exp(m - mx))
    val total = w.sum
    var r = rng.nextDouble() * total
    var i = 0
    while (i < w.length - 1 && r >= w(i)) { r -= w(i); i += 1 }
    i
  }

  /** Modified Monte Carlo shotgun sampling with outlier detection.
    * reference: src/gentropy/method/carma.py:590-919 */
  def mcsModified(
      z: DenseVector[Double],
      ldMatrix: DenseMatrix[Double],
      maxModelDim: Int = 10000,
      lambdaVal: Double = 1.0,
      numCausal: Int = 10,
      outlierSwitch: Boolean = true,
      inputConditionalSList: Option[List[Int]] = None,
      tau: Double = 1.0 / (0.05 * 0.05),
      epsilon: Double = 1e-3,
      innerAllIter: Int = 10,
      outlierBFIndex: Double = 1.0 / 3.2,
      rng: Random = new Random(2024),
      // cross-call pure-function caches (see carmaSpikeSlabNoEM): both
      // marginalLikelihood+prior and the ridge outlier test depend only
      // on (config, sigma, z, tau, λ), all fixed across the restarted
      // chains of one locus. These memos carry VALUES only — the
      // visited-model set (modelMargin) stays per-call, because the
      // reference's restarted chain begins with a fresh model record.
      marginMemo: mutable.HashMap[String, Double] = mutable.HashMap.empty,
      outlierMemo: mutable.HashMap[String, Double] = mutable.HashMap.empty)
    : McsResult = {

    val p = z.length
    val sigma = ldMatrix
    val nullMargin = priorDist(0, lambdaVal, p) // == 0.0

    // Visited models: margin by config key, maintained sorted-desc on use.
    val modelMargin = mutable.LinkedHashMap[String, Double]("" -> nullMargin)
    var conditionalS: List[Int] = inputConditionalSList.getOrElse(Nil)
    var s: List[Int] = conditionalS
    var storedBf = 0.0
    var resultB: IndexedSeq[(Double, String)] = IndexedSeq((nullMargin, ""))
    var converged = false

    var outerIter = 0
    while (outerIter < innerAllIter && !converged) {
      var innerIter = 0
      while (innerIter < 10) {
        val setGamma: Array[Option[mutable.ArrayBuffer[Array[Int]]]] =
          setGammaFunc(s, p, conditionalS)
            .map(_.map(rows => mutable.ArrayBuffer(rows: _*)))
        val workingS: Array[Int] = s.toArray.diff(conditionalS).sorted

        // margins (prior + likelihood) per neighbour group
        val groupMargins: Array[mutable.ArrayBuffer[Double]] = setGamma.map {
          case Some(rows) =>
            val buf = mutable.ArrayBuffer.empty[Double]
            rows.foreach { cfg =>
              // memo: neighbourhoods overlap heavily between inner
              // iterations (s moves by one element), and modelMargin
              // already records every visited config's margin — the
              // same deterministic double this would recompute
              // (marginalLikelihood is a pure function of (cfg, sigma,
              // z, tau), all fixed here). ~79% of CARMA's wall was
              // re-running tiny SVD/LU factorisations on repeats.
              val k = configKey(cfg)
              buf += modelMargin.getOrElse(k,
                marginMemo.getOrElseUpdate(k,
                  marginalLikelihood(cfg, sigma, z, tau) +
                    priorDist(cfg.length, lambdaVal, p)))
            }
            buf
          case None => mutable.ArrayBuffer(nullMargin)
        }

        // record visited models (first-seen margin kept, as the
        // reference's drop_duplicates(keep="first") does)
        var gi = 0
        while (gi < 3) {
          setGamma(gi) match {
            case Some(rows) =>
              var ri = 0
              while (ri < rows.length) {
                val key = configKey(rows(ri))
                if (!modelMargin.contains(key)) modelMargin(key) = groupMargins(gi)(ri)
                ri += 1
              }
            case None =>
              if (!modelMargin.contains("")) modelMargin("") = nullMargin
          }
          gi += 1
        }

        if (workingS.isEmpty && groupMargins(1).isEmpty) {
          // nothing addable (every variant already conditioned on):
          // the chain has no move — keep the (empty) working model
          s = conditionalS
        } else if (workingS.isEmpty) {
          // cold start: sample an add-one model among the top half
          val aa0 = groupMargins(1)
          val mx = aa0.max
          val aa = aa0.map(_ - mx)
          // floor 1: at p=1 the integer half is 0 and take(0) would
          // leave the cold-start sampler with no candidate to index
          val minHalfLen = math.min(aa.length, math.max(1, p / 2))
          val topIdx = aa.indices.sortBy(i => -math.exp(aa(i))).take(minHalfLen)
          val probs = topIdx.map(i => math.exp(aa(i)))
          val total = probs.sum
          var r = rng.nextDouble() * total
          var k = 0
          while (k < probs.length - 1 && r >= probs(k)) { r -= probs(k); k += 1 }
          val chosen = topIdx(k)
          s = setGamma(1).get(chosen).toList
        } else {
          // sample one candidate per neighbour group
          val starIdx = Array.fill(3)(0)
          val starMargin = Array.fill(3)(nullMargin)
          var i = 0
          while (i < 3) {
            val m = groupMargins(i)
            if (m.length > 1) {
              val idx = softmaxSample(m.toIndexedSeq, rng)
              starIdx(i) = idx; starMargin(i) = m(idx)
            } else if (m.length == 1) {
              starIdx(i) = 0; starMargin(i) = m(0)
            } else {
              // empty candidate group (tiny p: e.g. the swap group
              // when the model already holds the only variant) — no
              // candidate to stand for this star; the null margin
              // keeps the group from ever being chosen
              starIdx(i) = 0; starMargin(i) = nullMargin
            }
            i += 1
          }

          if (outlierSwitch) {
            // re-sample groups 1..2, ridge-testing each candidate's LD
            // consistency; discordant configurations are removed and
            // their novel indices become conditional outliers
            var grp = 1
            while (grp < 3) {
              if (setGamma(grp).isDefined) {
                var done = false
                while (!done && groupMargins(grp).nonEmpty) {
                  val m = groupMargins(grp)
                  val idx = softmaxSample(m.toIndexedSeq, rng)
                  starIdx(grp) = idx; starMargin(grp) = m(idx)
                  val testS = setGamma(grp).get(idx)
                  var testLogBF = 100.0
                  if (testS.length > 1) {
                    testLogBF = outlierMemo.getOrElseUpdate(configKey(testS),
                      outlierTestEigen(testS, sigma, z, tau))
                  }
                  if (math.exp(testLogBF) < outlierBFIndex) {
                    setGamma(grp).get.remove(idx)
                    groupMargins(grp).remove(idx)
                    conditionalS =
                      (conditionalS ++ testS.diff(workingS)).distinct.sorted
                  } else done = true
                }
              }
              grp += 1
            }
          }

          // degenerate-group guard (tiny p): a group may be defined
          // but EMPTY (e.g. nothing to add/swap when the model holds
          // every variant) — indexing it would throw. When the chosen
          // group is empty, fall to the other candidate group; when no
          // group has a candidate, the chain has no move and s stays
          // (the convergence check then ends the loop). The rng draw
          // sequence on healthy loci is unchanged.
          def pickIfAny(g: Int): Boolean =
            if (setGamma(g).isDefined && setGamma(g).get.nonEmpty) {
              s = setGamma(g).get(starIdx(g)).toList; true
            } else false
          if (workingS.length == numCausal) {
            // saturated: choose between remove-one and swap-one
            val margins2 = IndexedSeq(starMargin(0), starMargin(2))
            val pick = if (softmaxSample(margins2, rng) == 0) 0 else 2
            if (!pickIfAny(pick)) pickIfAny(2 - pick)
          } else {
            val margins3 = IndexedSeq(starMargin(0), starMargin(1), starMargin(2))
            val pick = softmaxSample(margins3, rng)
            if (!pickIfAny(pick)) {
              val margins23 = IndexedSeq(starMargin(1), starMargin(2))
              val pick2 = softmaxSample(margins23, rng) + 1
              if (!pickIfAny(pick2)) pickIfAny(3 - pick2)
            }
          }
        }

        conditionalS.foreach(item => if (!s.contains(item)) s = s :+ item)
        innerIter += 1
      }

      // drop every visited model touching a conditional (outlier) index
      val sortedB = modelMargin.toIndexedSeq.map { case (k, v) => (v, k) }
        .sortBy(-_._1)
      val filtered =
        if (conditionalS.isEmpty) sortedB
        else {
          val condStr = conditionalS.map(_.toString).toSet
          sortedB.filterNot { case (_, cfg) =>
            cfg.split(",").exists(condStr.contains)
          }
        }
      resultB = filtered.take(math.min(maxModelDim, filtered.length))
      val rb1 = resultB.map(_._1)
      val quarter = rb1.take(rb1.length / 4)
      val meanTop = if (quarter.isEmpty) Double.NaN else quarter.sum / quarter.length
      if (math.abs(meanTop - storedBf) < epsilon) converged = true
      else storedBf = meanTop
      outerIter += 1
    }

    McsResult(resultB, conditionalS)
  }

  // ---------------------------------------------------------------- //
  // Top-level entry points                                           //
  // ---------------------------------------------------------------- //

  /** CARMA with spike-and-slab prior, no EM.
    * reference: src/gentropy/method/carma.py:56-147 */
  def carmaSpikeSlabNoEM(
      z: DenseVector[Double],
      ld: DenseMatrix[Double],
      lambdaVal: Double = 1.0,
      maxModelDim: Int = 200000,
      allIter: Int = 1,
      allInnerIter: Int = 10,
      epsilonThreshold: Double = 1e-5,
      numCausal: Int = 10,
      tau: Double = 0.04,
      outlierSwitch: Boolean = true,
      outlierBFIndex: Double = 1.0 / 3.2,
      seed: Long = 2024L): CarmaOutput = {

    val pSnp = z.length
    val epsilonList = epsilonThreshold * pSnp
    val rng = new Random(seed)
    // pure-value caches shared across the restarted chains: the
    // restart re-explores heavily-overlapping neighbourhoods, and both
    // the marginal likelihood and the outlier ridge test are fixed
    // functions of the config for one locus
    val marginMemo = mutable.HashMap.empty[String, Double]
    val outlierMemo = mutable.HashMap.empty[String, Double]

    var all = mcsModified(z, ld, maxModelDim = maxModelDim,
      lambdaVal = lambdaVal, numCausal = numCausal,
      outlierSwitch = outlierSwitch, tau = tau, epsilon = epsilonList,
      innerAllIter = allInnerIter, outlierBFIndex = outlierBFIndex, rng = rng,
      marginMemo = marginMemo, outlierMemo = outlierMemo)

    var iter = 0
    var stop = false
    while (iter < allIter && !stop) {
      val ac1 = all.bList.map(_._1)
      val nPrev = math.rint(ac1.length / 4.0).toInt
      val prev = if (nPrev == 0) Double.NaN else ac1.take(nPrev).sum / nPrev

      all = mcsModified(z, ld, maxModelDim = maxModelDim,
        lambdaVal = lambdaVal, numCausal = numCausal,
        outlierSwitch = outlierSwitch,
        inputConditionalSList = Some(all.conditionalS), tau = tau,
        epsilon = epsilonList, innerAllIter = allInnerIter,
        outlierBFIndex = outlierBFIndex, rng = rng,
        marginMemo = marginMemo, outlierMemo = outlierMemo)

      val ac2 = all.bList.map(_._1)
      val nCur = math.rint(ac2.length / 4.0).toInt
      val cur = if (nCur == 0) Double.NaN else ac2.take(nCur).sum / nCur
      if (math.abs(prev - cur) < epsilonList) stop = true
      iter += 1
    }

    val pips = pipFunc(all.bList.map(_._1), all.bList.map(_._2), pSnp, numCausal)
    CarmaOutput(Some(pips), Some(all.bList), Some(all.conditionalS))
  }

  /** Time-budgeted wrapper; all-None output when the budget expires.
    * reference: src/gentropy/method/carma.py:20-54 */
  def timeLimitedCarmaSpikeSlabNoEM(
      z: DenseVector[Double],
      ld: DenseMatrix[Double],
      secThreshold: Double = 600,
      tau: Double = 0.04,
      seed: Long = 2024L): CarmaOutput = {
    import scala.concurrent.ExecutionContext.Implicits.global
    try {
      Await.result(
        Future(carmaSpikeSlabNoEM(z, ld, tau = tau, seed = seed)),
        Duration.fromNanos((secThreshold * 1e9).toLong))
    } catch {
      case _: java.util.concurrent.TimeoutException =>
        CarmaOutput(None, None, None)
    }
  }
}
