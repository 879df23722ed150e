package graft.finemap

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-parallel fine-mapping: loci fine-map inside a `flatMap`
  * over one-row-per-locus bundles, replacing the reference's per-locus
  * driver loop (reference: src/gentropy/susie_finemapper.py:461-691,
  * which moves each locus to the driver via `toPandas` and runs NumPy
  * there).
  *
  * Input grain: one row per (locusId, variantId) with a z-score, plus
  * long-format LD `(locusId, i, j, r)` — the Hail-free LD
  * representation recommended in SURVEY §7. Both sides aggregate once
  * on locusId into a [[LocusBundle]]; each task materialises its dense
  * LD block only inside the executor, bounded by the locus size. See
  * [[bundleLoci]] for why the kernel stage sits behind an explicit
  * repartition instead of a cogroup.
  */
object DistributedFineMapper {

  case class LocusVariant(locusId: String, variantId: String,
                          z: Option[Double], idx: Int)
  case class LdEntry(locusId: String, i: Int, j: Int, r: Double)
  case class FineMapped(locusId: String, variantId: String, pip: Double,
    logBF: Double, inCredibleSet: Boolean)

  /** One locus bundled into one slim row for the kernel stage. */
  case class LocusBundle(locusId: String, vs: Seq[LocusVariant],
                         lds: Seq[LdCell])
  case class LdCell(i: Int, j: Int, r: Double)

  /** Bundle (variants, LD entries) into ONE row per locus and
    * redistribute with an EXPLICIT repartition before the kernel runs.
    *
    * Why not cogroup: the per-locus kernel is CPU-bound per KEY, but
    * AQE's partition coalescing reasons in BYTES — a fine-mapping
    * shuffle is tiny (KBs of z/LD per locus), so the cogroup exchange
    * coalesced below `minPartitionSize` into ONE task and the whole
    * chain ran serial (measured: 16 loci, 1 task, 7.7 s wall ≈ CPU,
    * vs 3.9× speedup for the same kernels on 16 threads).
    * `repartition(n)` is a user-specified (REPARTITION_BY_NUM)
    * exchange, which AQE never coalesces; round-robin also spreads
    * loci 1-per-task instead of hash balls-in-bins. 2× parallelism
    * partitions let the scheduler smooth heterogeneous locus costs.
    * Memory: the bundled LD list is O(p²) per locus — the same order
    * the kernel's dense block materialises anyway. */
  private def bundleLoci(spark: SparkSession, variants: DataFrame,
                         ld: DataFrame): Dataset[LocusBundle] = {
    import spark.implicits._
    val indexed = variants
      .withColumn("idx",
        (row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("locusId").orderBy("variantId")) - 1).cast("int"))
      .groupBy(col("locusId").cast("string").as("locusId"))
      .agg(collect_list(struct(
        col("locusId").cast("string").as("locusId"),
        col("variantId").cast("string").as("variantId"),
        col("z").cast("double").as("z"), col("idx"))).as("vs"))
    val ldRows = ld
      .groupBy(col("locusId").cast("string").as("locusId"))
      .agg(collect_list(struct(col("i").cast("int").as("i"),
        col("j").cast("int").as("j"),
        col("r").cast("double").as("r"))).as("lds"))
    indexed.join(ldRows, Seq("locusId"), "left")
      .withColumn("lds",
        coalesce(col("lds"), array().cast("array<struct<i:int,j:int,r:double>>")))
      .repartition(spark.sparkContext.defaultParallelism * 2)
      .as[LocusBundle]
  }

  /** Fine-map every locus. `variants` must carry locusId, variantId, z
    * (idx assigned here); `ld` is long-format (locusId, i, j, r) over
    * those indices.
    *
    * With `runCarma`, each locus first runs the CARMA outlier scan and
    * LD-discordant variants are dropped from z and the LD block before
    * SuSiE — the reference's CARMA→SuSiE chain
    * (reference: src/gentropy/susie_finemapper.py:546-611), executed
    * per-locus on the executors instead of the driver.
    *
    * With `imputeMissing`, variants carrying a NULL z but present in
    * the locus' LD block are RAISS-imputed from the observed set and
    * admitted when `imputationR2 ≥ imputedR2Threshold` and
    * `ldScore ≥ ldScoreThreshold` — the reference's
    * run_sumstat_imputation branch (susie_finemapper.py:566-608).
    * Without the flag, NULL-z variants are dropped.
    *
    * With `dedupPerfectLd`, perfectly-correlated variant groups
    * (pairwise |r| ≥ [[PerfectLdThreshold]]) collapse to one
    * representative at LD-block materialisation, BEFORE CARMA/RAISS/
    * SuSiE — see [[perfectLdKeepIdx]]. Recommended ON for real LD
    * panels (perfectly-linked SNPs are common in high-LD regions and
    * make every containing CARMA configuration rank-deficient). The
    * default is OFF only to preserve the reference-shaped semantics
    * the long-pinned correctness anchors lock: keep-both duplicates
    * with split posterior mass (the reference has no dedup either —
    * susie_finemapper.py:461-691). */
  def finemapAll(spark: SparkSession, variants: DataFrame, ld: DataFrame,
                 n: Int = 100000, L: Int = 10,
                 coverage: Double = 0.99,
                 runCarma: Boolean = false,
                 carmaTimeLimitSec: Double = 600,
                 carmaTau: Double = 0.04,
                 imputeMissing: Boolean = false,
                 imputedR2Threshold: Double = 0.9,
                 ldScoreThreshold: Double = 5.0,
                 dedupPerfectLd: Boolean = false): Dataset[FineMapped] = {
    import spark.implicits._
    bundleLoci(spark, variants, ld).flatMap { b =>
      prepareLocus(b.vs.iterator,
        b.lds.iterator.map(c => LdEntry(b.locusId, c.i, c.j, c.r)),
        runCarma, carmaTimeLimitSec, carmaTau,
        imputeMissing, imputedR2Threshold, ldScoreThreshold,
        dedupPerfectLd) match {
        case None => Iterator.empty
        case Some((variantsArr, ldM, z)) =>
          val res = SusieInf.susieInf(z, ldM, n = n, L = L)
          val marginal = SusieInf.marginalPip(res)
          val cred = SusieInf.credInf(res.pip, ldM, coverage = coverage)
          val inCs = cred.flatten.toSet
          variantsArr.iterator.zipWithIndex.map { case (v0, i) =>
            FineMapped(b.locusId, v0.variantId, marginal(i),
              res.lbfVariable(i, ::).t.toArray.max, inCs.contains(i))
          }
      }
    }
  }

  /** Pairwise |r| at or above this makes the pair's 2×2 LD block
    * numerically rank-deficient under the CARMA outlier test's
    * pseudo-inverse cutoff (rtol = 1e-5: a pair drops a spectral
    * dimension when 1−|r| ≤ rtol·(1+|r|), i.e. |r| ≳ 1−2e-5), so every
    * configuration containing both variants fails the test with a
    * non-finite likelihood. Statistically such a pair IS one variant:
    * an LD panel cannot distinguish them. */
  private[finemap] val PerfectLdThreshold = (1.0 - 1e-5) / (1.0 + 1e-5)

  /** Deduplicate perfectly-correlated variants: keep ONE representative
    * per |r|≈1 group, preferring observed-z members (a NULL-z duplicate
    * of an observed variant carries no extra information — RAISS would
    * impute it as a copy), then variantId order. Returns the kept
    * indices into the idx-sorted variant array.
    *
    * Why upstream of CARMA: with duplicates present, the shotgun search
    * discovers the rank deficiency one configuration at a time — each
    * sampled config containing a duplicate pair fails the outlier test
    * (non-finite likelihood → candidate removed, [[Carma.outlierTestEigen]]),
    * which drains the candidate group, grows conditionalS and re-samples:
    * a per-locus search expansion that repeats for every affected locus.
    * The reference never faces this structurally — its NumPy comparison
    * `np.exp(nan) < index` is False, so it silently KEEPS the undefined
    * configs (reference: src/gentropy/method/carma.py:458-502) — and its
    * per-locus driver loop would die on corpus-scale duplicate loci long
    * before. Removing the degenerate class at LD-block materialisation
    * keeps rank-deficient configs out of the search entirely; CARMA's
    * own non-finite guard stays as the backstop for rank deficiency
    * that pairwise screening cannot see (3+-variant degeneracies). */
  private[finemap] def perfectLdKeepIdx(
      variantsAll: Array[LocusVariant],
      ld: DenseMatrix[Double]): Array[Int] = {
    val pAll = variantsAll.length
    val reps = scala.collection.mutable.ArrayBuffer.empty[Int]
    val kept = new Array[Boolean](pAll)
    // observed-z variants claim representative slots first
    val order = variantsAll.indices.sortBy(i => (variantsAll(i).z.isEmpty, i))
    order.foreach { i =>
      val dup = reps.exists(r => math.abs(ld(r, i)) >= PerfectLdThreshold)
      if (!dup) { reps += i; kept(i) = true }
    }
    Array.range(0, pAll).filter(kept)
  }

  /** Per-locus perfect-LD dedup + CARMA outlier expulsion + optional
    * RAISS imputation: the shared front half of both fine-mapping
    * surfaces. Returns the retained variants, their LD block and z
    * vector. Dropped duplicates leave the output exactly like CARMA
    * outliers do (the reference drops outlier rows too —
    * susie_finemapper.py:546-560). */
  private def prepareLocus(
      vs: Iterator[LocusVariant], ldEntries: Iterator[LdEntry],
      runCarma: Boolean, carmaTimeLimitSec: Double, carmaTau: Double,
      imputeMissing: Boolean, imputedR2Threshold: Double,
      ldScoreThreshold: Double, dedupPerfectLd: Boolean)
    : Option[(Array[LocusVariant], DenseMatrix[Double], DenseVector[Double])] = {
    val variantsAll = vs.toArray.sortBy(_.idx)
    val pAll = variantsAll.length
    if (pAll == 0) return None
    val ldFull = DenseMatrix.eye[Double](pAll)
    ldEntries.foreach { e =>
      if (e.i < pAll && e.j < pAll) { ldFull(e.i, e.j) = e.r; ldFull(e.j, e.i) = e.r }
    }
    val keepIdx: Array[Int] =
      if (!dedupPerfectLd) Array.range(0, pAll)
      else perfectLdKeepIdx(variantsAll, ldFull)
    val variantsArr0 = keepIdx.map(variantsAll(_))
    val p0 = variantsArr0.length
    val ldM0 =
      if (p0 == pAll) ldFull
      else DenseMatrix.tabulate[Double](p0, p0) {
        (a, b) => ldFull(keepIdx(a), keepIdx(b))
      }
    def subLd(keep: Array[Int]): DenseMatrix[Double] =
      DenseMatrix.tabulate[Double](keep.length, keep.length) {
        (a, b) => ldM0(keep(a), keep(b))
      }
    // observed variants only; NULL-z rows are imputation candidates
    var knownIdx = variantsArr0.indices.filter(variantsArr0(_).z.isDefined)
      .toArray
    // CARMA pre-step on the observed set: drop LD-discordant
    // outliers, as the reference does before imputation and SuSiE
    // (outlier rows leave the output — susie_finemapper.py:546-560)
    if (runCarma && knownIdx.nonEmpty) {
      val out = Carma.timeLimitedCarmaSpikeSlabNoEM(
        DenseVector(knownIdx.map(variantsArr0(_).z.get)),
        subLd(knownIdx),
        secThreshold = carmaTimeLimitSec, tau = carmaTau)
      out.outliers match {
        case Some(outliers) if outliers.nonEmpty =>
          knownIdx = knownIdx.indices.filterNot(outliers.contains)
            .map(knownIdx(_)).toArray
        case _ =>
      }
    }
    // RAISS imputation of NULL-z variants from the observed set
    // (susie_finemapper.py:566-608)
    val unknownIdx = variantsArr0.indices
      .filterNot(i => variantsArr0(i).z.isDefined).toArray
    val (finalIdx, zArr) =
      if (!imputeMissing || unknownIdx.isEmpty || knownIdx.isEmpty)
        (knownIdx, knownIdx.map(variantsArr0(_).z.get))
      else {
        val sigT = subLd(knownIdx)
        val sigIT = DenseMatrix.tabulate[Double](
          unknownIdx.length, knownIdx.length) {
          (a, b) => ldM0(unknownIdx(a), knownIdx(b))
        }
        val imp = Raiss.raissModel(
          DenseVector(knownIdx.map(variantsArr0(_).z.get)), sigT, sigIT)
        val accepted = unknownIdx.indices.filter { k =>
          imp.imputationR2(k) >= imputedR2Threshold &&
            imp.ldScore(k) >= ldScoreThreshold
        }
        (knownIdx ++ accepted.map(unknownIdx(_)),
          knownIdx.map(variantsArr0(_).z.get) ++
            accepted.map(k => imp.mu(k)).toArray)
      }
    if (finalIdx.isEmpty) None
    else Some((finalIdx.map(variantsArr0(_)), subLd(finalIdx),
      DenseVector(zArr)))
  }

  case class CredTag(variantId: String, posteriorProbability: Double,
                     logBF: Double, beta: Double)
  case class CredibleSetRow(
      locusId: String, credibleSetIndex: Int, variantId: String,
      beta: Double, credibleSetLog10BF: Double,
      purityMeanR2: Double, purityMinR2: Double, zScore: Double,
      pValueMantissa: Float, pValueExponent: Int,
      locus: Seq[CredTag], finemappingMethod: String)

  private val Log10E = 0.4342944819

  /** SuSiE output → one row per credible set, executor-side: the
    * reference's `susie_inf_to_studylocus` (per-effect 99% sets by
    * PIP cumsum, lead selection, purity stats over the LD block,
    * logBF/p-value/purity filters, lead dedup and high-LD lead
    * removal) without its per-set `createDataFrame` round-trips.
    * reference: src/gentropy/susie_finemapper.py:188-456 */
  private[graft] def assembleCredibleSets(
      locusId: String, variantsArr: Array[LocusVariant],
      z: DenseVector[Double], ldM: DenseMatrix[Double],
      res: SusieInf.Result,
      csLbfThr: Double = 2.0, sumPips: Double = 0.99,
      leadPvalThreshold: Double = 1.0,
      purityMeanR2Threshold: Double = 0.0,
      purityMinR2Threshold: Double = 0.0,
      ldMinR2: Double = 0.9): Seq[CredibleSetRow] = {
    val orderCreds = res.lbf.toArray.zipWithIndex.sortBy(-_._1)
    var counter = 0
    val sets = orderCreds.flatMap { case (csLbf, l) =>
      // skipped low-BF effects still consume an index (reference quirk,
      // susie_finemapper.py:243-247); the top effect is always kept
      if (counter > 0 && csLbf < csLbfThr) { counter += 1; None }
      else {
        counter += 1
        val pipCol = res.pip(::, l).toArray
        val order = pipCol.zipWithIndex.sortBy(-_._1).map(_._2)
        var cum = 0.0
        var cut = -1
        var r = 0
        while (r < order.length && cut < 0) {
          cum += pipCol(order(r))
          if (cum >= sumPips) cut = r
          r += 1
        }
        val keep = if (cut < 0) order else order.take(cut + 1)
        val tags = keep.map(j => CredTag(variantsArr(j).variantId,
          pipCol(j), res.lbfVariable(j, l), res.mu(j, l))).toSeq
        val leadIdx = keep.head
        // purity over the |r|² block of the set, diagonal included
        var s = 0.0
        var mn = Double.MaxValue
        for (a <- keep; b <- keep) {
          val r2 = ldM(a, b) * ldM(a, b)
          s += r2
          if (r2 < mn) mn = r2
        }
        val nSq = keep.length.toLong * keep.length
        val zLead = z(leadIdx)
        // pval = 2·Φ̄(|z|) = erfc(|z|/√2); log-space via commons-math
        val pval = org.apache.commons.math3.special.Erf.erfc(
          math.abs(zLead) / math.sqrt(2.0))
        val neglogp =
          if (pval > 0) -math.log10(pval) else Double.PositiveInfinity
        val expo = math.ceil(neglogp)
        val mantissa =
          if (expo.isInfinity) 1.0f
          else math.pow(10.0, expo - neglogp).toFloat
        val pExpo =
          if (expo.isInfinity) -308 else (-expo).toInt
        Some((counter, CredibleSetRow(locusId, counter,
          variantsArr(leadIdx).variantId, res.mu(leadIdx, l),
          csLbf * Log10E, s / nSq, mn, zLead, mantissa, pExpo, tags,
          "SuSiE-inf"), neglogp, leadIdx))
      }
    }
    // lead p-value / logBF / purity filters (susie_finemapper.py:395-402)
    val filtered = sets.filter { case (_, cs, neglogp, _) =>
      neglogp >= -math.log10(leadPvalThreshold) &&
        cs.credibleSetLog10BF >= csLbfThr * Log10E &&
        !cs.credibleSetLog10BF.isNaN &&
        cs.purityMinR2 >= purityMinR2Threshold &&
        cs.purityMeanR2 >= purityMeanR2Threshold
    }
    // dedup by lead variant, keep the lowest credibleSetIndex
    val dedup = filtered.groupBy(_._2.variantId).values
      .map(_.minBy(_._1)).toSeq.sortBy(_._1)
    // remove sets whose lead is in high LD with a stronger lead
    // (ordered by lead -log10 p, strictly-upper-triangular scan —
    // susie_finemapper.py:414-441)
    val byP = dedup.sortBy(-_._3)
    val doomed = scala.collection.mutable.Set.empty[String]
    for (i <- byP.indices) {
      val (_, cs, _, leadI) = byP(i)
      if (!doomed.contains(cs.variantId)) {
        for (j <- (i + 1) until byP.length) {
          val r = ldM(leadI, byP(j)._4)
          if (r * r >= ldMinR2) doomed += byP(j)._2.variantId
        }
      }
    }
    dedup.collect { case (_, cs, _, _) if !doomed.contains(cs.variantId) => cs }
  }

  /** Fine-map every locus and emit one row per credible set — the
    * step-level surface of the reference's SusieFineMapperStep, with
    * the whole per-locus pipeline (CARMA → RAISS → SuSiE-inf → set
    * assembly) running inside the executors. */
  def finemapCredibleSets(
      spark: SparkSession, variants: DataFrame, ld: DataFrame,
      n: Int = 100000, L: Int = 10,
      csLbfThr: Double = 2.0, sumPips: Double = 0.99,
      leadPvalThreshold: Double = 1.0,
      purityMeanR2Threshold: Double = 0.0,
      purityMinR2Threshold: Double = 0.0,
      ldMinR2: Double = 0.9,
      runCarma: Boolean = false,
      carmaTimeLimitSec: Double = 600,
      carmaTau: Double = 0.04,
      imputeMissing: Boolean = false,
      imputedR2Threshold: Double = 0.9,
      ldScoreThreshold: Double = 5.0,
      dedupPerfectLd: Boolean = false): Dataset[CredibleSetRow] = {
    import spark.implicits._
    bundleLoci(spark, variants, ld).flatMap { b =>
      prepareLocus(b.vs.iterator,
        b.lds.iterator.map(c => LdEntry(b.locusId, c.i, c.j, c.r)),
        runCarma, carmaTimeLimitSec, carmaTau,
        imputeMissing, imputedR2Threshold, ldScoreThreshold,
        dedupPerfectLd) match {
        case None => Iterator.empty
        case Some((variantsArr, ldM, z)) =>
          val res = SusieInf.susieInf(z, ldM, n = n, L = L)
          assembleCredibleSets(b.locusId, variantsArr, z, ldM, res,
            csLbfThr, sumPips, leadPvalThreshold,
            purityMeanR2Threshold, purityMinR2Threshold,
            ldMinR2).iterator
      }
    }
  }
}
