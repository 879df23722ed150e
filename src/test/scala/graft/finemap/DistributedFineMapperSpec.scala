package graft.finemap

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributedFineMapperSpec extends SparkSpec {
  import spark.implicits._

  test("loci fine-map in parallel on executors with long-format LD") {
    // two loci: locus A has a clear causal SNP (idx of v09 after
    // name-sort), locus B is null
    val variants = (
      (0 until 12).map(i => ("A", f"v$i%02d", if (i == 9) 7.5 else 0.2)) ++
        (0 until 8).map(i => ("B", f"v$i%02d", 0.1))
      ).toDF("locusId", "variantId", "z")
    // LD: identity plus one correlated pair in A (indices 9,10 after sort)
    val ld = Seq(("A", 9, 10, 0.9)).toDF("locusId", "i", "j", "r")

    val out = DistributedFineMapper.finemapAll(spark, variants, ld,
      n = 10000, L = 3).collect()

    val aPips = out.filter(_.locusId == "A").map(r => r.variantId -> r.pip).toMap
    val bPips = out.filter(_.locusId == "B").map(_.pip)
    assert(out.length == 20)
    // causal variant v09 carries the bulk of PIP (possibly shared with
    // its LD partner v10)
    assert(aPips("v09") + aPips("v10") > 0.8, s"pips=$aPips")
    assert(aPips("v09") > aPips("v00"))
    assert(bPips.max < 0.5)
    // credible set marks the causal variant
    assert(out.exists(r => r.locusId == "A" && r.variantId == "v09" &&
      r.inCredibleSet))
  }

  test("CARMA pre-step drops LD-discordant outliers before SuSiE") {
    // v03 carries z=9 while its strong-LD partners v02/v04 (r=0.95) sit
    // at z≈0 — exactly the LD discordance CARMA's ridge test flags: the
    // null partners are expelled as outliers and the causal candidate
    // survives. v08/v09 are a legitimate correlated causal pair.
    val variants = (0 until 12).map { i =>
      val z = if (i == 3) 9.0 else if (i == 8) 7.0 else if (i == 9) 6.8 else 0.1
      ("A", f"v$i%02d", z)
    }.toDF("locusId", "variantId", "z")
    val ld = (
      Seq(("A", 8, 9, 0.97), ("A", 2, 3, 0.95), ("A", 3, 4, 0.95)) ++
        // the rest of the locus is mildly correlated except v03
        (for (i <- 0 until 12; j <- (i + 1) until 12
              if i != 3 && j != 3 && (i, j) != ((8, 9)) && (i, j) != ((2, 4)))
          yield ("A", i, j, 0.3))
      ).toDF("locusId", "i", "j", "r")

    val out = DistributedFineMapper.finemapAll(spark, variants, ld,
      n = 10000, L = 3, runCarma = true).collect()

    // the discordant null partners were expelled by CARMA
    assert(!out.exists(_.variantId == "v02"), s"got ${out.map(_.variantId).toSeq}")
    assert(!out.exists(_.variantId == "v04"), s"got ${out.map(_.variantId).toSeq}")
    assert(out.length == 10)
    // both real signals are still fine-mapped
    val pips = out.map(r => r.variantId -> r.pip).toMap
    assert(pips("v03") > 0.8, s"pips=$pips")
    assert(pips("v08") + pips("v09") > 0.8, s"pips=$pips")
  }

  test("tiny loci survive the CARMA chain: p=1 and p=2 groups don't " +
    "crash the sampler") {
    // regression: CARMA's neighbour-group sampler indexed empty
    // candidate groups (nothing to add/swap once the model holds the
    // only variant) and the cold-start top-half take(p/2) was empty
    // at p=1
    val variants = Seq(
      ("P1", "v00", Some(3.0)),
      ("P2", "v00", Some(4.0)), ("P2", "v01", Some(0.1)),
      ("P3", "v00", None: Option[Double])
    ).toDF("locusId", "variantId", "z")
    val ld = Seq(("P2", 0, 1, 0.4)).toDF("locusId", "i", "j", "r")
    val out = DistributedFineMapper.finemapAll(spark, variants, ld,
      n = 10000, L = 3, runCarma = true, imputeMissing = true).collect()
    // P1 and P2 fine-map; P3 (single all-null locus) drops entirely
    assert(out.count(_.locusId == "P1") == 1)
    assert(out.count(_.locusId == "P2") == 2)
    assert(!out.exists(_.locusId == "P3"))
    assert(out.filter(_.locusId == "P1").head.pip > 0.0)
  }

  test("RAISS imputation admits well-tagged null-z variants before SuSiE") {
    // v05's z is missing but it is in near-perfect LD with observed
    // variants → imputable; v11 is missing AND untagged → dropped
    val variants = (0 until 12).map { i =>
      val z: Option[Double] =
        if (i == 5 || i == 11) None
        else if (i == 4) Some(7.2) else if (i == 6) Some(7.0) else Some(0.1)
      ("A", f"v$i%02d", z)
    }.toDF("locusId", "variantId", "z")
    val ld = (
      Seq(("A", 4, 5, 0.97), ("A", 5, 6, 0.97), ("A", 4, 6, 0.95)) ++
        (for (i <- 0 until 12; j <- (i + 1) until 12
              if Set(i, j).intersect(Set(4, 5, 6, 11)).isEmpty)
          yield ("A", i, j, 0.2))
      ).toDF("locusId", "i", "j", "r")

    val without = DistributedFineMapper.finemapAll(spark, variants, ld,
      n = 10000, L = 3).collect()
    assert(!without.exists(_.variantId == "v05")) // null z dropped
    assert(without.length == 10)

    val withImp = DistributedFineMapper.finemapAll(spark, variants, ld,
      n = 10000, L = 3, imputeMissing = true,
      ldScoreThreshold = 1.0).collect()
    assert(withImp.exists(_.variantId == "v05"), // imputed and fine-mapped
      withImp.map(_.variantId).toSeq.toString)
    assert(!withImp.exists(_.variantId == "v11")) // untagged: rejected
  }

  test("credible-set assembly: leads, purity, logBF filter, high-LD lead dedup") {
    // locus with two signals: v09 strong (z=8), v05 moderate (z=5),
    // v10 in near-perfect LD with v09 (its set should survive via the
    // same lead; a separate set led by v10 would be removed)
    val variants = (0 until 12).map { i =>
      val z = if (i == 9) 8.0 else if (i == 5) 5.0 else 0.1
      ("A", f"v$i%02d", z)
    }.toDF("locusId", "variantId", "z")
    val ld = Seq(("A", 9, 10, 0.98)).toDF("locusId", "i", "j", "r")
    val out = DistributedFineMapper.finemapCredibleSets(spark, variants, ld,
      n = 10000, L = 3).collect()
    assert(out.nonEmpty)
    // every surviving set passes the logBF floor and carries purity stats
    out.foreach { cs =>
      assert(cs.credibleSetLog10BF >= 2.0 * 0.4342944819 ||
        cs.credibleSetIndex == 1)
      assert(cs.purityMeanR2 > 0.0 && cs.purityMeanR2 <= 1.0)
      assert(cs.purityMinR2 <= cs.purityMeanR2)
      assert(cs.locus.nonEmpty)
      assert(cs.locus.map(_.posteriorProbability).sum >= 0.98 ||
        cs.locus.size == 12) // 99% coverage or the whole locus
      // lead is the top-PIP tag
      assert(cs.locus.head.variantId == cs.variantId)
      // p-value codec: mantissa in [1, 10), exponent negative for z=8
      assert(cs.pValueMantissa >= 1.0f && cs.pValueMantissa < 10.0f)
    }
    // the strong signal leads a set
    assert(out.exists(_.variantId == "v09"))
    // leads are unique and not in high mutual LD
    val leads = out.map(_.variantId)
    assert(leads.distinct.length == leads.length)
    assert(!(leads.contains("v09") && leads.contains("v10")))
    // z=8 lead p-value exponent: p = erfc(8/sqrt(2)) ~ 1.2e-15
    val v9 = out.find(_.variantId == "v09").get
    assert(v9.pValueExponent == -15, s"expo=${v9.pValueExponent}")
  }

  test("perfect-LD dedup: a planted duplicate-variant locus produces the " +
    "SAME credible sets with and without the dedup") {
    // v00 is the causal signal; v01 is its |r|=1 duplicate carrying a
    // (discordant) weaker z — the rank-deficient class. WITHOUT the
    // dedup, CARMA's outlier search discovers the degeneracy one
    // config at a time: {v00,v01} fails the outlier test (non-finite
    // likelihood on the singular 2x2 block) and v01 is drained into
    // conditionalS, leaving the locus. WITH the dedup, v01 is dropped
    // at LD-block materialisation before the search ever runs. Both
    // paths must retain the identical variant set and hence emit
    // bit-identical credible sets.
    val variants = (Seq(("A", "v00", 6.0), ("A", "v01", 2.0)) ++
      (2 until 8).map(i => ("A", f"v$i%02d", 0.1))
      ).toDF("locusId", "variantId", "z")
    val ld = (Seq(("A", 0, 1, 1.0)) ++
      (for (i <- 0 until 8; j <- (i + 1) until 8 if (i, j) != ((0, 1)))
        yield ("A", i, j, 0.2))).toDF("locusId", "i", "j", "r")

    def run(dedup: Boolean) = DistributedFineMapper
      .finemapCredibleSets(spark, variants, ld, n = 10000, L = 3,
        runCarma = true, dedupPerfectLd = dedup)
      .collect()
      .sortBy(cs => (cs.locusId, cs.credibleSetIndex, cs.variantId))

    val withDedup = run(dedup = true)
    val without = run(dedup = false)
    // the duplicate leaves the output on BOTH paths (upfront vs drained)
    assert(!withDedup.exists(cs => cs.variantId == "v01" ||
      cs.locus.exists(_.variantId == "v01")))
    assert(!without.exists(cs => cs.variantId == "v01" ||
      cs.locus.exists(_.variantId == "v01")), s"got ${without.toSeq}")
    assert(withDedup.nonEmpty && withDedup.exists(_.variantId == "v00"))
    assert(withDedup.toSeq == without.toSeq)
  }

  test("perfect-LD dedup collapses a NULL-z duplicate into its observed " +
    "representative instead of imputing it as a copy") {
    // v01 has no z but is |r|=1 with observed v00: RAISS would impute
    // it as an information-free copy and SuSiE would split the PIP
    // across the pair. The dedup collapses the pair to the OBSERVED
    // member — deliberately different from the dedup-off default,
    // which keeps both with split posterior mass (the reference-shaped
    // behavior the q_gx_finemap_e2e golden pins).
    val variants = (Seq(("B", "v00", Some(5.0)),
      ("B", "v01", None: Option[Double])) ++
      (2 until 6).map(i => ("B", f"v$i%02d", Some(0.1)))
      ).toDF("locusId", "variantId", "z")
    val ld = (Seq(("B", 0, 1, 1.0)) ++
      (for (i <- 0 until 6; j <- (i + 1) until 6 if (i, j) != ((0, 1)))
        yield ("B", i, j, 0.15))).toDF("locusId", "i", "j", "r")

    val dedup = DistributedFineMapper.finemapAll(spark, variants, ld,
      n = 10000, L = 3, imputeMissing = true, imputedR2Threshold = 0.5,
      ldScoreThreshold = 0.5, dedupPerfectLd = true).collect()
    assert(!dedup.exists(_.variantId == "v01"))
    val pipOn = dedup.find(_.variantId == "v00").get.pip

    val off = DistributedFineMapper.finemapAll(spark, variants, ld,
      n = 10000, L = 3, imputeMissing = true, imputedR2Threshold = 0.5,
      ldScoreThreshold = 0.5, dedupPerfectLd = false).collect()
    assert(off.exists(_.variantId == "v01")) // imputed copy kept
    val pipOffPair = off.filter(v => v.variantId == "v00" || v.variantId == "v01")
      .map(_.pip)
    // split mass off vs concentrated mass on: the collapsed
    // representative carries at least what the pair shared
    assert(pipOn >= pipOffPair.max - 1e-9,
      s"pipOn=$pipOn split=${pipOffPair.toSeq}")
  }

  test("perfectLdKeepIdx: groups, |r|=-1 pairs, observed-z preference") {
    import breeze.linalg.DenseMatrix
    def v(id: String, z: Option[Double], idx: Int) =
      DistributedFineMapper.LocusVariant("L", id, z, idx)
    // 5 variants: {0,1,2} one perfect group (0~1 at r=1, 0~2 at r=-1),
    // {3,4} independent; 0 is NULL-z so the observed 1 must represent
    val vs = Array(v("a", None, 0), v("b", Some(2.0), 1),
      v("c", Some(1.0), 2), v("d", Some(0.5), 3), v("e", None, 4))
    val ld = DenseMatrix.eye[Double](5)
    ld(0, 1) = 1.0; ld(1, 0) = 1.0
    ld(0, 2) = -1.0; ld(2, 0) = -1.0
    ld(1, 2) = -1.0; ld(2, 1) = -1.0
    ld(3, 4) = 0.99; ld(4, 3) = 0.99 // high but not perfect: kept
    val keep = DistributedFineMapper.perfectLdKeepIdx(vs, ld)
    assert(keep.toSeq == Seq(1, 3, 4), s"keep=${keep.toSeq}")
  }
}
