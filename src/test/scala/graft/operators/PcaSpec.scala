package graft.operators

import graft.SparkSpec

class PcaSpec extends SparkSpec {
  import spark.implicits._

  // full factorial grid over independent zero-mean (t, w): points
  // (t + w, t − w) have exact principal axes (1,1)/√2 and (1,−1)/√2
  private def diag = (0 until 45).map { i =>
    val t = (i / 5) - 4.0
    val w = ((i % 5) - 2.0) * 0.05
    (i.toLong, Seq(t + w, t - w))
  }.toDF("id", "embedding")

  test("pcaFit finds the dominant axis, orders eigenvalues, and " +
    "canonicalises signs") {
    val m = Similarity.pcaFit(diag, k = 2)
    assert(m.nRows == 45L)
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    val top = m.components(0)
    // dominant axis ≈ (1,1)/√2, sign-canonical (positive pivot)
    assert(math.abs(math.abs(top(0)) - math.sqrt(0.5)) < 1e-6)
    assert(top(0) > 0 && math.abs(top(0) - top(1)) < 1e-6)
    // rows orthonormal
    val dot01 = m.components(0).zip(m.components(1)).map(p => p._1 * p._2).sum
    assert(math.abs(dot01) < 1e-9)
    assert(math.abs(m.components(0).map(x => x * x).sum - 1.0) < 1e-9)
  }

  test("projection variance along each component equals its eigenvalue") {
    val m = Similarity.pcaFit(diag, k = 2)
    val proj = Similarity.pcaTransform(diag, m)
      .select("projection").as[Seq[Double]].collect()
    for (c <- 0 until 2) {
      val xs = proj.map(_(c))
      val mean = xs.sum / xs.length
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      assert(math.abs(variance - m.eigenvalues(c)) < 1e-6,
        s"component $c: variance $variance vs eigenvalue ${m.eigenvalues(c)}")
    }
  }

  test("k < d reduces the output dimension; projections are centered") {
    val m = Similarity.pcaFit(diag, k = 1)
    assert(m.components.length == 1)
    val proj = Similarity.pcaTransform(diag, m)
      .select("projection").as[Seq[Double]].collect()
    assert(proj.forall(_.length == 1))
    assert(math.abs(proj.map(_.head).sum / proj.length) < 1e-9)
  }

  test("the sufficient-statistics aggregate matches a brute-force " +
    "covariance on random-ish data") {
    val data = (0 until 25).map { i =>
      (i.toLong, Seq((i * 37 % 11) - 5.0, (i * 53 % 7) - 3.0,
        (i * 29 % 13) - 6.0))
    }
    val df = data.toDF("id", "embedding")
    val m = Similarity.pcaFit(df, k = 3)
    // brute force covariance trace = sum of eigenvalues
    val vecs = data.map(_._2.toArray)
    val n = vecs.length.toDouble
    val mean = Array.tabulate(3)(c => vecs.map(_(c)).sum / n)
    val trace = (0 until 3).map { c =>
      vecs.map(v => (v(c) - mean(c)) * (v(c) - mean(c))).sum / n
    }.sum
    assert(math.abs(m.eigenvalues.sum - trace) < 1e-9)
    m.mean.zip(mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
  }

  test("k = d projection is an isometry: pairwise L2 distances survive " +
    "the rotation, so downstream L2 clustering/IVF is unchanged") {
    val m = Similarity.pcaFit(diag, k = 2)
    val orig = diag.as[(Long, Seq[Double])].collect().toMap
    val proj = Similarity.pcaTransform(diag, m)
      .as[(Long, Seq[Double])].collect().toMap
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map(p => (p._1 - p._2) * (p._1 - p._2)).sum
    for (i <- 0L until 5L; j <- (i + 1) to 5L) {
      assert(math.abs(d2(orig(i), orig(j)) - d2(proj(i), proj(j))) < 1e-9)
    }
  }

  test("pcaFit is deterministic and invariant to partitioning") {
    val a = Similarity.pcaFit(diag, k = 2)
    val b = Similarity.pcaFit(diag.repartition(7), k = 2)
    // partial-merge order changes float sums at ulp level only
    a.components.flatMap(_.toSeq).zip(b.components.flatMap(_.toSeq))
      .foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }

  test("pcaFit survives wildly disparate feature scales: a rotation " +
    "angle whose theta² overflows must rotate by ~1/(2θ), not 45°") {
    // cov ≈ [[2.5e160, 2.5], [2.5, 2.5e-160]] → θ ≈ −5e159, θ² = Inf;
    // the exact-form t underflows to −0.0 there, and treating that as
    // the 45° case mixes axes 160 orders of magnitude apart
    val df = Seq(
      (1L, Seq(1e80, 1e-80)), (2L, Seq(-1e80, -1e-80)),
      (3L, Seq(2e80, 2e-80)), (4L, Seq(-2e80, -2e-80))
    ).toDF("id", "embedding")
    val m = Similarity.pcaFit(df, k = 1)
    val c = m.components(0)
    assert(math.abs(math.abs(c(0)) - 1.0) < 1e-9, c.toSeq.toString)
    assert(math.abs(c(1)) < 1e-9, c.toSeq.toString)
  }
}
