package graft.operators

import graft.SparkSpec
import graft.ml.L2GFeatures
import org.apache.spark.sql.functions._

case class Ld2(tagVariantId: String, r2Overall: Option[Double])
case class Tag2(variantId: String, posteriorProbability: Option[Double])

class LDClumpingL2GSpec extends SparkSpec {
  import spark.implicits._

  test("LD clumping flags leads linked to stronger leads via ldSet") {
    val df = Seq(
      // strongest lead v1; v2 is in LD with v1 -> clumped; v3 indep
      ("s1", "1", "v1", 1.0f, -12, Some(Seq(Ld2("v2", Some(0.9)))), Some(Seq(Tag2("v1", Some(1.0))))),
      ("s1", "1", "v2", 1.0f, -8, Some(Seq(Ld2("v1", Some(0.9)))), Some(Seq(Tag2("v2", Some(1.0))))),
      ("s1", "1", "v3", 1.0f, -6, Some(Seq(Ld2("v9", Some(0.7)))), Some(Seq(Tag2("v3", Some(1.0))))),
      // other chromosome: no interference
      ("s1", "2", "v1", 1.0f, -4, Some(Seq(Ld2("v2", Some(0.9)))), Some(Seq(Tag2("v1", Some(1.0)))))
    ).toDF("studyId", "chromosome", "variantId", "pValueMantissa",
      "pValueExponent", "ldSet", "locus")
      .withColumn("qualityControls", lit(null).cast("array<string>"))
    val out = LDClumping.clump(df)
    val flags = out.select(col("chromosome"), col("variantId"),
      array_contains(coalesce(col("qualityControls"), array()),
        LDClumping.LdClumpedFlag).as("clumped"),
      col("locus").isNull.as("locusNulled"))
      .as[(String, String, Boolean, Boolean)].collect().toSet
    assert(flags == Set(
      ("1", "v1", false, false),
      ("1", "v2", true, true), // linked to stronger v1
      ("1", "v3", false, false),
      ("2", "v1", false, false)))
  }

  test("LD clumping caps running state on a degenerate partition") {
    // 500 mutually-unlinked leads in ONE (study, chromosome): with the
    // cap at 50, ranks 1-50 are evaluated against a running set that
    // never exceeds 50 entries (overflow rows contribute null to the
    // collect_set) and stay unflagged; ranks 51+ are conservatively
    // flagged instead of growing the window state.
    val df = (1 to 500).map { i =>
      ("s1", "1", f"v$i%04d", 1.0f, -100 + i,
        Some(Seq(Ld2(s"x$i", Some(0.9)))),
        Some(Seq(Tag2(f"v$i%04d", Some(1.0)))))
    }.toDF("studyId", "chromosome", "variantId", "pValueMantissa",
      "pValueExponent", "ldSet", "locus")
      .withColumn("qualityControls", lit(null).cast("array<string>"))
    val out = LDClumping.clump(df, maxLeadsPerPartition = 50)
      .select(col("pValueExponent"),
        array_contains(coalesce(col("qualityControls"), array()),
          LDClumping.LdClumpedFlag).as("clumped"))
      .as[(Int, Boolean)].collect()
    assert(out.count(!_._2) == 50)
    assert(out.filter(_._2).map(_._1).min == -100 + 51)
    // under the cap the guarded path is byte-identical to the plain one
    val capped = LDClumping.clump(df).select("variantId", "qualityControls")
    val plain = LDClumping.clump(df, maxLeadsPerPartition = Int.MaxValue)
      .select("variantId", "qualityControls")
    assert(capped.exceptAll(plain).isEmpty && plain.exceptAll(capped).isEmpty)
  }

  test("L2G distance features: mean weighted, sentinel, neighbourhood") {
    val credSets = Seq(
      ("sl1", "v1", Seq(Tag2("v1", Some(0.8)), Tag2("v2", Some(0.2))))
    ).toDF("studyLocusId", "variantId", "locus")
    val distances = Seq(
      ("v1", "g1", 1000L), ("v1", "g2", 100000L),
      ("v2", "g1", 5000L), ("v2", "g2", 90000L)
    ).toDF("variantId", "geneId", "distanceFromTss")

    val mean = L2GFeatures.distanceMeanFeature(credSets, distances,
      "distanceFromTss", "distanceTssMean")
    val m = mean.collect().map(r =>
      r.getString(1) -> r.getDouble(2)).toMap
    val w = 500000.0
    val expectedG1 = math.log10((w - 1000 + 1) * 0.8 + (w - 5000 + 1) * 0.2) /
      math.log10(w + 1)
    assert(math.abs(m("g1") - expectedG1) < 1e-12)
    assert(m("g1") > m("g2")) // nearer gene scores higher

    val sentinel = L2GFeatures.distanceSentinelFeature(credSets, distances,
      "distanceFromTss", "distanceTssSentinel")
    val s = sentinel.collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(math.abs(s("g1") - math.log10(w - 1000 + 1) / math.log10(w + 1)) < 1e-12)

    val genes = Seq(("g1", "protein_coding"), ("g2", "protein_coding"),
      ("g3", "lncRNA")).toDF("id", "biotype")
    val neigh = L2GFeatures.neighbourhoodFeature(mean, genes,
      "distanceTssMean", "distanceTssMeanNeighbourhood")
    val n = neigh.select("geneId", "distanceTssMeanNeighbourhood")
      .as[(String, Double)].collect().toMap
    assert(n("g1") == 1.0) // regional max normalises to itself
    assert(n("g2") < 1.0 && n("g2") > 0.0)

    val matrix = L2GFeatures.featureMatrix(Seq(mean, sentinel))
    assert(matrix.columns.toSet ==
      Set("studyLocusId", "geneId", "distanceTssMean", "distanceTssSentinel"))
    assert(matrix.count() == 2)
  }
}
