package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class Ancestry(ancestry: String, sampleSize: Double)

class IndexOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashLongVariantIds matches reference doctest behaviour") {
    val df = Seq(
      (Some("v_short"), Some("x"), Some(23)),
      (Some("v_looooooong"), Some("23"), Some(23)),
      (Some("no_chrom"), None, None),
      (None, None, None)
    ).toDF("variantId", "chromosome", "position")
      .select(VariantOps.hashLongVariantIds(col("variantId"), col("chromosome"),
        col("position"), 10).as("h"))
    val out = df.collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out(0) == "v_short")
    assert(out(1) == "OTVAR_23_23_3749d019d645894770c364992ae70a05")
    assert(out(2) == "OTVAR_41acfcd7d4fd523b33600b504914ef25")
    assert(out(3) == null)
  }

  test("mergeAnnotations outer-joins and unions nested arrays") {
    val l = Seq(("v1", Some("1"), Some(Seq("a"))), ("v2", Some("2"), None))
      .toDF("variantId", "chromosome", "xrefs")
    val r = Seq(("v1", Some("1"), Some(Seq("b"))), ("v3", Some("3"), Some(Seq("c"))))
      .toDF("variantId", "chromosome", "xrefs")
    val m = VariantOps.mergeAnnotations(l, r, Seq("xrefs"))
      .select("variantId", "xrefs").as[(String, Option[Seq[String]])]
      .collect().toMap
    assert(m("v1").get.toSet == Set("a", "b"))
    assert(m("v2").isEmpty)
    assert(m("v3").get == Seq("c"))
  }

  test("effect-score normalisation is bounded and monotone per method") {
    val df = Seq(("CADD", 20.0), ("CADD", 60.0), ("SIFT", 0.0), ("GERP", -5.0))
      .toDF("method", "score")
      .select(VariantOps.normalisedEffectScore(col("method"), col("score")).as("n"))
    val out = df.as[Double].collect()
    assert(math.abs(out(0) - 0.5) < 1e-12)
    assert(out(1) == 1.0) // clamped
    assert(out(2) == 1.0) // SIFT 0 = most damaging
    assert(out(3) == 0.0) // clamped below
  }

  test("ancestry aggregation maps to LD populations with relative sizes") {
    val df = Seq(Tuple1(Seq(
      Ancestry("European", 1000.0),
      Ancestry("Finnish", 500.0),
      Ancestry("NR", 500.0) // also nfe -> aggregates with European
    ))).toDF("discoverySamples")
      .select(StudyIndexOps.aggregateAndMapAncestries(col("discoverySamples"))
        .as("ld"))
    val pops = df.select(explode(col("ld")).as("p"))
      .select("p.ldPopulation", "p.relativeSampleSize")
      .as[(String, Double)].collect().toMap
    assert(math.abs(pops("nfe") - 0.75) < 1e-12)
    assert(math.abs(pops("fin") - 0.25) < 1e-12)
  }

  test("study deconvolution: one row per study, QC union, first non-null meta") {
    val df = Seq(
      ("s1", "src2", Some(Seq("F2")), None: Option[Int]),
      ("s1", "src1", Some(Seq("F1")), Some(100)),
      ("s2", "src1", None: Option[Seq[String]], Some(7))
    ).toDF("studyId", "projectId", "qualityControls", "nSamples")
    val out = StudyIndexOps.deconvolveStudies(df)
    assert(out.count() == 2)
    val s1 = out.filter(col("studyId") === "s1")
      .select("qualityControls", "nSamples").head
    assert(s1.getSeq[String](0).toSet == Set("F1", "F2"))
    assert(s1.getInt(1) == 100)
  }
}
