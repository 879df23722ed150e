package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class VTag(variantId: String)

class ValidatorsSpec extends SparkSpec {
  import spark.implicits._
  import Validators._

  test("validateStudy flags flagged, missing and top-hit-with-sumstats studies") {
    val loci = Seq(
      ("l1", "sClean", Seq.empty[String]),
      ("l2", "sFlagged", Seq.empty[String]),
      ("l3", "sMissing", Seq.empty[String]),
      ("l4", "sClean", Seq(LocusFlags.TopHit)),
      ("l5", "sNoSumstats", Seq(LocusFlags.TopHit)))
      .toDF("studyLocusId", "studyId", "qualityControls")
    val studies = Seq(
      ("sClean", Seq.empty[String]),
      ("sFlagged", Seq("some flag")),
      ("sNoSumstats", Seq(StudyFlags.SumstatsNotAvailable)))
      .toDF("studyId", "qualityControls")
    val out = validateStudy(loci, studies)
      .select("studyLocusId", "qualityControls")
      .as[(String, Seq[String])].collect().toMap
    assert(out("l1").isEmpty)
    assert(out("l2") == Seq(LocusFlags.FlaggedStudy))
    assert(out("l3") == Seq(LocusFlags.MissingStudy))
    assert(out("l4") == Seq(LocusFlags.TopHit, LocusFlags.TopHitAndSummaryStats))
    // l5's study HAS the no-sumstats flag: top hit stays, plus FlaggedStudy
    assert(out("l5").contains(LocusFlags.FlaggedStudy))
    assert(!out("l5").contains(LocusFlags.TopHitAndSummaryStats))
  }

  test("chromosome and unique-id locus validators") {
    val loci = Seq(("l1", "1"), ("l2", "chr7"), ("l3", "MT"), ("l1", "X"))
      .toDF("studyLocusId", "chromosome")
    val chrOut = validateChromosomeLabel(loci)
      .select("studyLocusId", "chromosome", "qualityControls")
      .as[(String, String, Seq[String])].collect()
    assert(chrOut.filter(_._2 == "chr7")
      .head._3 == Seq(LocusFlags.InvalidChromosome))
    assert(chrOut.filter(_._2 == "1").head._3.isEmpty)
    val dupOut = validateUniqueStudyLocusId(loci)
      .select("studyLocusId", "qualityControls")
      .as[(String, Seq[String])].collect()
    assert(dupOut.count(_._2.contains(LocusFlags.DuplicatedStudyLocusId)) == 1)
  }

  test("validateVariantIdentifiers flags loci with unknown tags") {
    val loci = Seq(
      ("l1", Seq(VTag("v1"), VTag("v2"))),
      ("l2", Seq(VTag("v1"), VTag("vMissing"))))
      .toDF("studyLocusId", "locus")
    val vi = Seq("v1", "v2").toDF("variantId")
    val out = validateVariantIdentifiers(loci, vi)
      .select("studyLocusId", "qualityControls")
      .as[(String, Seq[String])].collect().toMap
    assert(out("l1").isEmpty)
    assert(out("l2") == Seq(LocusFlags.InvalidVariantIdentifier))
  }

  test("study index validators: unique id, type, target, biosample") {
    val studies = Seq(
      ("s1", "gwas", null.asInstanceOf[String], null.asInstanceOf[String]),
      ("s1", "gwas", null.asInstanceOf[String], null.asInstanceOf[String]),
      ("s2", "eqtl", "gKnown", "bKnown"),
      ("s3", "sqtl", "gUnknown", "bUnknown"),
      ("s4", "weird", "gKnown", "bKnown"))
      .toDF("studyId", "studyType", "geneId", "biosampleFromSourceId")
    val afterUnique = validateUniqueStudyId(studies)
    assert(afterUnique.filter(array_contains(col("qualityControls"),
      StudyFlags.DuplicatedStudy)).count() == 1)
    val afterType = validateStudyType(afterUnique)
    assert(afterType.filter(array_contains(col("qualityControls"),
      StudyFlags.UnknownStudyType)).select("studyId")
      .as[String].collect().toSeq == Seq("s4"))
    val targets = Seq("gKnown").toDF("id")
    val afterTarget = validateTarget(afterType, targets)
    assert(afterTarget.filter(array_contains(col("qualityControls"),
      StudyFlags.UnresolvedTarget)).select("studyId")
      .as[String].collect().toSeq == Seq("s3"))
    val biosamples = Seq("bKnown").toDF("biosampleId")
    val afterBio = validateBiosample(afterTarget, biosamples)
    assert(afterBio.filter(array_contains(col("qualityControls"),
      StudyFlags.UnknownBiosample)).select("studyId")
      .as[String].collect().toSeq == Seq("s3"))
  }

  test("validateDisease maps EFO ids and flags unresolved gwas studies") {
    val studies = Seq(
      ("s1", "gwas", Seq("EFO_1"), Seq.empty[String]),
      ("s2", "gwas", Seq("EFO_UNKNOWN"), Seq.empty[String]),
      ("s3", "eqtl", Seq.empty[String], Seq.empty[String]))
      .toDF("studyId", "studyType", "traitFromSourceMappedIds",
        "backgroundTraitFromSourceMappedIds")
    val diseaseMap = Seq(("EFO_1", "D1")).toDF("efo", "diseaseId")
    val byId = validateDisease(studies, diseaseMap)
      .collect().map(r => r.getString(0) ->
        (r.getSeq[String](r.fieldIndex("diseaseIds")),
          r.getSeq[String](r.fieldIndex("qualityControls")))).toMap
    assert(byId("s1")._1 == Seq("D1") && byId("s1")._2.isEmpty)
    assert(byId("s2")._1.filter(_ != null).isEmpty &&
      byId("s2")._2 == Seq(StudyFlags.UnresolvedDisease))
    assert(byId("s3")._2.isEmpty) // non-gwas not flagged
  }

  test("annotateSumstatsQc derives all threshold flags") {
    val studies = Seq(("sGood", "gwas"), ("sBad", "gwas"), ("sNone", "gwas"))
      .toDF("studyId", "studyType")
    val qcMetrics = Seq(
      ("sGood", 0.01, 0.01, 0.01, 1.1, 3000000L),
      ("sBad", 0.5, 0.5, 0.5, 5.0, 10L))
      .toDF("studyId", "mean_beta", "mean_diff_pz", "se_diff_pz",
        "gc_lambda", "n_variants")
    val byId = annotateSumstatsQc(studies, qcMetrics)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Boolean]("hasSumstats"),
          r.getSeq[String](r.fieldIndex("qualityControls")))).toMap
    assert(byId("sGood") == ((true, Seq.empty)))
    assert(byId("sBad")._2.toSet == Set(
      StudyFlags.FailedMeanBetaCheck, StudyFlags.FailedPzCheck,
      StudyFlags.FailedGcLambdaCheck, StudyFlags.SmallNumberOfSnps))
    assert(byId("sNone") == ((false, Seq(StudyFlags.SumstatsNotAvailable))))
  }
}
