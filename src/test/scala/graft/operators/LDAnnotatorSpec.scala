package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class AnnRVal(population: String, r: Option[Double])
case class AnnLdTag(tagVariantId: String, rValues: Seq[AnnRVal])
case class AnnPop(ldPopulation: String, relativeSampleSize: Option[Double])

class LDAnnotatorSpec extends SparkSpec {
  import spark.implicits._

  private val studies = Seq(
    ("s_nfe", Seq(AnnPop("afr", Some(0.4)), AnnPop("nfe", Some(0.6)))),
    // tie at the top WITH nfe → nfe wins regardless of array order
    ("s_tie", Seq(AnnPop("eas", Some(0.5)), AnnPop("nfe", Some(0.5)))),
    ("s_eas", Seq(AnnPop("csa", Some(0.2)), AnnPop("eas", Some(0.8))))
  ).toDF("studyId", "ldPopulationStructure")

  private def assoc(rows: (String, String, String)*) =
    rows.toSeq.toDF("studyId", "chromosome", "variantId")
      .withColumn("qualityControls", lit(null).cast("array<string>"))

  test("major-population resolution, threshold filter, ANSI-safe " +
    "missing population, lead rescue and self-tag force") {
    val ld = Seq(
      // v1: tag t1 has nfe r=0.9 (r²=0.81 keeps), tag t2 carries ONLY
      // afr (missing the major pop → r²=0, filtered; used to THROW
      // under ANSI via getItem(0) on the empty filtered array)
      ("v1", "1", Seq(
        AnnLdTag("t1", Seq(AnnRVal("nfe", Some(0.9)), AnnRVal("afr", Some(0.1)))),
        AnnLdTag("t2", Seq(AnnRVal("afr", Some(0.95)))))),
      // v2: self-tag below-1 r survives the threshold then forces r²=1
      ("v2", "1", Seq(
        AnnLdTag("v2", Seq(AnnRVal("nfe", Some(0.8)))),
        AnnLdTag("t3", Seq(AnnRVal("nfe", Some(0.2))))))
    ).toDF("variantId", "chromosome", "ldSet")
    val out = LDAnnotator.ldAnnotate(
      assoc(("s_nfe", "1", "v1"), ("s_tie", "1", "v2"),
        ("s_eas", "1", "v1"), ("s_nfe", "1", "v9")),
      studies, ld, r2Threshold = 0.5)
    val flat = out.select(col("studyId"), col("variantId"),
      array_contains(coalesce(col("qualityControls"), array()),
        LDAnnotator.UnresolvedLdFlag).as("flagged"),
      explode(col("ldSet")).as("t"))
      .select(col("studyId"), col("variantId"), col("flagged"),
        col("t.tagVariantId"), round(col("t.r2Overall"), 6).as("r2"))
      .as[(String, String, Boolean, String, Double)].collect().toSet
    assert(flat == Set(
      // s_nfe/v1: only t1 survives (t2 lacks nfe → r²=0 filtered)
      ("s_nfe", "v1", false, "t1", 0.81),
      // s_tie resolves to nfe (tie + nfe present); the self-tag is
      // forced to 1.0 after surviving at 0.64
      ("s_tie", "v2", false, "v2", 1.0),
      // s_eas: no tag carries eas → all r²=0 → filtered → flagged +
      // rescued to the lead at r²=1
      ("s_eas", "v1", true, "v1", 1.0),
      // v9 absent from the LD index entirely → flagged + rescued
      ("s_nfe", "v9", true, "v9", 1.0)))
  }
}
