package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

case class LdTag(tagVariantId: String, r2Overall: Option[Double])

class PicsSpec extends SparkSpec {
  import spark.implicits._

  test("PICS posterior matches reference doctest values") {
    // reference: src/gentropy/method/pics.py:130-146 —
    // ld_set [var1 r2=0.8, var2 r2=1.0], lead neglogP=10, k=6.4 →
    // var1 {se 0.07420896512708416, pp 0.07116959886882368}
    // var2 {se 0.9977000638225533, pp 0.9288304011311763}
    val df = Seq(("l1", 1.0f, -10, Seq(LdTag("var1", Some(0.8)), LdTag("var2", Some(1.0)))))
      .toDF("studyLocusId", "pValueMantissa", "pValueExponent", "ldSet")
    val byId = PICS.finemap(df).select(explode(col("locus")).as("t"))
      .select("t.variantId", "t.standardError", "t.posteriorProbability")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(byId("var1")._1 - 0.07420896512708416) < 1e-12)
    assert(math.abs(byId("var1")._2 - 0.07116959886882368) < 1e-12)
    assert(math.abs(byId("var2")._1 - 0.9977000638225533) < 1e-12)
    assert(math.abs(byId("var2")._2 - 0.9288304011311763) < 1e-12)
  }

  test("tags with r2 < 0.5 or null are dropped; null ldSet stays null") {
    val df = Seq(
      ("l1", 1.0f, -10, Some(Seq(LdTag("a", Some(0.3)), LdTag("b", None)))),
      ("l2", 1.0f, -10, None: Option[Seq[LdTag]])
    ).toDF("studyLocusId", "pValueMantissa", "pValueExponent", "ldSet")
    val out = PICS.finemap(df).select(col("studyLocusId"),
      coalesce(size(col("locus")), lit(-1)).as("n"),
      col("locus").isNull.as("isNull")).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out("l1") == (0, false))
    assert(out("l2") == (-1, true))
  }

  test("finemapFlat equals exploded finemap, dropping null/empty loci") {
    val df = Seq(
      ("l1", 1.0f, -10, Some(Seq(LdTag("var1", Some(0.8)), LdTag("var2", Some(1.0))))),
      ("l2", 2.5f, -6, Some(Seq(LdTag("a", Some(0.3)), LdTag("b", None), LdTag("c", Some(0.55))))),
      ("l3", 1.0f, -10, Some(Seq(LdTag("x", Some(0.2))))), // all filtered -> no rows
      ("l4", 1.0f, -10, None: Option[Seq[LdTag]])          // null ldSet  -> no rows
    ).toDF("studyLocusId", "pValueMantissa", "pValueExponent", "ldSet")
    val viaArray = PICS.finemap(df)
      .select(col("studyLocusId"), explode(col("locus")).as("t"))
      .select(col("studyLocusId"), col("t.variantId"), col("t.r2Overall"),
        col("t.standardError"), col("t.posteriorProbability"))
    val flat = PICS.finemapFlat(df)
      .select("studyLocusId", "variantId", "r2Overall",
        "standardError", "posteriorProbability")
    assert(flat.exceptAll(viaArray).count() == 0)
    assert(viaArray.exceptAll(flat).count() == 0)
    assert(flat.count() == 3) // l1 x2 + l2 x1
  }

  test("credible-set flags from cumulative posterior") {
    val df = Seq(("l1", Seq(
      ("v1", 0.5), ("v2", 0.3), ("v3", 0.15), ("v4", 0.05))))
      .toDF("studyLocusId", "raw")
      .withColumn("locus", expr(
        "transform(raw, x -> named_struct('variantId', x._1, 'posteriorProbability', x._2))"))
      .drop("raw")
    val out = CredibleSets.annotate(df)
      .select(explode(col("locus")).as("t"))
      .select("t.variantId", "t.is95CredibleSet", "t.is99CredibleSet")
      .collect().map(r => r.getString(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
    // sorted desc: v1(cum before=0) in both; v2(0.5) both; v3(0.8) both;
    // v4(0.95) not in 95 (0.95 !< 0.95) but in 99
    assert(out("v1") == (true, true))
    assert(out("v2") == (true, true))
    assert(out("v3") == (true, true))
    assert(out("v4") == (false, true))
  }
}
