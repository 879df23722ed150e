package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AminoAcidVariantsSpec extends SparkSpec {
  import spark.implicits._

  test("FoldX ingestion: plddt filter, ambiguity exclusion, normalised ddG") {
    val foldx = Seq(
      // P1: confident residue, ddG 1.0 -> normalised 0.5
      ("P1", 10, "A", "V", 0.9, 1.0),
      // P1 duplicate position/wild_type with DIFFERENT plddt -> ambiguous, excluded
      // P2: saturating ddG
      ("P2", 5, "G", "R", 0.8, 3.5),
      // P3: below plddt threshold -> dropped
      ("P3", 7, "L", "P", 0.5, 2.0))
      .toDF("protein_acc", "position", "wild_type", "mutated_type",
        "plddt", "foldx_ddg")
    val ambiguous = Seq(("P4", 1, "A", "T", 0.9, 1.0), ("P4", 1, "A", "S", 0.95, 1.2))
      .toDF("protein_acc", "position", "wild_type", "mutated_type",
        "plddt", "foldx_ddg")
    val out = AminoAcidVariants.ingestFoldx(foldx.unionByName(ambiguous))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(out.toSet == Set(("P1", "A10V"), ("P2", "G5R")))
    val eff = AminoAcidVariants.ingestFoldx(foldx)
      .filter(col("uniprotAccession") === "P2")
      .select(explode(col("variantEffect")).as("e"))
      .select("e.method", "e.normalisedScore").head
    assert(eff.getString(0) == "FoldX")
    assert(eff.getDouble(1) == 1.0) // |3.5| >= 2 saturates
  }

  test("LoF curation: GRCh38 coords + GRCh37 alleles, verdict scores") {
    val lof = Seq(
      ("1-100-A-T", "1-101-A-T", "lof"),
      ("2-200-C-G", "2-201-C-G", "likely_not_lof"))
      .toDF("Variant ID GRCh37", "Variant ID GRCh38", "Verdict")
    val out = AminoAcidVariants.lofCurationAsVariantIndex(lof)
      .select(col("variantId"), col("position"),
        element_at(col("variantEffect"), 1).getField("normalisedScore")
          .as("ns"), col("variantDescription"))
      .collect()
    val m = out.map(r => r.getString(0) -> (r.getInt(1), r.getDouble(2),
      r.getString(3))).toMap
    assert(m("1_101_A_T") == ((101, 1.0,
      "Assessed to cause LoF by OTAR2075 variant curation effort.")))
    assert(m("2_201_C_G")._2 == -0.5)
  }

  test("amino-acid annotation enriches variantEffect and keeps best row") {
    val vi = Seq(
      ("v1", Seq(("A10V", Seq("P1"))), Seq(("VEP", 0.5))),
      ("v2", Seq(("G5R", Seq("P9"))), Seq(("VEP", 0.1))))
      .toDF("variantId", "tcRaw", "effRaw")
      .select(col("variantId"),
        expr("transform(tcRaw, t -> named_struct('aminoAcidChange', t._1," +
          "'uniprotAccessions', t._2))").as("transcriptConsequences"),
        expr("transform(effRaw, e -> named_struct('method', e._1, " +
          "'assessment', CAST(NULL AS STRING), 'score', CAST(e._2 AS FLOAT)," +
          "'assessmentFlag', CAST(NULL AS STRING)," +
          "'targetId', CAST(NULL AS STRING)," +
          "'normalisedScore', CAST(NULL AS DOUBLE)))").as("variantEffect"))
    val ann = Seq(("P1", "A10V", Seq(("FoldX", 0.8f))))
      .toDF("uniprotAccession", "aminoAcidChange", "effRaw")
      .select(col("uniprotAccession"), col("aminoAcidChange"),
        expr("transform(effRaw, e -> named_struct('method', e._1, " +
          "'assessment', CAST(NULL AS STRING), 'score', e._2," +
          "'assessmentFlag', CAST(NULL AS STRING)," +
          "'targetId', CAST(NULL AS STRING)," +
          "'normalisedScore', CAST(0.4 AS DOUBLE)))").as("variantEffect"))
    val out = AminoAcidVariants.annotateWithAminoAcidConsequences(vi, ann)
    assert(out.count() == 2)
    val v1 = out.filter(col("variantId") === "v1")
      .select(size(col("variantEffect"))).head.getInt(0)
    assert(v1 == 2) // VEP + FoldX merged
    val v2 = out.filter(col("variantId") === "v2")
      .select(size(col("variantEffect"))).head.getInt(0)
    assert(v2 == 1) // untouched
  }
}
