package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mirrors the reference's gold-standard tests
  * (reference: tests/gentropy/dataset/test_l2g.py:28-158). */
class L2GGoldStandardSpec extends SparkSpec {
  import spark.implicits._

  test("process_gene_interactions keeps top-scoring pair") {
    val interactions = Seq(
      ("gene1", "gene2", 0.8), ("gene1", "gene2", 0.5), ("gene2", "gene3", 0.7))
      .toDF("targetA", "targetB", "scoring")
    val got = L2GGoldStandard.processGeneInteractions(interactions)
      .orderBy("geneIdA").collect()
    assert(got.map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq ==
      Seq(("gene1", "gene2", 0.8), ("gene2", "gene3", 0.7)))
  }

  test("filter_unique_associations drops overlapping loci of multi-locus genes") {
    val gs = Seq(
      ("1", "variant1", "study1", "gene1", "positive"),
      ("2", "variant2", "study1", "gene1", "negative"),
      ("3", "variant3", "study1", "gene1", "positive"),
      ("4", "variant4", "study1", "gene2", "positive"))
      .toDF("studyLocusId", "variantId", "studyId", "geneId", "goldStandardSet")
    val overlaps = Seq(
      ("1", "2", "variant2"), ("1", "4", "variant4"))
      .toDF("leftStudyLocusId", "rightStudyLocusId", "tagVariantId")
    val got = L2GGoldStandard.filterUniqueAssociations(gs, overlaps)
      .orderBy("studyLocusId").collect()
      .map(r => (r.getString(0), r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(("1", "gene1", "positive"), ("3", "gene1", "positive"),
      ("4", "gene2", "positive")))
  }

  test("remove_false_negatives drops negatives interacting with positives") {
    val gs = Seq(
      ("1", "variant1", "study1", "gene1", "positive"),
      ("2", "variant2", "study1", "gene2", "negative"),
      ("3", "variant3", "study1", "gene3", "negative"),
      ("4", "variant4", "study1", "gene4", "positive"))
      .toDF("studyLocusId", "variantId", "studyId", "geneId", "goldStandardSet")
    val interactions = Seq(
      ("gene1", "gene2", 0.8), ("gene1", "gene3", 0.5), ("gene1", "gene4", 0.8))
      .toDF("geneIdA", "geneIdB", "score")
    val got = L2GGoldStandard.removeFalseNegatives(gs, interactions)
      .orderBy("studyLocusId").collect()
      .map(r => (r.getString(0), r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(("1", "gene1", "positive"), ("3", "gene3", "negative"),
      ("4", "gene4", "positive")))
  }

  test("expand_gold_standard_with_negatives labels window genes") {
    val positives = Seq(("sl1", "study1", "v1", "geneA", Seq("src")))
      .toDF("studyLocusId", "studyId", "variantId", "geneId", "sources")
    val distances = Seq(
      ("v1", "geneA", 100L),   // curated gene -> positive
      ("v1", "geneB", 400000L), // window gene -> negative
      ("v1", "geneC", 600000L)) // outside window -> excluded
      .toDF("variantId", "targetId", "distanceFromTss")
    val got = L2GGoldStandard
      .expandGoldStandardWithNegatives(positives, distances)
      .select("geneId", "goldStandardSet").orderBy("geneId").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("geneA", "positive"), ("geneB", "negative")))
  }

  test("positive missing from the distance index stays positive") {
    val positives = Seq(("sl1", "study1", "vX", "geneA", Seq("src")))
      .toDF("studyLocusId", "studyId", "variantId", "geneId", "sources")
    val distances = Seq(("v1", "geneA", 100L))
      .toDF("variantId", "targetId", "distanceFromTss")
    val got = L2GGoldStandard
      .expandGoldStandardWithNegatives(positives, distances)
      .select("geneId", "goldStandardSet").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("geneA", "positive")))
  }

  test("trainer: grouped split never leaks a group across sides") {
    val rows = (1 to 200).map { i =>
      val gene = s"g${i % 20}"
      val trait_ = s"t${i % 7}"
      (s"sl$i", gene, trait_, (i % 13).toDouble / 13, (i % 5).toDouble / 5,
        if (i % 3 == 0) "positive" else "negative")
    }
    val m = rows.toDF("studyLocusId", "geneId", "traitFromSourceMappedId",
      "f1", "f2", "goldStandardSet")
    val (tr, te) = L2GTrainer.trainTestSplit(L2GTrainer.encodeLabel(m))
    val trG = tr.select(concat_ws("_", col("traitFromSourceMappedId"),
      col("geneId"))).distinct().as[String].collect().toSet
    val teG = te.select(concat_ws("_", col("traitFromSourceMappedId"),
      col("geneId"))).distinct().as[String].collect().toSet
    assert(trG.intersect(teG).isEmpty)
    assert(tr.count() + te.count() == 200)
  }

  test("trainer: CV folds partition the training set; metrics in range") {
    val rows = (1 to 300).map { i =>
      val pos = i % 3 == 0
      // informative feature so AUROC is meaningfully > 0.5
      val f1 = (if (pos) 0.7 else 0.3) + (i % 10) / 50.0
      (s"sl$i", s"g${i % 25}", s"t${i % 6}", f1, (i % 5) / 5.0,
        if (pos) "positive" else "negative")
    }
    val m = L2GTrainer.encodeLabel(
      rows.toDF("studyLocusId", "geneId", "traitFromSourceMappedId",
        "f1", "f2", "goldStandardSet"))
    val res = L2GTrainer.train(m, featureCols = Seq("f1", "f2"),
      nSplits = 3, maxIter = 5, maxDepth = 3)
    assert(res.cvMetrics.size == 3)
    assert(res.cvMetrics.map(_.nVal).sum > 0)
    res.cvMetrics.foreach { f =>
      assert(f.areaUnderROC >= 0.0 && f.areaUnderROC <= 1.0)
    }
    assert(res.holdoutAreaUnderROC > 0.6) // informative feature learned
  }
}
