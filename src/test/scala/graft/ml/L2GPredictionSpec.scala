package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class L2GPredictionSpec extends SparkSpec {
  import spark.implicits._

  private def matrix = (1 to 120).map { i =>
    val pos = i % 2 == 0
    (s"sl$i", s"g${i % 10}", if (pos) 0.8 + (i % 5) / 50.0 else 0.2,
      (i % 7) / 7.0, if (i % 3 == 0) 0.0 else 1.0,
      if (pos) 1.0 else 0.0)
  }.toDF("studyLocusId", "geneId", "f1", "f2", "isProteinCoding",
    "goldStandardSet")

  test("fromCredibleSet scores GWAS protein-coding rows in [0,1]") {
    val model = L2GModel.train(matrix, Seq("f1", "f2"), maxIter = 5,
      maxDepth = 3)
    val credSets = (1 to 120).map(i =>
      (s"sl$i", if (i <= 100) "gwas" else "eqtl")).toDF("studyLocusId", "studyType")
    val preds = L2GPrediction.fromCredibleSet(model, credSets,
      matrix.drop("goldStandardSet"))
    val rows = preds.collect()
    assert(rows.nonEmpty)
    // eqtl loci and non-protein-coding rows excluded
    val kept = rows.map(_.getString(0)).toSet
    assert(!kept.exists(id => id.stripPrefix("sl").toInt > 100))
    assert(rows.forall { r =>
      val s = r.getDouble(2); s >= 0.0 && s <= 1.0
    })
  }

  test("evidence export explodes diseases above threshold") {
    val preds = Seq(("sl1", "g1", 0.9), ("sl2", "g2", 0.01))
      .toDF("studyLocusId", "geneId", "score")
    val loci = Seq(("sl1", "s1"), ("sl2", "s2")).toDF("studyLocusId", "studyId")
    val studies = Seq(("s1", Seq("EFO_1", "EFO_2")), ("s2", Seq("EFO_3")))
      .toDF("studyId", "diseaseIds")
    val ev = L2GPrediction.toDiseaseTargetEvidence(preds, loci, studies)
      .collect()
    assert(ev.length == 2) // sl2 below threshold
    assert(ev.map(_.getAs[String]("diseaseFromSourceMappedId")).toSet ==
      Set("EFO_1", "EFO_2"))
    assert(ev.forall(_.getAs[String]("datasourceId") == "gwas_credible_sets"))
  }

  test("addFeatures attaches name/value structs from the matrix") {
    val preds = Seq(("sl1", "g1", 0.9)).toDF("studyLocusId", "geneId", "score")
    val fm = Seq(("sl1", "g1", 0.25, 0.75)).toDF("studyLocusId", "geneId", "f1", "f2")
    val out = L2GPrediction.addFeatures(preds, fm, Seq("f1", "f2")).head
    val feats = out.getSeq[org.apache.spark.sql.Row](out.fieldIndex("features"))
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(feats == Map("f1" -> 0.25, "f2" -> 0.75))
  }

  test("occlusion attributions: informative feature dominates") {
    val model = L2GModel.train(matrix, Seq("f1", "f2"), maxIter = 5,
      maxDepth = 3)
    val out = L2GPrediction.explainByOcclusion(model,
      matrix.drop("goldStandardSet").limit(10), Seq("f1", "f2"))
    val r = out.head
    val attrs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("attributions"))
    assert(attrs.map(_.getString(0)).toSet == Set("f1", "f2"))
    // f1 carries the label signal; its average |delta| should dominate
    val byName = out.collect().flatMap { row =>
      row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("attributions"))
        .map(a => a.getString(0) -> math.abs(a.getDouble(1)))
    }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum / v.length }
    assert(byName("f1") >= byName("f2"))
  }
}
