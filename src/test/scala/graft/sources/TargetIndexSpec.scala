package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TargetIndexSpec extends SparkSpec {
  import spark.implicits._

  private def index = TargetIndex(Seq(
    TargetIndexRow("ENSG1", Some("BRCA1"), Some("protein_coding"),
      Some("BRCA1 DNA repair"), Some(Seq("ENST1")),
      Some(CanonicalTranscript(Some("ENST1"), Some("17"), Some(100L),
        Some(500L), Some("+"))),
      Some(GeneLocation(Some("17"), Some(100L), Some(500L), Some(1))),
      Some(Seq(ObsoleteSymbol(Some("RNF53"), Some("HGNC")))),
      Some(120L)),
    TargetIndexRow("ENSG2", Some("LINC1"), Some("lncRNA"), None, None,
      None, Some(GeneLocation(Some("2"), Some(900L), Some(1500L), Some(-1))),
      None, Some(1480L))
  ).toDF)

  test("filterByBiotypes keeps approved biotypes only") {
    val kept = TargetIndex.filterByBiotypes(index, Seq("protein_coding"))
      .df.select("id").as[String].collect()
    assert(kept.toSeq == Seq("ENSG1"))
  }

  test("locationsLut flattens genomicLocation + tss") {
    val lut = TargetIndex.locationsLut(index)
    assert(lut.columns.toSeq ==
      Seq("geneId", "chromosome", "start", "end", "strand", "tss"))
    val r = lut.filter($"geneId" === "ENSG1")
      .as[(String, String, Long, Long, Int, Long)].head()
    assert(r == (("ENSG1", "17", 100L, 500L, 1, 120L)))
  }

  test("symbolsLut explodes approved + obsolete symbols, keeps null-obsolete genes") {
    val lut = TargetIndex.symbolsLut(index)
    val syms = lut.select("geneSymbol", "geneId")
      .as[(String, String)].collect().toSet
    assert(syms == Set(("BRCA1", "ENSG1"), ("RNF53", "ENSG1"),
      ("LINC1", "ENSG2")))
  }

  test("geneLut feeds the L2G gene dimension shape") {
    val lut = TargetIndex.geneLut(index)
    assert(lut.columns.toSeq == Seq("id", "biotype", "chromosome", "tss"))
    assert(lut.count() == 2)
  }

  test("interval sources resolve symbols through the typed index") {
    val intervals = Seq(("17", 110, 130, "RNF53", Some(0.5)))
      .toDF("chromosome", "start", "end", "geneSymbol", "resourceScore")
    val resolved = Intervals.resolveGenes(intervals, index)
    assert(resolved.select("geneId").as[String].collect().toSeq == Seq("ENSG1"))

    val thurmanRaw = Seq(("chr17", 100, 500, "BRCA1", "chr17", 110, 130, 0.9f))
      .toDF("gene_chr", "gene_start", "gene_end", "gene_name",
        "chrom", "start", "end", "score")
    val t = Intervals.thurman(thurmanRaw, index, Intervals.noLift)
    assert(t.select("geneId").as[String].collect().toSeq == Seq("ENSG1"))
  }

  test("schema validation rejects a frame missing the mandatory id") {
    val bad = Seq(("BRCA1", "protein_coding")).toDF("approvedSymbol", "biotype")
    intercept[Exception] { TargetIndex(bad) }
    ()
  }
}
