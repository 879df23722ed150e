package graft.sources

import graft.SparkSpec
import graft.finemap.PairwiseLD
import org.apache.spark.sql.functions._

class GnomadLdSpec extends SparkSpec {
  import spark.implicits._

  private def indexRaw = Seq(
    ("chr1", 100L, Seq("A", "G"), 0L),
    ("chr1", 200L, Seq("C", "T"), 1L),
    ("chr1", 300L, Seq("G", "A"), 2L))
    .toDF("contig", "position", "alleles", "idx")

  private def entries = Seq(
    (0L, 0L, 1.0), (0L, 1L, 0.9), (1L, 1L, 1.0),
    (0L, 2L, 0.1), // below sqrt(0.5): filtered
    (2L, 2L, 1.0))
    .toDF("i", "j", "r")

  test("index processing builds ids and drops ambiguous liftovers") {
    val ambiguous = indexRaw.unionByName(
      Seq(("chr1", 100L, Seq("A", "G"), 9L))
        .toDF("contig", "position", "alleles", "idx"))
    val lut = GnomadLd.processVariantIndices(ambiguous)
      .select("variantId", "idx").as[(String, Long)].collect().toMap
    assert(lut == Map("1_200_C_T" -> 1L, "1_300_G_A" -> 2L))
  }

  test("full ingestion: filter, resolve, mirror, aggregate") {
    val ld = GnomadLd.asLdIndex(Seq(("nfe", entries, indexRaw)), minR2 = 0.5)
    val rows = ld.select(col("variantId"), explode(col("ldSet")).as("t"))
      .select(col("variantId"), col("t.tagVariantId"),
        explode(col("t.rValues")).as("rv"))
      .select(col("variantId"), col("tagVariantId"),
        col("rv.population"), col("rv.r"))
      .as[(String, String, String, Double)].collect().toSet
    // self-r on the diagonal plus the mirrored 0.9 pair; 0.1 filtered
    assert(rows.contains(("1_100_A_G", "1_200_C_T", "nfe", 0.9)))
    assert(rows.contains(("1_200_C_T", "1_100_A_G", "nfe", 0.9)))
    assert(rows.contains(("1_100_A_G", "1_100_A_G", "nfe", 1.0)))
    assert(!rows.exists(r => r._2 == "1_300_G_A" && r._1 != "1_300_G_A"))
  }

  test("long format for loci matches the fine-mapper contract") {
    val square = Seq(
      ("vA", "vB", 0.8), ("vB", "vA", 0.8),
      ("vA", "vC", 0.2) // vC not in locus: dropped
    ).toDF("variantIdI", "variantIdJ", "r")
    val loci = Seq(("L1", "vA"), ("L1", "vB")).toDF("locusId", "variantId")
    val long = GnomadLd.longFormatForLoci(loci, square)
      .as[(String, Int, Int, Double)].collect().toSet
    assert(long == Set(("L1", 0, 1, 0.8), ("L1", 1, 0, 0.8)))
  }

  test("gnomad variants reader shapes the index and hashes long ids") {
    val sites = Seq(
      ("chr1", 100L, Seq("A", "G"),
        Seq(AfEntry("nfe_adj", 0.3), AfEntry("afr_adj", 0.7))),
      ("chr1", 150L, Seq("A", "G", "T"), Seq.empty[AfEntry]), // multi-allelic
      ("chr2", 200L, Seq("A" * 200, "G"), Seq.empty[AfEntry]))
      .toDF("contig", "position", "alleles", "alleleFrequencies")
    val vi = GnomadVariants.asVariantIndex(sites)
    val ids = vi.select("variantId").as[String].collect().toSet
    assert(ids.size == 2)
    assert(ids.contains("1_100_A_G"))
    assert(ids.exists(_.startsWith("OTVAR_2_200_")))
    val xref = vi.filter(col("chromosome") === "1")
      .select(explode(col("dbXrefs")).as("x")).select("x.id", "x.source")
      .as[(String, String)].head()
    assert(xref == (("1-100-A-G", "gnomad")))
  }

  test("pairwise LD slice: overlap, variant list, dense matrix") {
    val square = Seq(
      ("1_100_A_G", "1_200_C_T", 0.9), ("1_200_C_T", "1_100_A_G", 0.9),
      ("1_100_A_G", "1_900_G_A", 0.5))
      .toDF("variantIdI", "variantIdJ", "r")
    val variants = Seq("1_100_A_G", "1_200_C_T").toDF("variantId")
    val sliced = PairwiseLD.overlap(square, variants)
    assert(sliced.count() == 2)
    val vl = PairwiseLD.variantList(sliced)
    assert(vl == Seq("1_100_A_G", "1_200_C_T"))
    val m = PairwiseLD.toDenseMatrix(sliced, vl)
    assert(m(0, 0) == 1.0 && m(0, 1) == 0.9 && m(1, 0) == 0.9)
  }
}

case class AfEntry(populationName: String, alleleFrequency: Double)
