package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def writeTsv(name: String, content: String): String = {
    val p = Files.createTempDirectory("src").resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("GWAS Catalog reader: new hm_ format with p_value strings") {
    val path = writeTsv("GCST123.tsv",
      """hm_chrom	hm_pos	hm_other_allele	hm_effect_allele	p_value	hm_beta	standard_error	effect_allele_frequency	n
        |1	100	A	T	4.2E-45	0.5	0.1	0.25	1000
        |1	200	G	C	0.01	0.0	0.1	0.5	1000
        |1		G	C	1e-8	0.3	0.1	0.5	1000
        |2	300	C	G	1e-300	-0.2	0.05	0.1	2000""".stripMargin)
    val df = GwasCatalogSumstats.fromHarmonizedFile(spark, path, "GCST123",
      partitions = 2)
    val rows = df.select("variantId", "pValueMantissa", "pValueExponent", "beta")
      .as[(String, Float, Int, Double)].collect().toSet
    // beta=0 row and null-position row dropped
    assert(rows == Set(
      ("1_100_A_T", 4.2f, -45, 0.5),
      ("2_300_C_G", 1.0f, -300, -0.2)))
    assert(df.columns.contains("standardError"))
  }

  test("GWAS Catalog reader: legacy format with neg_log_10_p_value and odds ratio") {
    val path = writeTsv("GCST9.tsv",
      """chromosome	base_pair_location	other_allele	effect_allele	neg_log_10_p_value	odds_ratio
        |3	500	T	G	7.30103	2.0""".stripMargin)
    val df = GwasCatalogSumstats.fromHarmonizedFile(spark, path, "GCST9")
    val r = df.select("variantId", "pValueMantissa", "pValueExponent", "beta").head
    assert(r.getString(0) == "3_500_T_G")
    assert(math.abs(r.getFloat(1) - 5.0f) < 1e-3 && r.getInt(2) == -8)
    assert(math.abs(r.getDouble(3) - math.log(2.0)) < 1e-12) // OR -> beta
  }

  test("FinnGen reader parses gz-style TSV and derives studyId from filename") {
    val path = writeTsv("FINNGEN_R9_AB1.tsv",
      """#chrom	pos	ref	alt	rsids	nearest_genes	pval	mlogp	beta	sebeta	af_alt	af_alt_cases	af_alt_controls
        |1	100	A	T	rs1	G1	5e-10	9.3	0.4	0.05	0.3	0.31	0.29
        |X	999	C	G	rs2	G2	0.5	0.3	-0.1	0.2	0.01	0.01	0.01""".stripMargin)
    val df = FinnGenSumstats.fromSource(spark, path)
    val rows = df.select("studyId", "variantId", "pValueExponent", "beta")
      .as[(String, String, Int, Double)].collect().toSet
    assert(rows == Set(
      ("FINNGEN_R9_AB1", "1_100_A_T", -10, 0.4),
      ("FINNGEN_R9_AB1", "X_999_C_G", -1, -0.1)))
  }

  test("eQTL SuSiE parser: element_at logBF selection + locus assembly") {
    val credSets = Seq(
      ("t1", "r1", "chr1_100_A_T", "d1", 1, 0.8, "1", 100, 1e-9, 0.5, 0.1),
      ("t1", "r1", "chr1_200_G_C", "d1", 1, 0.2, "1", 200, 1e-5, 0.3, 0.1),
      ("t1", "r1", "chr1_300_T_G", "d1", 2, 0.9, "1", 300, 1e-7, 0.2, 0.1)
    ).toDF("molecular_trait_id", "region", "variant", "dataset_id",
      "credibleSetIndex", "pip", "chromosome", "position", "pvalue", "beta", "se")
    val lbf = Seq(
      ("t1", "r1", "chr1_100_A_T", "d1", 3.5, 0.1),
      ("t1", "r1", "chr1_200_G_C", "d1", 2.5, 0.2),
      ("t1", "r1", "chr1_300_T_G", "d1", 0.1, 4.0)
    ).toDF("molecular_trait_id", "region", "variant", "dataset_id",
      "lbf_variable1", "lbf_variable2")
      .withColumns((3 to 10).map(i => s"lbf_variable$i" -> lit(0.0)).toMap)
    val meta = Seq(("d1", "Study1", "ge", "brain", "ENSG1", "brain_tissue"))
      .toDF("dataset_id", "study_label", "quant_method", "sample_group",
        "gene_id", "tissue_id")

    val parsed = EqtlCatalogueSusie.parseSusieResults(credSets, lbf, meta)
    val got = parsed.select("variantId", "logBF")
      .as[(String, Double)].collect().toMap
    assert(got("1_100_A_T") == 3.5) // cs 1 -> lbf_variable1
    assert(got("1_300_T_G") == 4.0) // cs 2 -> lbf_variable2

    val loci = EqtlCatalogueSusie.fromSusieResults(parsed)
    assert(loci.count() == 2) // one row per credible set
    val cs1 = loci.filter(col("credibleSetIndex") === 1)
    assert(cs1.select("variantId").as[String].head() == "1_100_A_T") // lead
    assert(cs1.select(size(col("locus"))).as[Int].head() == 2)

    // quant_method ge + bulk default -> eqtl
    assert(parsed.select("studyType").distinct().as[String].head() == "eqtl")
    // reference doctest: study_index.py:70-79
    val st = Seq(("ge", "bulk"), ("leafcutter", "bulk"), ("tx", "single-cell"))
      .toDF("quant_method", "study_type")
      .select(EqtlCatalogueSusie.identifyStudyType(
        col("quant_method"), col("study_type")).as("t"))
      .as[String].collect().toSeq
    assert(st == Seq("eqtl", "sqtl", "sceqtl"))
  }

  test("liftover: chain parse, shift, flip handling, interval filter") {
    // one chain: chr1 [0,1000) -> chr1 [100,1100), with a 10bp deletion
    // after the first 500 bases
    val chain =
      """chain 1000 chr1 2000 + 0 1010 chr1 3000 + 100 1110 1
        |500	10	0
        |500
        |""".stripMargin
    val idx = Liftover.parseChainFile(chain.linesIterator)
    assert(Liftover.convert(idx, "1", 10L).contains(("1", 110L)))
    assert(Liftover.convert(idx, "1", 499L).contains(("1", 599L)))
    // inside the deletion gap -> unmapped
    assert(Liftover.convert(idx, "1", 505L).isEmpty)
    // after the gap: src 510 -> tgt 600+10=... (src 510 = block2 start)
    assert(Liftover.convert(idx, "1", 510L).contains(("1", 600L)))
    assert(Liftover.convert(idx, "chr1", 10L).contains(("1", 110L))) // chr prefix
    assert(Liftover.convert(idx, "7", 10L).isEmpty) // unknown chrom

    val df = Seq(("1", 11, 400), ("1", 450, 5000)).toDF("chromosome", "start", "end")
    val lifted = Liftover.liftIntervals(spark, df, idx)
    // second interval's end does not map -> dropped; start lifts at
    // start+1 per the reference convention
    val rows = lifted.as[(String, Int, Int)].collect()
    assert(rows.length == 1 && rows.head == ("1", 112, 500))
  }
}
