package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class FinnGenSusieSpec extends SparkSpec {
  import spark.implicits._

  private def writeTsv(name: String, header: Seq[String],
                       rows: Seq[Seq[Any]]): String = {
    val p = Files.createTempDirectory("fg").resolve(name)
    val body = (header.mkString("\t") +:
      rows.map(_.mkString("\t"))).mkString("\n")
    Files.writeString(p, body)
    p.toString
  }

  test("FinnGen SuSiE: snp + cred assembly with element_at selection") {
    val tenAlpha = (1 to 10).map(i => s"alpha$i")
    val tenLbf = (1 to 10).map(i => s"lbf_variable$i")
    val tenMean = (1 to 10).map(i => s"mean$i")
    val header = Seq("trait", "region", "v", "cs", "chromosome", "position",
      "p", "se", "maf") ++ tenAlpha ++ tenLbf ++ tenMean
    def snpRow(v: String, cs: Int, pos: Int, alpha: Double, lbf: Double): Seq[Any] =
      Seq("T2D", "chr1:1-100000", v, cs, "chr1", pos, "5e-10", 0.05, 0.2) ++
        (1 to 10).map(i => if (i == cs) alpha else 0.01) ++
        (1 to 10).map(i => if (i == cs) lbf else 0.0) ++
        (1 to 10).map(_ => 0.3)
    val snpPath = writeTsv("fg.snp.tsv", header, Seq(
      snpRow("1:100:A:T", 1, 100, 0.7, 5.2),
      snpRow("1:200:G:C", 1, 200, 0.3, 4.0),
      snpRow("1:300:T:G", 2, 300, 0.9, 1.0) // cs 2: low logBF summary below
    ))
    val credPath = writeTsv("fg.cred.tsv",
      Seq("trait", "region", "cs", "cs_log10bf", "cs_avg_r2", "cs_min_r2"),
      Seq(
        Seq("T2D", "chr1:1-100000", 1, 5.5, 0.9, 0.7),
        Seq("T2D", "chr1:1-100000", 2, 0.2, 0.8, 0.6) // below threshold, cs!=1 -> dropped
      ))

    val snps = FinnGenSusie.parseSnpFiles(spark, snpPath)
    assert(snps.count() == 3)
    val lead = snps.filter(col("variantId") === "1_100_A_T").head()
    assert(lead.getAs[Double]("posteriorProbability") == 0.7)
    assert(lead.getAs[Double]("logBF") == 5.2)
    assert(lead.getAs[Int]("pValueExponent") == -10)

    val sums = FinnGenSusie.parseCredSummaries(spark, credPath)
    assert(sums.count() == 1) // cs 2 filtered by logBF threshold

    val loci = FinnGenSusie.toStudyLocus(snps, sums)
    assert(loci.count() == 1)
    val row = loci.head()
    assert(row.getAs[String]("variantId") == "1_100_A_T") // top PIP leads
    assert(row.getAs[Double]("credibleSetlog10BF") == 5.5)
    assert(loci.select(size(col("locus"))).as[Int].head() == 2)
    assert(row.getAs[String]("studyId") == "FINNGEN_R11_T2D")
  }
}
