package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def writeTsv(name: String, content: String): String = {
    val p = Files.createTempDirectory("iv").resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("andersson composite-name parse") {
    val path = writeTsv("andersson.tsv",
      """name	score
        |chr1:1000-2000,0.5;GENE1	0.74
        |chrX:500-800,0.2;GENE2	0.33
        |broken	0.1""".stripMargin)
    val df = Intervals.andersson(spark, path)
    val rows = df.select("chromosome", "start", "end", "geneSymbol", "resourceScore")
      .as[(String, Int, Int, String, Double)].collect().toSet
    assert(rows == Set(
      ("1", 1000, 2000, "GENE1", 0.74),
      ("X", 500, 800, "GENE2", 0.33)))
  }

  test("BED reader + gene resolution broadcast join") {
    val path = writeTsv("jung.bed",
      "chr2\t100\t300\tGENE1\nchr2\t400\t600\tUNKNOWN\n")
    val genes = Seq(("GENE1", "ENSG0001")).toDF("geneSymbol", "geneId")
    val df = Intervals.resolveGenes(
      Intervals.bedWithGene(spark, path, "jung2019"), genes)
    val rows = df.select("chromosome", "start", "end", "geneId", "datasourceId")
      .as[(String, Int, Int, String, String)].collect()
    assert(rows.toSeq == Seq(("2", 100, 300, "ENSG0001", "jung2019")))
  }

  test("javierre: dual-interval parse, overlap gene join, best score per gene") {
    val raw = Seq(
      // interval1 overlaps GENE1 (gene 900-1500, tss 1000); interval2 packed in name
      ("chr1", 950, 1200, "chr1:5000-6000,7.5", "Mon", "x"),
      // same interval2/gene with lower score: max wins
      ("chr1", 960, 1210, "chr1:5000-6000,3.0", "Mon", "x"),
      // chromosome mismatch between sides: dropped
      ("chr2", 100, 200, "chr1:7000-8000,9.9", "Mon", "x"),
      // no score: dropped
      ("chr1", 950, 1200, "chr1:9000-9500", "Mon", "x"))
      .toDF("chrom", "start", "end", "name", "bio_feature", "annotation")
    val genes = Seq(("ENSG1", "1", 900L, 1500L, 1000L))
      .toDF("geneId", "chromosome", "start", "end", "tss")
    val out = Intervals.javierre(raw, genes).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("chromosome") == "1")
    assert(r.getAs[Int]("start") == 5000 && r.getAs[Int]("end") == 6000)
    assert(r.getAs[String]("geneId") == "ENSG1")
    assert(r.getAs[Double]("resourceScore") == 7.5)
    assert(r.getAs[String]("datasourceId") == "javierre2016")
    assert(r.getAs[String]("datatypeId") == "pchic")
  }

  test("javierre drops genes with TSS beyond the two-sided threshold") {
    val raw = Seq(("chr1", 950, 1200, "chr1:5000-6000,7.5", "Mon", "x"))
      .toDF("chrom", "start", "end", "name", "bio_feature", "annotation")
    val farGene = Seq(("ENSG1", "1", 900L, 1500L, 5000000L))
      .toDF("geneId", "chromosome", "start", "end", "tss")
    assert(Intervals.javierre(raw, farGene).count() == 0)
  }

  test("jung: dotted fragment parse, promoter explode, symbol join") {
    val raw = Seq(
      ("chr3.100.400", "GENE1;GENE2", "Liver"),
      ("chr3.broken", "GENE1", "Liver"))
      .toDF("Interacting_fragment", "Promoter", "Tissue_type")
    val genes = Seq(("ENSG1", "GENE1", "3"), ("ENSG2", "GENE2", "3"))
      .toDF("geneId", "geneSymbol", "chromosome")
    val out = Intervals.jung(raw, genes)
      .select("chromosome", "start", "end", "geneId", "biofeature", "datasourceId")
      .as[(String, Int, Int, String, String, String)].collect().toSet
    assert(out == Set(
      ("3", 100, 400, "ENSG1", "Liver", "jung2019"),
      ("3", 100, 400, "ENSG2", "Liver", "jung2019")))
  }

  test("thurman: TSV schema read, symbol+chromosome join") {
    val path = writeTsv("thurman.tsv",
      "chr4\t10\t20\tGENE1\tchr4\t500\t900\t0.9\n" +
        "chr4\t10\t20\tGENE1\tchr5\t500\t900\t0.8\n") // wrong chrom: dropped
    val genes = Seq(("ENSG1", "GENE1", "4")).toDF("geneId", "geneSymbol", "chromosome")
    val out = Intervals.thurman(Intervals.readThurman(spark, path), genes)
      .select("chromosome", "start", "end", "geneId", "resourceScore",
        "datasourceId", "datatypeId")
      .as[(String, Int, Int, String, Double, String, String)].collect()
    assert(out.length == 1)
    val (c, s, e, g, sc, ds, dt) = out.head
    assert((c, s, e, g, ds, dt) == (("4", 500, 900, "ENSG1", "thurman2012", "dhscor")))
    assert(math.abs(sc - 0.9) < 1e-6) // float→double widening
  }

  test("interval lift hook applies to both javierre interval sets") {
    val shift: Intervals.IntervalLift = (df, c, s, e) =>
      df.withColumn(s, col(s) + 10).withColumn(e, col(e) + 10)
    val raw = Seq(("chr1", 950, 1200, "chr1:5000-6000,7.5", "Mon", "x"))
      .toDF("chrom", "start", "end", "name", "bio_feature", "annotation")
    val genes = Seq(("ENSG1", "1", 900L, 1500L, 1000L))
      .toDF("geneId", "chromosome", "start", "end", "tss")
    val out = Intervals.javierre(raw, genes, lift = shift).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("start") == 5010) // second interval shifted too
  }
}
