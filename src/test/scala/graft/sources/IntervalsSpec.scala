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
}
