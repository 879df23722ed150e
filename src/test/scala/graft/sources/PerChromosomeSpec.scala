package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerChromosomeSpec extends SparkSpec {
  import spark.implicits._

  test("harmonisation flips beta and EAF for reverse-orientation matches") {
    val annotation = Seq(
      ("1", 100, "A", "T", "1_100_A_T"),
      ("1", 200, "G", "C", "1_200_G_C")
    ).toDF("chromosome", "position", "referenceAllele", "alternateAllele",
      "variantId")
    val twoWay = PerChromosome.prepareVariantAnnotation(annotation)
    assert(twoWay.count() == 4)

    val sumstats = Seq(
      ("s1", "1", 100, "A", "T", 0.5, 0.25), // direct
      ("s1", "1", 200, "C", "G", 0.3, 0.10), // flipped orientation
      ("s1", "1", 300, "A", "T", 0.1, 0.50)  // not in annotation -> drop
    ).toDF("studyId", "chromosome", "position", "allele1", "allele2",
      "beta", "effectAlleleFrequencyFromSource")

    val out = PerChromosome.harmoniseSumstats(sumstats, twoWay)
      .select("variantId", "beta", "effectAlleleFrequencyFromSource")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size == 2)
    assert(out("1_100_A_T") == ((0.5, 0.25)))
    assert(out("1_200_G_C") == ((-0.3, 0.9))) // beta and EAF flipped
  }

  test("per-chromosome loop writes partitioned appends") {
    val annotation = Seq(
      ("1", 100, "A", "T", "1_100_A_T"),
      ("2", 100, "G", "C", "2_100_G_C")
    ).toDF("chromosome", "position", "referenceAllele", "alternateAllele",
      "variantId")
    val sumstats = Seq(
      ("s1", "1", 100, "A", "T", 0.5, 0.25),
      ("s1", "2", 100, "G", "C", 0.4, 0.20)
    ).toDF("studyId", "chromosome", "position", "allele1", "allele2",
      "beta", "effectAlleleFrequencyFromSource")
    val out = java.nio.file.Files.createTempDirectory("perchrom").toString + "/h"
    PerChromosome.processPerChromosome(spark, sumstats,
      PerChromosome.prepareVariantAnnotation(annotation), out,
      chromosomes = Seq("1", "2"))
    val back = spark.read.parquet(out)
    assert(back.count() == 2)
    // partition pruning works on the layout
    assert(back.filter(col("chromosome") === "2").count() == 1)
  }
}
