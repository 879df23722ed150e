package graft.sources

import graft.functions.{ArrayFns, PValues}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FinnGen SuSiE fine-mapping reader: per-variant `.snp` files joined
  * with per-credible-set `.cred` summaries into StudyLocus rows.
  *
  * Semantics match the reference
  * (reference: src/gentropy/datasource/finngen/finemapping.py:208-530)
  * with the same two structural simplifications as the eQTL reader:
  * `element_at(array(alpha1..10), cs)` replaces three 10-branch `when`
  * chains, and the Hail bgz import path is dropped (plain
  * gzip/TSV read — SURVEY §7.4.1).
  */
object FinnGenSusie {

  /** Parse the `.snp` per-variant table. */
  def parseSnpFiles(spark: SparkSession, path: String,
                    releasePrefix: String = "FINNGEN_R11"): DataFrame = {
    def tenCols(prefix: String): org.apache.spark.sql.Column =
      array((1 to 10).map(i => col(s"$prefix$i").cast("double")): _*)
    spark.read.option("sep", "\t").option("header", "true").csv(path)
      .filter(col("position").cast("int").isNotNull)
      .filter(col("cs").cast("int") > 0)
      .select(
        concat_ws("_", lit(releasePrefix), col("trait")).as("studyId") +:
          col("region") +:
          regexp_replace(col("v"), ":", "_").as("variantId") +:
          col("cs").cast("int").as("credibleSetIndex") +:
          regexp_replace(col("chromosome"), "^chr", "").as("chromosome") +:
          col("position").cast("int").as("position") +:
          PValues.parsePValue(col("p")) ++:
          Seq(
            col("se").cast("double").as("standardError"),
            col("maf").cast("float").as("effectAlleleFrequencyFromSource"),
            lit("SuSie").as("finemappingMethod"),
            element_at(tenCols("alpha"), col("cs").cast("int"))
              .as("posteriorProbability"),
            element_at(tenCols("lbf_variable"), col("cs").cast("int"))
              .as("logBF"),
            element_at(tenCols("mean"), col("cs").cast("int")).as("beta")): _*)
  }

  /** Parse the `.cred` credible-set summaries, keeping sets above the
    * logBF threshold (index-1 sets always survive). */
  def parseCredSummaries(spark: SparkSession, path: String,
                         releasePrefix: String = "FINNGEN_R11",
                         credSetLbfThreshold: Double = 0.8685889638065036
                        ): DataFrame =
    spark.read.option("sep", "\t").option("header", "true").csv(path)
      .select(
        col("region"), col("trait"),
        col("cs").cast("int").as("credibleSetIndex"),
        col("cs_log10bf").cast("double").as("credibleSetlog10BF"),
        col("cs_avg_r2").cast("double").as("purityMeanR2"),
        col("cs_min_r2").cast("double").as("purityMinR2"))
      .filter(col("credibleSetlog10BF") > credSetLbfThreshold ||
        col("credibleSetIndex") === 1)
      .withColumn("studyId", concat_ws("_", lit(releasePrefix), col("trait")))
      .drop("trait")

  /** Assemble StudyLocus rows: lead = top PIP per credible set, full
    * set collected into `locus`. */
  def toStudyLocus(snps: DataFrame, summaries: DataFrame): DataFrame = {
    val joined = snps.join(summaries,
      Seq("studyId", "region", "credibleSetIndex"), "inner")
    val w = Window.partitionBy("studyId", "region", "credibleSetIndex")
    joined
      .withColumn("isLead",
        row_number().over(w.orderBy(col("posteriorProbability").desc,
          col("variantId"))) === 1)
      .withColumn("locus",
        when(col("isLead"), collect_list(struct(
          col("variantId"), col("posteriorProbability"), col("logBF"),
          col("beta"), col("pValueMantissa"), col("pValueExponent"),
          col("standardError"))).over(w)))
      .filter(col("isLead"))
      .withColumn("studyLocusId", ArrayFns.generateIdentifier(
        Seq(col("studyId"), col("variantId"), col("credibleSetIndex"))))
      .withColumn("studyType", lit("gwas"))
      .drop("isLead")
  }
}
