package graft.sources

import graft.functions.{ArrayFns, PValues}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** eQTL Catalogue SuSiE fine-mapping results reader: joins per-variant
  * credible-set rows with the log-Bayes-factor table and study
  * metadata, then assembles one StudyLocus row per credible set.
  *
  * The reference selects the credible set's logBF with a 10-branch
  * `when` chain over `lbf_variable1..10`
  * (reference: src/gentropy/datasource/eqtl_catalogue/finemapping.py:122-325);
  * here it is a single `element_at(array(...), credibleSetIndex)` —
  * the improvement SURVEY §2.1/S7 flags.
  */
object EqtlCatalogueSusie {

  /** quant_method → QTL class; single-cell studies get the `sc`
    * prefix. reference: src/gentropy/datasource/eqtl_catalogue/study_index.py:49-87 */
  val MethodToQtlType: Map[String, String] = Map(
    "ge" -> "eqtl", "exon" -> "eqtl", "tx" -> "eqtl",
    "microarray" -> "eqtl", "leafcutter" -> "sqtl",
    "aptamer" -> "pqtl", "txrev" -> "tuqtl")

  def identifyStudyType(quantMethod: Column, rawStudyType: Column): Column = {
    val mapping = element_at(
      map(MethodToQtlType.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq: _*),
      quantMethod)
    when(rawStudyType === "single-cell", concat(lit("sc"), mapping))
      .otherwise(mapping)
  }

  /** Study-level rows from the processed fine-mapping frame (the
    * reference projects the StudyIndex column subset and dedups).
    * reference: src/gentropy/datasource/eqtl_catalogue/study_index.py:109-131 */
  def studyIndexFromSusieResults(processed: DataFrame): DataFrame = {
    val cols = Seq("studyId", "projectId", "studyType", "traitFromSource",
      "geneId", "tissueFromSourceId", "condition", "pubmedId", "nSamples")
      .filter(processed.columns.contains)
    processed.select(cols.map(col): _*).distinct()
  }

  def parseSusieResults(credibleSets: DataFrame, lbf: DataFrame,
                        studiesMetadata: DataFrame): DataFrame = {
    val lbfCols = array((1 to 10).map(i => col(s"lbf_variable$i").cast("double")): _*)
    lbf
      .join(credibleSets.join(broadcast(studiesMetadata), Seq("dataset_id")),
        Seq("molecular_trait_id", "region", "variant", "dataset_id"))
      .withColumn("logBF", element_at(lbfCols, col("credibleSetIndex").cast("int")))
      .select(
        regexp_replace(col("variant"), "chr", "").as("variantId") +:
          col("region") +: col("chromosome") +:
          col("position").cast("int").as("position") +:
          col("pip").cast("double").as("posteriorProbability") +:
          PValues.parsePValue(col("pvalue")) ++:
          Seq(
            col("beta").cast("double").as("beta"),
            col("se").cast("double").as("standardError"),
            col("credibleSetIndex").cast("int").as("credibleSetIndex"),
            col("logBF"),
            lit("SuSie").as("finemappingMethod"),
            col("gene_id").as("geneId"),
            col("dataset_id"),
            col("molecular_trait_id").as("traitFromSource"),
            ArrayFns.cleanStringsFromSymbols(concat_ws("_",
              col("study_label"), col("quant_method"), col("sample_group"),
              col("molecular_trait_id"))).as("studyId"),
            (if (credibleSets.columns.contains("study_type") ||
              studiesMetadata.columns.contains("study_type"))
              identifyStudyType(col("quant_method"), col("study_type"))
            else
              identifyStudyType(col("quant_method"), lit("bulk")))
              .as("studyType")): _*)
  }

  /** One StudyLocus row per credible set: the top-PIP variant leads,
    * the full set is collected into `locus`.
    * reference: src/gentropy/datasource/eqtl_catalogue/finemapping.py:240-325 */
  def fromSusieResults(processed: DataFrame): DataFrame = {
    val w = Window.partitionBy("dataset_id", "traitFromSource", "region",
      "credibleSetIndex")
    processed
      .withColumn("isLead",
        row_number().over(w.orderBy(col("posteriorProbability").desc,
          col("variantId"))) === 1)
      .withColumn("locus",
        when(col("isLead"), collect_list(struct(
          col("variantId"), col("posteriorProbability"), col("pValueMantissa"),
          col("pValueExponent"), col("logBF"), col("beta"),
          col("standardError"))).over(w)))
      .filter(col("isLead"))
      .withColumn("studyLocusId", ArrayFns.generateIdentifier(
        Seq(col("studyId"), col("variantId"), col("credibleSetIndex"))))
      .drop("isLead")
  }
}
