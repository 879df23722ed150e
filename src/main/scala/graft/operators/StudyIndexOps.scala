package graft.operators

import graft.functions.ArrayFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Study-index operators: ancestry→LD-population aggregation (A7) and
  * multi-source study deconvolution (A6).
  *
  * reference: src/gentropy/dataset/study_index.py:85-208, 610-763.
  */
object StudyIndexOps {

  /** GWAS ancestry label → LD panel population (the reference ships
    * this as a JSON asset; the mapping itself is public GnomAD panel
    * vocabulary). */
  val ancestryToLdPopulation: Map[String, String] = Map(
    "African American or Afro-Caribbean" -> "afr",
    "African unspecified" -> "afr",
    "Sub-Saharan African" -> "afr",
    "Admixed American" -> "amr",
    "Hispanic or Latin American" -> "amr",
    "East Asian" -> "eas",
    "Asian unspecified" -> "eas",
    "South East Asian" -> "eas",
    "European" -> "nfe",
    "NR" -> "nfe",
    "Finnish" -> "fin",
    "South Asian" -> "sas",
    "Central Asian" -> "sas",
    "Greater Middle Eastern (Middle Eastern, North African or Persian)" -> "mid",
    "Other admixed ancestry" -> "nfe",
    "Aboriginal Australian" -> "oth")

  /** Map discoverySamples ancestries onto LD populations and compute
    * relative sample sizes (A7), fully in higher-order expressions.
    * Input: array<struct<ancestry:string, sampleSize:double>>. */
  def aggregateAndMapAncestries(discoverySamples: Column): Column = {
    val mapExpr = {
      val kvs = ancestryToLdPopulation.toSeq
        .flatMap { case (k, v) => Seq(lit(k), lit(v)) }
      map(kvs: _*)
    }
    val mapped = transform(discoverySamples, s =>
      struct(
        coalesce(element_at(mapExpr, s.getField("ancestry")),
          lit("oth")).as("ancestry"),
        s.getField("sampleSize").cast("double").as("sampleSize")))
    // seed: one zero-count struct per distinct population, then fold
    // sample sizes in (mirrors the reference's aggregate shape)
    val seed = array_distinct(transform(mapped, x =>
      struct(x.getField("ancestry").as("ancestry"), lit(0.0).as("sampleSize"))))
    val aggregated = aggregate(mapped, seed, (acc, s) =>
      transform(acc, a =>
        when(a.getField("ancestry") === s.getField("ancestry"),
          struct(a.getField("ancestry").as("ancestry"),
            (a.getField("sampleSize") + s.getField("sampleSize"))
              .as("sampleSize")))
          .otherwise(a)))
    val total = aggregate(aggregated, lit(0.0),
      (t, p) => t + p.getField("sampleSize"))
    zip_with(aggregated, sequence(lit(1), size(aggregated)), (p, _) =>
      struct(
        p.getField("ancestry").as("ldPopulation"),
        (p.getField("sampleSize") / total).as("relativeSampleSize")))
  }

  /** Deconvolve studies ingested from multiple sources into one row
    * per studyId (A6): QC flags union across duplicates, metadata from
    * the first non-null value in a deterministic source order.
    * reference: src/gentropy/dataset/study_index.py:610-763 (which
    * windows over random order; this version orders by `sourceCol`
    * for reproducibility — documented deviation SURVEY §7.4.3). */
  def deconvolveStudies(studies: DataFrame, sourceCol: String = "projectId",
                        metadataCols: Seq[String] = Seq.empty): DataFrame = {
    val w = Window.partitionBy("studyId").orderBy(col(sourceCol))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val metaCols = if (metadataCols.nonEmpty) metadataCols
      else studies.columns.filterNot(Seq("studyId", "qualityControls").contains).toSeq
    studies
      .withColumn("qualityControls",
        array_distinct(flatten(collect_list(
          coalesce(col("qualityControls"), array().cast("array<string>")))
          .over(full))))
      .withColumns(metaCols.map(c =>
        c -> first(col(c), ignoreNulls = true).over(full)).toMap)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }
}
