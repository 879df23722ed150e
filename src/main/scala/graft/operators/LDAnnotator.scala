package graft.operators

import graft.functions.ArrayFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LD annotation: bring each study-locus the LD set of its lead
  * variant, with r² resolved through the study's major ancestry.
  *
  * Semantics match the reference (reference:
  * src/gentropy/method/ld.py:22-230): study populations ordered by
  * relativeSampleSize, nfe tie-break, r² of the major population,
  * threshold filter, UNRESOLVED_LD flag, lead-variant rescue, lead
  * forced to r²=1.
  *
  * Scale: two left equi-joins (studyId; variantId+chromosome). The
  * study index side is small → broadcast; the LD index join is the big
  * shuffle and stays a sort-merge join keyed by (variantId, chromosome).
  */
object LDAnnotator {

  val UnresolvedLdFlag = "Variant not found in LD reference"

  /** Major population from an ldPopulationStructure array already
    * ordered by relativeSampleSize desc; nfe wins ties. */
  def majorPopulation(orderedPops: Column): Column = {
    val topSize = orderedPops.getItem(0).getField("relativeSampleSize")
    val majors = filter(orderedPops, p => p.getField("relativeSampleSize") === topSize)
    val hasNfe = filter(majors, p => p.getField("ldPopulation") === "nfe")
    when(size(majors) > 1 && size(hasNfe) === 1, lit("nfe"))
      .otherwise(orderedPops.getItem(0).getField("ldPopulation"))
  }

  /** r² of the major population for every tag in an LDIndex ldSet
    * (array<struct<tagVariantId, rValues: array<struct<population,r>>>>).
    * `get` (not `getItem`) tolerates a tag carrying no rValue for the
    * major population — under ANSI mode (the Spark 4 default) an
    * out-of-bounds getItem THROWS instead of yielding the null this
    * coalesce expects; such tags score r² = 0 (reference ld.py:150-168
    * semantics: missing population ⇒ no LD evidence). */
  def r2Major(ldSet: Column, majorPop: Column): Column =
    transform(ldSet, x =>
      struct(
        x.getField("tagVariantId").as("tagVariantId"),
        coalesce(
          pow(get(filter(x.getField("rValues"),
            y => y.getField("population") === majorPop)
            .getField("r"), lit(0)), 2),
          lit(0.0)).as("r2Overall")))

  /** Keep tags at or above the r² threshold. */
  def filterLdSet(ldSet: Column, r2Threshold: Double): Column =
    filter(ldSet, x => x.getField("r2Overall") >= r2Threshold)

  def ldAnnotate(
      associations: DataFrame,
      studies: DataFrame,
      ldIndex: DataFrame,
      r2Threshold: Double = 0.5): DataFrame = {

    val orderedStudies = studies.select(
      col("studyId"),
      ArrayFns.sortArrayOfStructsDesc(
        col("ldPopulationStructure"), "relativeSampleSize")
        .as("ldPopulationStructure"))

    val rescued = when(
      (col("ldSet").isNull || size(col("ldSet")) === 0) && col("variantId").isNotNull,
      array(struct(
        col("variantId").as("tagVariantId"),
        lit(1.0).as("r2Overall"))))
      .otherwise(col("ldSet"))

    associations
      .drop("ldSet")
      .join(broadcast(orderedStudies), Seq("studyId"), "left")
      .join(ldIndex, Seq("variantId", "chromosome"), "left")
      .withColumn("majorPopulation",
        when(col("ldPopulationStructure").isNotNull,
          majorPopulation(col("ldPopulationStructure"))))
      .withColumn("ldSet",
        when(col("ldPopulationStructure").isNotNull,
          r2Major(col("ldSet"), col("majorPopulation"))))
      .drop("ldPopulationStructure", "majorPopulation")
      .withColumn("ldSet", filterLdSet(col("ldSet"), r2Threshold))
      .withColumn("ldSet", when(size(col("ldSet")) > 0, col("ldSet")))
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(
          col("qualityControls"), col("ldSet").isNull, UnresolvedLdFlag))
      .withColumn("ldSet", rescued)
      .withColumn("ldSet",
        transform(col("ldSet"), x =>
          when(x.getField("tagVariantId") === col("variantId"),
            struct(
              x.getField("tagVariantId").as("tagVariantId"),
              lit(1.0).as("r2Overall")))
            .otherwise(x)))
  }
}
