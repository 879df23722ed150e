package graft.operators

import graft.functions.ArrayFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LD clumping: flag study-loci whose lead variant is linked (through
  * the ldSet) to a more significant lead in the same study/chromosome.
  *
  * Semantics match the reference (reference:
  * src/gentropy/method/clump.py:19-80): running collect_set of
  * stronger leads ordered by p-value; a lead is linked when more than
  * one of {lead} ∪ ldSet tags appears among the stronger leads
  * (itself included). The running collect_set grows with the partition
  * — fine for per-(study, chromosome) lead counts (thousands), which
  * is the same bound the reference relies on.
  */
object LDClumping {

  val LdClumpedFlag = "LD_CLUMPED"

  def isLeadLinked(studyId: Column, chromosome: Column, variantId: Column,
                   pValueExponent: Column, pValueMantissa: Column,
                   ldSet: Column): Column = {
    val w = Window.partitionBy(studyId, chromosome)
      .orderBy(pValueExponent.asc, pValueMantissa.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val strongerLeads = collect_set(variantId).over(w)
    val tagsInLocus = array_distinct(array_union(
      array(variantId),
      transform(coalesce(ldSet, array().cast("array<struct<tagVariantId:string,r2Overall:double>>")),
        t => t.getField("tagVariantId"))))
    when(variantId.isNotNull,
      size(array_intersect(strongerLeads, tagsInLocus)) > 1)
      .otherwise(lit(false))
  }

  /** Flag LD-clumped rows and null out their locus. */
  def clump(associations: DataFrame): DataFrame = {
    val linked = isLeadLinked(col("studyId"), col("chromosome"),
      col("variantId"), col("pValueExponent"), col("pValueMantissa"),
      col("ldSet"))
    associations
      .withColumn("_linked", linked)
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"), col("_linked"),
          LdClumpedFlag))
      .withColumn("locus",
        when(col("_linked"), lit(null)).otherwise(col("locus")))
      .drop("_linked")
  }
}
