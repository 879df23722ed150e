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
  * (itself included).
  *
  * Scale design: the running collect_set grows with the partition —
  * fine for per-(study, chromosome) lead counts (thousands), which is
  * the bound the reference relies on. Against degenerate inputs (raw
  * variants fed in as "leads"), [[clump]] caps the running state: a
  * cheap groupBy count finds partitions with more than
  * `maxLeadsPerPartition` leads (broadcast back — the same
  * groupBy-derived stop-set pattern as the dedup hot-bucket caps), and
  * leads ranked past the cap in those partitions contribute null to
  * the collect_set (collect_set drops nulls, so window state stays
  * ≤ cap) and are themselves conservatively flagged as clumped.
  * Partitions under the cap are byte-identical to the uncapped path.
  */
object LDClumping {

  val LdClumpedFlag = "LD_CLUMPED"

  /** `overflow`: rows excluded from the running set (and flagged);
    * pass `lit(false)` for the uncapped reference semantics. */
  def isLeadLinked(studyId: Column, chromosome: Column, variantId: Column,
                   pValueExponent: Column, pValueMantissa: Column,
                   ldSet: Column, overflow: Column = lit(false)): Column = {
    val w = Window.partitionBy(studyId, chromosome)
      .orderBy(pValueExponent.asc, pValueMantissa.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // overflow rows contribute null -> dropped by collect_set -> the
    // running state never exceeds the cap rank
    val strongerLeads =
      collect_set(when(overflow, lit(null)).otherwise(variantId)).over(w)
    val tagsInLocus = array_distinct(array_union(
      array(variantId),
      transform(coalesce(ldSet, array().cast("array<struct<tagVariantId:string,r2Overall:double>>")),
        t => t.getField("tagVariantId"))))
    when(variantId.isNull, lit(false))
      .when(overflow, lit(true))
      .otherwise(size(array_intersect(strongerLeads, tagsInLocus)) > 1)
  }

  /** Flag LD-clumped rows and null out their locus. */
  def clump(associations: DataFrame,
            maxLeadsPerPartition: Int = 100000): DataFrame = {
    // stop-set of degenerate (study, chromosome) partitions; empty (and
    // the broadcast trivial) on any sane input
    val hot = associations
      .groupBy("studyId", "chromosome").count()
      .filter(col("count") > maxLeadsPerPartition)
      .select(col("studyId"), col("chromosome"), lit(true).as("_hot"))
    val rankW = Window.partitionBy(col("studyId"), col("chromosome"))
      .orderBy(col("pValueExponent").asc, col("pValueMantissa").asc)
    val overflow = coalesce(col("_hot"), lit(false)) &&
      row_number().over(rankW) > maxLeadsPerPartition
    val linked = isLeadLinked(col("studyId"), col("chromosome"),
      col("variantId"), col("pValueExponent"), col("pValueMantissa"),
      col("ldSet"), col("_overflow"))
    associations
      .join(broadcast(hot), Seq("studyId", "chromosome"), "left")
      .withColumn("_overflow", overflow)
      .withColumn("_linked", linked)
      .withColumn("qualityControls",
        ArrayFns.updateQualityFlag(col("qualityControls"), col("_linked"),
          LdClumpedFlag))
      .withColumn("locus",
        when(col("_linked"), lit(null)).otherwise(col("locus")))
      .drop("_linked", "_overflow", "_hot")
  }
}
