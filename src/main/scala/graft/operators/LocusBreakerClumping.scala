package graft.operators

import graft.functions.{ArrayFns, PValues}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Locus-breaker clumping: split each (study, chromosome) into loci at
  * gaps larger than `distanceCutoff`, extend by `flankingDistance`, and
  * keep the top variant per locus.
  *
  * Window-function port of the reference
  * (reference: src/gentropy/method/locus_breaker_clumping.py:40-120):
  * lag for inter-variant distance, running last(ignoreNulls) for
  * locusStart, full-frame max for locusEnd, rank desc neglogP for the
  * top variant. One shuffle on (studyId, chromosome).
  */
object LocusBreakerClumping {

  def clump(
      sumstats: DataFrame,
      baselinePValueCutoff: Double = 1e-5,
      distanceCutoff: Int = 250000,
      pValueCutoff: Double = 5e-8,
      flankingDistance: Int = 100000): DataFrame = {

    val negLogCutoff = -math.log10(pValueCutoff)
    val w1 = Window.partitionBy("studyId", "chromosome").orderBy("position")
    val w2 = Window.partitionBy("studyId", "chromosome", "locusStart")
      .orderBy("position")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val w3 = Window.partitionBy("studyId", "chromosome", "locusStart", "locusEnd")
      .orderBy(col("negLogPValue").desc)

    val runningStart = last(col("locusStart") - flankingDistance, ignoreNulls = true)
      .over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow))

    val inputCols = sumstats.columns.map(col).toSeq

    sumstats
      .filter(PValues.significanceFilter(
        col("pValueMantissa"), col("pValueExponent"), baselinePValueCutoff))
      .withColumn("negLogPValue",
        PValues.negLogPValue(col("pValueMantissa"), col("pValueExponent")))
      .withColumn("prev_position", lag(col("position"), 1).over(w1))
      .withColumn("distance", col("position") - col("prev_position"))
      .withColumn("locusStart",
        when(col("distance") > distanceCutoff || col("distance").isNull,
          col("position")))
      .withColumn("locusStart",
        when(runningStart > 0, runningStart).otherwise(lit(0)))
      .withColumn("locusEnd", max(col("position") + flankingDistance).over(w2))
      .withColumn("rank", rank().over(w3))
      .filter(col("rank") === 1 && col("negLogPValue") > negLogCutoff)
      .select(
        inputCols ++ Seq(
          col("locusStart").cast("int").as("locusStart"),
          col("locusEnd").cast("int").as("locusEnd"),
          lit(null).cast("array<string>").as("qualityControls"),
          ArrayFns.generateIdentifier(Seq(col("studyId"), col("variantId")))
            .as("studyLocusId")): _*)
  }

  /** Break large loci with window-based clumping leads confined to them
    * (left-semi range join J5).
    * reference: src/gentropy/method/locus_breaker_clumping.py:121-170 */
  def processLocusBreakerOutput(
      lbc: DataFrame, wbc: DataFrame, largeLociSize: Int): DataFrame = {
    val small = lbc.filter(col("locusEnd") - col("locusStart") <= largeLociSize)
    val large = lbc.filter(col("locusEnd") - col("locusStart") > largeLociSize)
    val brokenLarge = wbc.alias("wbc")
      .join(
        large.alias("ll"),
        col("wbc.studyId") === col("ll.studyId") &&
          col("wbc.chromosome") === col("ll.chromosome") &&
          col("wbc.position").between(col("ll.locusStart"), col("ll.locusEnd")),
        "semi")
      .withColumn("locusStart", col("position") - largeLociSize / 2)
      .withColumn("locusEnd", col("position") + largeLociSize / 2)
    brokenLarge.unionByName(small, allowMissingColumns = true)
  }
}
