package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Find overlapping study-locus pairs sharing at least one tag variant.
  *
  * Semantics match the reference's `find_overlaps`
  * (reference: src/gentropy/dataset/study_locus.py:487-608, 820-858):
  * GWAS loci on the left; every GWAS-GWAS pair counted once
  * (`leftStudyLocusId > rightStudyLocusId`), GWAS-molecular-trait pairs
  * with the molecular trait always on the right. Then tags of each
  * overlapping pair are aligned with a full outer join so the union of
  * both credible sets survives.
  *
  * Scale design: the peak self-join is an equi join on
  * `(chromosome, tagVariantId)` — sort-merge/shuffled-hash friendly,
  * residual predicates stay as filters. The exploded tag table is
  * cached because it feeds three joins. (A fixed
  * `repartition(chromosome)` was removed in round 2: ~24 distinct
  * values collapse parallelism and skew by construction, and the
  * downstream joins key on different columns anyway.)
  */
object Overlaps {

  private val statsCols =
    Seq("logBF", "posteriorProbability", "beta", "pValueMantissa", "pValueExponent")

  /** Explode `locus` into one row per (studyLocusId, tagVariantId). */
  def explodeLoci(credSet: DataFrame): DataFrame =
    credSet
      .filter(col("studyType").isNotNull)
      .withColumn("tag", explode(col("locus")))
      .select(
        Seq("studyLocusId", "studyId", "studyType", "chromosome", "region")
          .map(col) ++
          Seq(col("tag.variantId").as("tagVariantId")) ++
          statsCols.map(c => col(s"tag.$c").as(c)): _*)

  /** Distinct overlapping (left, right) locus pairs.
    * reference: src/gentropy/dataset/study_locus.py:487-545 */
  def overlappingPeaks(tags: DataFrame, intraStudy: Boolean = false): DataFrame = {
    val left = tags.alias("left")
    val right = tags.alias("right")
    val cond: Column =
      if (intraStudy)
        col("left.studyId") === col("right.studyId") &&
          col("left.chromosome") === col("right.chromosome") &&
          col("left.tagVariantId") === col("right.tagVariantId") &&
          col("left.studyLocusId") > col("right.studyLocusId") &&
          col("left.region") =!= col("right.region")
      else
        col("left.chromosome") === col("right.chromosome") &&
          col("left.tagVariantId") === col("right.tagVariantId") &&
          (col("right.studyType") =!= "gwas" ||
            col("left.studyLocusId") > col("right.studyLocusId")) &&
          col("left.studyType") === "gwas"
    left
      .join(right, cond, "inner")
      .select(
        col("left.studyLocusId").as("leftStudyLocusId"),
        col("right.studyLocusId").as("rightStudyLocusId"),
        col("right.studyType").as("rightStudyType"),
        col("left.chromosome").as("chromosome"))
      .distinct()
  }

  /** Outer-align tags of each overlapping pair (union of both credible
    * sets). reference: src/gentropy/dataset/study_locus.py:547-607 */
  def alignOverlappingTags(tags: DataFrame, peaks: DataFrame): DataFrame = {
    val left = tags.select(
      col("chromosome") +: col("tagVariantId") +:
        col("studyLocusId").as("leftStudyLocusId") +:
        statsCols.map(c => col(c).as(s"left_$c")): _*)
      .join(peaks, Seq("chromosome", "leftStudyLocusId"), "inner")
    val right = tags.select(
      col("chromosome") +: col("tagVariantId") +:
        col("studyLocusId").as("rightStudyLocusId") +:
        statsCols.map(c => col(c).as(s"right_$c")): _*)
      .join(peaks, Seq("chromosome", "rightStudyLocusId"), "inner")
    left
      .join(
        right,
        Seq("chromosome", "rightStudyLocusId", "leftStudyLocusId", "tagVariantId",
          "rightStudyType"),
        "outer")
      .select(
        col("leftStudyLocusId"), col("rightStudyLocusId"), col("rightStudyType"),
        col("chromosome"), col("tagVariantId"),
        struct(
          statsCols.map(c => col(s"left_$c")) ++
            statsCols.map(c => col(s"right_$c")): _*).as("statistics"))
  }

  /** Full pipeline: credible sets → StudyLocusOverlap rows.
    *
    * The flat exploded tags feed three joins (peak self-join + both
    * align sides); caching them measured consistently faster than
    * recomputation on the sf0.1 bench (6-7 s vs 7-19 s) — unlike
    * array-heavy frames, flat rows columnar-cache cheaply. The persist
    * registers on `cache`: call `cache.release()` after the terminal
    * action on the returned frame, or pass `CacheHandle.disabled` to
    * recompute the explode per consumer instead. */
  def findOverlaps(credSet: DataFrame, intraStudy: Boolean = false,
                   cache: graft.core.CacheHandle =
                     graft.core.CacheHandle()): DataFrame = {
    val tags = cache.persist(explodeLoci(credSet))
    val peaks = overlappingPeaks(tags, intraStudy)
    alignOverlappingTags(tags, peaks)
  }
}
