package graft.operators

import graft.functions.ArrayFns
import graft.plans.ArrayCumSum.array_cumsum
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Credible-set annotation: flag the tags forming the 95% / 99%
  * credible sets of each locus.
  *
  * The reference computes per-tag prefix sums with an O(n²)
  * `transform(sequence(1,n), i -> aggregate(slice(pp,1,i-1),...))`
  * (reference: src/gentropy/dataset/study_locus.py:916-969). Here the
  * locus is sorted by posterior probability once and a single O(n)
  * [[graft.plans.ArrayCumSum]] supplies the exclusive prefix sums —
  * same flags, linear cost, relevant on loci with thousands of tags.
  */
object CredibleSets {

  /** Annotate `locus` structs with is95CredibleSet / is99CredibleSet. */
  def annotate(df: DataFrame, locusCol: String = "locus"): DataFrame =
    df.withColumn(locusCol, annotateLocus(col(locusCol)))

  def annotateLocus(locus: Column): Column = {
    val sorted = ArrayFns.sortArrayOfStructsDesc(locus, "posteriorProbability")
    val pps = transform(sorted, t => t.getField("posteriorProbability"))
    val cum = array_cumsum(pps)
    // exclusive prefix sum: cumulative PP of *previous* tags
    val prevCum = zip_with(cum, pps, (c, p) => c - p)
    when(locus.isNull, lit(null)).otherwise(
      zip_with(sorted, prevCum, (tag, pc) =>
        tag
          .withField("is95CredibleSet", pc < 0.95)
          .withField("is99CredibleSet", pc < 0.99)))
  }
}
