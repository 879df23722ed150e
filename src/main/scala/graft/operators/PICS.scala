package graft.operators

import graft.functions.{PValues, StatFns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PICS fine-mapping: probabilistic identification of causal SNPs from
  * the lead variant's p-value and LD with its tags.
  *
  * The reference runs this as a per-row Python UDF looping over the
  * `ldSet` array (reference: src/gentropy/method/pics.py:112-199,
  * 205-268). Here the whole computation is higher-order array
  * expressions + the native Gaussian-sf Catalyst expression
  * ([[graft.functions.StatFns.normSf]]) — fully codegen'd, no
  * serialisation boundary, no per-row interpreter.
  *
  * Math (reference: src/gentropy/method/pics.py:36-110):
  *   mu    = neglogP · r²                        (defined for r² ≥ 0.5)
  *   std   = √(1 − (√r²)^k) · √neglogP / 2       (0 → 0.001)
  *   rel   = 2 · P(X > neglogP), X ~ N(mu, std)
  *   PP    = rel / Σ rel  (normalised within the locus)
  */
object PICS {

  /** Annotate each row's `ldSet` (array<struct<tagVariantId,r2Overall>>)
    * into a `locus` array<struct<variantId,r2Overall,standardError,
    * posteriorProbability>>. Rows with null ldSet get a null locus.
    *
    * Evaluation shape matters: the unnormalised tags and their sum are
    * materialised once per row in an intermediate struct column that
    * the final projection references twice — that stops the optimizer
    * from inlining the (expensive, interpreted) aggregate into the
    * normalising lambda, where it would re-evaluate per array element
    * (O(n²) per locus — observed hanging the sf0.1 bench). */
  def finemap(df: DataFrame, k: Double = 6.4): DataFrame = {
    val neglogP =
      PValues.negLogPValue(col("pValueMantissa"), col("pValueExponent"))
    val withRel = relativeTags(col("ldSet"), neglogP, k)
    val total = aggregate(withRel, lit(0.0),
      (acc, t) => acc + t.getField("relativePosteriorProbability"))

    df.withColumn("_pics", struct(withRel.as("rel"), total.as("total")))
      .withColumn("locus",
        when(col("ldSet").isNull, lit(null)).otherwise(
          transform(col("_pics").getField("rel"), t =>
            struct(
              t.getField("variantId").as("variantId"),
              t.getField("r2Overall").as("r2Overall"),
              t.getField("standardError").as("standardError"),
              when(col("_pics").getField("total") =!= 0.0,
                t.getField("relativePosteriorProbability") /
                  col("_pics").getField("total"))
                .as("posteriorProbability")))))
      .drop("_pics")
  }

  /** Unnormalised PICS tags (relative posterior per tag). */
  private def relativeTags(ldSet: Column, neglogP: Column, k: Double): Column = {
    // tags PICS is defined for: r2 >= 0.5 and a usable lead p-value
    // (reference drops everything when neglogP is null or 0 —
    // src/gentropy/method/pics.py:160-166)
    val usable = filter(ldSet, t =>
      t.getField("r2Overall").isNotNull && t.getField("r2Overall") >= 0.5 &&
        neglogP.isNotNull && neglogP =!= 0.0)
    transform(usable, t => {
      val r2 = t.getField("r2Overall")
      val mu = neglogP * r2
      val std0 = abs(sqrt(lit(1.0) - pow(sqrt(r2), k)) * sqrt(neglogP) / 2)
      val std = when(std0 === 0.0, 0.001).otherwise(std0)
      val rel = StatFns.normSf((neglogP - mu) / std) * 2
      struct(
        t.getField("tagVariantId").as("variantId"),
        r2.as("r2Overall"),
        pow(lit(10.0), -std).as("standardError"),
        rel.as("relativePosteriorProbability"))
    })
  }
}
