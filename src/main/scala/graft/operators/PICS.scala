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
    * Evaluation shape matters: HOF lambdas run interpreted with no
    * subexpression elimination, so every multi-use subtree must be
    * materialised as its own bound column before the lambda that
    * consumes it. `_nlp` (free in both lambdas — would re-evaluate per
    * array element), `_rel` (consumed by the total aggregate AND the
    * normalising transform) and `_total` (referenced twice in the
    * final lambda) each live in their own projection; multi-use
    * aliases survive CollapseProject, so each is computed exactly once
    * per row. */
  def finemap(df: DataFrame, k: Double = 6.4): DataFrame =
    df.withColumn("_nlp",
        PValues.negLogPValue(col("pValueMantissa"), col("pValueExponent")))
      .withColumn("_rel", relativeTags(col("ldSet"), col("_nlp"), k))
      .withColumn("_total", aggregate(col("_rel"), lit(0.0),
        (acc, t) => acc + t.getField("relativePosteriorProbability")))
      .withColumn("locus",
        when(col("ldSet").isNull, lit(null)).otherwise(
          transform(col("_rel"), t =>
            struct(
              t.getField("variantId").as("variantId"),
              t.getField("r2Overall").as("r2Overall"),
              t.getField("standardError").as("standardError"),
              when(col("_total") =!= 0.0,
                t.getField("relativePosteriorProbability") / col("_total"))
                .as("posteriorProbability")))))
      .drop("_nlp", "_rel", "_total")

  /** Flat PICS: one output row per usable (studyLocusId, tag) instead
    * of a rebuilt `locus` array. Identical math and filtering to
    * [[finemap]] (verified element-equal on the sf0.1 bench input);
    * rows whose ldSet is null/empty or whose lead p-value is unusable
    * simply produce no output.
    *
    * This is the scale path: the per-tag math is plain column
    * arithmetic (whole-stage codegen, ~2x the interpreted HOF chain of
    * the array version), and the normalising total is a partition-wide
    * window sum keyed on `studyLocusId` — which reuses the upstream
    * partitioning when the credible sets were just grouped on the same
    * key, adding a sort but no exchange. Prefer this whenever the
    * consumer explodes the locus anyway (e.g. tag-level joins).
    *
    * `sf` is the survival-function kernel applied to the standardised
    * deviate — [[graft.functions.StatFns.normSf]] (the real Gaussian
    * sf) by default, overridable so the relational wrapper (the r²
    * filter, μ/σ algebra, window normalisation, projection) can be
    * oracle-checked under a SQL-expressible surrogate while only the
    * erfc evaluation stays golden-locked (q_gx_pics_relational does
    * exactly that with exp(−x²/2)). Production callers never pass
    * it. */
  def finemapFlat(df: DataFrame, k: Double = 6.4,
                  sf: Column => Column = StatFns.normSf(_)): DataFrame = {
    val carried = df.columns.filterNot(_ == "ldSet").map(col).toSeq
    val ex = df
      .withColumn("_nlp",
        PValues.negLogPValue(col("pValueMantissa"), col("pValueExponent")))
      .select(col("*"), explode(col("ldSet")).as("_tag"))
      .filter(col("_tag.r2Overall").isNotNull &&
        col("_tag.r2Overall") >= 0.5 &&
        col("_nlp").isNotNull && col("_nlp") =!= 0.0)
    val r2 = col("_tag.r2Overall")
    val mu = col("_nlp") * r2
    val std0 = abs(sqrt(lit(1.0) - pow(sqrt(r2), lit(k))) * sqrt(col("_nlp")) / 2)
    val std = when(std0 === 0.0, 0.001).otherwise(std0)
    val rel = sf((col("_nlp") - mu) / std) * 2
    val w = org.apache.spark.sql.expressions.Window.partitionBy("studyLocusId")
    ex.withColumn("_std", std)
      .withColumn("_rel", rel)
      .withColumn("_total", sum(col("_rel")).over(w))
      .select(carried :+
        col("_tag.tagVariantId").as("variantId") :+
        r2.as("r2Overall") :+
        pow(lit(10.0), -col("_std")).as("standardError") :+
        when(col("_total") =!= 0.0, col("_rel") / col("_total"))
          .as("posteriorProbability"): _*)
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
