package graft.operators

import graft.functions.{StatFns, StatMath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Summary-statistics QC battery: per-study quality metrics.
  *
  * Semantics match the reference
  * (reference: src/gentropy/method/sumstat_quality_controls.py:34-263)
  * with one deliberate redesign for scale: each check is a plain
  * map-side-combinable groupBy aggregate and the battery is assembled
  * with outer joins on studyId — but the chi² survival function runs as
  * a native codegen'd expression instead of a Python UDF, and the
  * percentile checks use `percentile_approx` as a grouped aggregate
  * rather than a full-frame window (same result, one pass, no
  * per-row window materialisation).
  */
object SumstatQC {

  /** Mean beta per study (should be ~0). */
  def betaCheck(gwas: DataFrame): DataFrame =
    gwas.groupBy("studyId").agg(mean("beta").as("mean_beta"))

  /** PZ check: mean/sd of the difference between the reported -log10 p
    * and the one implied by beta/se. */
  def pzCheck(gwas: DataFrame): DataFrame =
    gwas
      .withColumn("z2", pow(col("beta") / col("standardError"), 2))
      .filter(col("z2") <= 100)
      .withColumn("new_logpval", -log10(StatFns.chi2Sf(col("z2"), 1.0)))
      .withColumn("diffpval",
        -log10(col("pValueMantissa")) - col("pValueExponent") - col("new_logpval"))
      .groupBy("studyId")
      .agg(
        mean("diffpval").as("mean_diff_pz"),
        stddev("diffpval").as("se_diff_pz"))

  /** Genomic-control lambda: median Z² over the χ²(1) median.
    *
    * `exact = false` (default) matches the reference's
    * `percentile_approx` (sumstat_quality_controls.py:160-165) — the
    * scale-correct choice (O(1) sketch per group), but its sketch
    * merges are partition-count-sensitive at the ulp level. `exact =
    * true` uses Spark's exact `percentile` (O(distinct z² per study)
    * memory — fine per study, and the partition-invariant choice for
    * golden-digest-locked outputs). */
  def gcLambdaCheck(gwas: DataFrame, exact: Boolean = false): DataFrame =
    gwas
      .select(col("studyId"),
        pow(col("beta") / col("standardError"), 2).as("z2"))
      .groupBy("studyId")
      .agg((if (exact) expr("percentile(z2, 0.5)")
            else percentile_approx(col("z2"), lit(0.5), lit(10000)))
        .as("gc_lambda"))
      .withColumn("gc_lambda", col("gc_lambda") / StatMath.chi2Ppf(0.5, 1.0))

  /** Effective-sample-size ratio spread (needs allele frequencies). */
  def nEffCheck(gwas: DataFrame, nTotal: Int = 100000, minCount: Int = 100): DataFrame = {
    val withVar = gwas
      .na.drop(Seq("effectAlleleFrequencyFromSource"))
      .withColumn("var_af",
        lit(2) * col("effectAlleleFrequencyFromSource") *
          (lit(1) - col("effectAlleleFrequencyFromSource")))
      .withColumn("pheno_var",
        pow(col("standardError"), 2) * nTotal * col("var_af") +
          pow(col("beta"), 2) * col("var_af"))
    val medians = withVar.groupBy("studyId")
      .agg(
        count(lit(1)).as("n"),
        percentile_approx(col("pheno_var"), lit(0.5), lit(10000)).as("pheno_median"))
      .filter(col("n") >= minCount)
      .drop("n")
    withVar
      .join(medians, Seq("studyId"))
      .withColumn("N_hat_ratio",
        (col("pheno_median") - pow(col("beta"), 2) * col("var_af")) /
          (pow(col("standardError"), 2) * col("var_af") * nTotal))
      .groupBy("studyId")
      .agg(stddev("N_hat_ratio").as("se_N"))
  }

  /** Variant counts: total and genome-wide-significant. */
  def numberOfSnps(gwas: DataFrame, pValThreshold: Double = 5e-8): DataFrame =
    gwas.groupBy("studyId").agg(
      count(lit(1)).as("n_variants"),
      sum((log10(col("pValueMantissa")) + col("pValueExponent") <=
        math.log10(pValThreshold)).cast("int")).as("n_variants_sig"))

  /** Full battery assembled with outer joins on studyId. */
  def qualityControlMetrics(gwas: DataFrame, pValThreshold: Double = 1e-8,
                            exactPercentiles: Boolean = false): DataFrame =
    betaCheck(gwas)
      .join(pzCheck(gwas), Seq("studyId"), "outer")
      .join(gcLambdaCheck(gwas, exactPercentiles), Seq("studyId"), "outer")
      .join(numberOfSnps(gwas, pValThreshold), Seq("studyId"), "outer")

  /** Row-level sanity filter: drop malformed sumstat rows.
    * reference: src/gentropy/dataset/summary_statistics.py:143-172 */
  def sanityFilter(gwas: DataFrame): DataFrame = {
    val p = col("pValueMantissa") * pow(lit(10.0), col("pValueExponent"))
    gwas
      .na.drop(Seq("beta", "standardError", "pValueMantissa", "pValueExponent"))
      .filter(col("beta") =!= 0 && col("standardError") > 0)
      .filter(p > 0 && p <= 1)
      .filter(!isnan(col("beta")) && !isnan(col("standardError")))
  }
}
