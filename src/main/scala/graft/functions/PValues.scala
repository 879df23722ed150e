package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, StringType}

/** P-value codec: p-values are stored decomposed as
  * `(pValueMantissa: float, pValueExponent: int)` so that p < 1e-308
  * survives double underflow.
  *
  * Semantics match the reference
  * (reference: src/gentropy/common/utils.py:123-228,
  * src/gentropy/common/spark_helpers.py:256-313).
  */
object PValues {

  /** -log10(p) from (mantissa, exponent):  -(log10(m) + e).
    * reference: src/gentropy/common/spark_helpers.py:288-313 */
  def negLogPValue(mantissa: Column, exponent: Column): Column =
    -(log10(mantissa.cast("double")) + exponent.cast("double"))

  /** Inverse of [[negLogPValue]]: neg-log p → (mantissa float, exponent int).
    * reference: src/gentropy/common/spark_helpers.py:256-285 */
  def negLogToMantissaAndExponent(negLogP: Column): (Column, Column) = {
    val exponent = ceil(negLogP)
    val mantissa = pow(lit(10.0), exponent - negLogP)
    (mantissa.cast(FloatType).as("pValueMantissa"),
      (exponent * -1).cast(IntegerType).as("pValueExponent"))
  }

  /** Parse a p-value string ("0.01", "4.2E-45", "0") into
    * (mantissa float, exponent int). "0" maps to the smallest positive
    * double (2.225e-308). reference: src/gentropy/common/utils.py:123-169 */
  def parsePValue(pv0: Column): Seq[Column] = {
    val pv = when(pv0 === lit("0"), lit(java.lang.Double.MIN_NORMAL).cast(StringType))
      .otherwise(pv0)
    val up = upper(pv)
    val hasE = up.contains("E")
    val exponent = when(hasE, split(up, "E").getItem(1))
      .otherwise(floor(log10(pv.cast("double"))))
    val mantissa = round(
      when(hasE, split(up, "E").getItem(0).cast("double"))
        .otherwise(pv.cast("double") / pow(lit(10.0), exponent.cast("double"))),
      3)
    Seq(
      mantissa.cast(FloatType).as("pValueMantissa"),
      exponent.cast(IntegerType).as("pValueExponent"))
  }

  /** Decompose a double p-value column into (mantissa, exponent) where
    * mantissa ∈ [1, 10). reference: src/gentropy/common/utils.py:201-228
    * (driver-side there; columnar here so it distributes). */
  def splitPValue(p: Column): (Column, Column) = {
    val exponent = when(p === 0.0, lit(0L)).otherwise(floor(log10(p)))
    val mantissa = round(p / pow(lit(10.0), exponent.cast("double")), 3)
    (mantissa.cast(FloatType).as("pValueMantissa"),
      exponent.cast(IntegerType).as("pValueExponent"))
  }

  /** Two-term significance predicate: p <= m * 10^e without ever
    * materialising the double. reference: src/gentropy/dataset/summary_statistics.py:38-58 */
  def significanceFilter(mantissa: Column, exponent: Column,
                         cutoffMantissa: Double, cutoffExponent: Int): Column =
    (exponent < cutoffExponent) ||
      (exponent === cutoffExponent && mantissa <= cutoffMantissa)

  /** Convenience: predicate for p <= cutoff given a double cutoff. */
  def significanceFilter(mantissa: Column, exponent: Column, cutoff: Double): Column = {
    val e = math.floor(math.log10(cutoff)).toInt
    val m = cutoff / math.pow(10.0, e)
    significanceFilter(mantissa, exponent, m, e)
  }

  /** Harmonise effect size: keep beta when present else ln(oddsRatio);
    * standard error only survives alongside a native beta.
    * reference: src/gentropy/common/utils.py:81-120 */
  def convertOddsRatioToBeta(beta: Column, oddsRatio: Column, standardError: Column): Seq[Column] =
    Seq(
      when(beta.isNotNull, beta).when(oddsRatio.isNotNull, log(oddsRatio)).as("beta"),
      when(standardError.isNotNull && beta.isNotNull, standardError).as("standardError"))

  /** Fill in missing standard error from the p-value (se = |beta| / z(p)),
    * then 95% CI bounds. reference: src/gentropy/common/utils.py:22-78 */
  def calculateConfidenceInterval(
      pValueMantissa: Column, pValueExponent: Column,
      beta: Column, standardError: Column): Seq[Column] = {
    val pValue = pValueMantissa * pow(lit(10.0), pValueExponent)
    val z = StatFns.normPpf(lit(1.0) - pValue / 2)
    val se = when(standardError.isNull, abs(beta) / z).otherwise(standardError)
    Seq(
      (beta - lit(1.96) * se).as("betaConfidenceIntervalLower"),
      (beta + lit(1.96) * se).as("betaConfidenceIntervalUpper"))
  }

  /** Standard error back out of a 95% confidence interval.
    * reference: src/gentropy/common/spark_helpers.py:762-792 */
  def standardErrorFromConfidenceInterval(lower: Column, upper: Column): Column =
    (upper - lower) / lit(2 * 1.96)

  /** z-score from a p-value: qnorm(1 - p/2).
    * reference: src/gentropy/common/spark_helpers.py:101-134 (scipy UDF
    * there; native Catalyst expression here — stays inside codegen). */
  def pValueToZScore(p: Column): Column =
    StatFns.normPpf(lit(1.0) - p.cast("double") / 2)
}
