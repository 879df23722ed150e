package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class PValuesSpec extends SparkSpec {
  import spark.implicits._

  test("parsePValue handles scientific notation, plain decimals and zero") {
    val df = Seq("4.2E-45", "0.01", "0", "1e-300").toDF("pv")
      .select(PValues.parsePValue(col("pv")): _*)
    val rows = df.collect().map(r => (r.getFloat(0), r.getInt(1)))
    assert(rows(0) == (4.2f, -45))
    assert(rows(1)._1 == 1.0f && rows(1)._2 == -2)
    // "0" maps to smallest positive normal double ~2.225e-308
    assert(rows(2)._2 == -308)
    assert(rows(3) == (1.0f, -300))
  }

  test("negLogPValue and inverse round-trip") {
    val df = Seq((5.0f, -8), (1.0f, -2)).toDF("m", "e")
      .select(PValues.negLogPValue(col("m"), col("e")).as("nl"))
    val nl = df.collect().map(_.getDouble(0))
    assert(math.abs(nl(0) - 7.301) < 1e-3)
    assert(math.abs(nl(1) - 2.0) < 1e-12)

    val (m2, e2) = PValues.negLogToMantissaAndExponent(lit(7.30103))
    val Row(m: Float, e: Int) = Seq(1).toDF("x").select(m2, e2).head
    assert(math.abs(m - 5.0f) < 1e-3 && e == -8)
  }

  test("significanceFilter keeps p <= 5e-8 across exponent boundary") {
    val df = Seq(
      ("sig_small_exp", 1.0f, -9),
      ("sig_equal_exp", 5.0f, -8),
      ("insig_equal_exp", 6.0f, -8),
      ("insig", 1.0f, -7)
    ).toDF("name", "m", "e")
    val kept = df
      .filter(PValues.significanceFilter(col("m"), col("e"), 5e-8))
      .select("name").as[String].collect().toSet
    assert(kept == Set("sig_small_exp", "sig_equal_exp"))
  }

  test("convertOddsRatioToBeta keeps beta, logs OR, drops se with OR") {
    val df = Seq(
      (Some(0.5), None: Option[Double], Some(0.1)),
      (None: Option[Double], Some(math.exp(1.0)), Some(0.1)),
      (None: Option[Double], None: Option[Double], Some(0.1))
    ).toDF("beta", "oddsRatio", "standardError")
    val out = df.select(
      PValues.convertOddsRatioToBeta(col("beta"), col("oddsRatio"), col("standardError")): _*)
      .collect()
    assert(out(0).getDouble(0) == 0.5 && out(0).getDouble(1) == 0.1)
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12 && out(1).isNullAt(1))
    assert(out(2).isNullAt(0) && out(2).isNullAt(1))
  }

  test("pValueToZScore matches known quantiles") {
    val df = Seq(0.05, 0.5, 1e-10).toDF("p")
      .select(PValues.pValueToZScore(col("p")).as("z"))
    val z = df.collect().map(_.getDouble(0))
    assert(math.abs(z(0) - 1.959964) < 1e-5)
    assert(math.abs(z(1) - 0.674490) < 1e-5)
    assert(math.abs(z(2) - 6.466951) < 1e-5)
  }
}
