package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatFnsSpec extends SparkSpec {
  import spark.implicits._

  test("StatMath scalar kernels match known values") {
    assert(math.abs(StatMath.normSf(1.959964) - 0.025) < 1e-6)
    assert(math.abs(StatMath.normPpf(0.975) - 1.959964) < 1e-5)
    assert(math.abs(StatMath.chi2Sf(3.841459, 1.0) - 0.05) < 1e-6)
    assert(math.abs(StatMath.chi2Ppf(0.5, 1.0) - 0.454936) < 1e-5)
    assert(math.abs(StatMath.logSumExp(Array(1.0, 2.0, 3.0)) -
      math.log(math.exp(1) + math.exp(2) + math.exp(3))) < 1e-12)
    // extreme values that would overflow a naive exp-sum
    assert(math.abs(StatMath.logSumExp(Array(1000.0, 1000.0)) -
      (1000.0 + math.log(2.0))) < 1e-12)
  }

  test("native expressions evaluate in a codegen'd projection") {
    val df = Seq(1.96, 0.0, -1.0).toDF("x").select(
      StatFns.normSf(col("x")).as("sf"),
      StatFns.chi2Sf(col("x") * col("x"), 1.0).as("c2"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 0.0249979) < 1e-6)
    assert(math.abs(rows(1).getDouble(0) - 0.5) < 1e-12)
    assert(math.abs(rows(2).getDouble(0) - 0.8413447) < 1e-6)
    assert(math.abs(rows(0).getDouble(1) - 0.0499958) < 1e-6)
  }

  test("normPpf null and boundary behaviour") {
    val df = Seq(Some(0.975), Some(0.5), None).toDF("p")
      .select(StatFns.normPpf(col("p")).as("z"))
    val rows = df.collect()
    assert(math.abs(rows(0).getDouble(0) - 1.959964) < 1e-5)
    assert(math.abs(rows(1).getDouble(0)) < 1e-12)
    assert(rows(2).isNullAt(0))
  }
}
