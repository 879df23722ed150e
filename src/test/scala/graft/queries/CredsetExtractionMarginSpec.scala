package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards the q_gx_credset_extraction oracle's boundary margin (see
  * the scaladoc on [[Oracles.credsetExtraction]]): the kept-set cut
  * compares a windowed cumulative SUM(pip) against 0.99 unquantized,
  * and DuckDB's segment-tree window aggregation can associate the
  * floating-point sum differently from Scala's sequential loop. The
  * drift between the two orders is bounded by a few hundred ulps
  * (~1e-14 near 0.99), so the oracle is sound as long as no planted
  * cum_before lands closer than that to the boundary. This spec
  * replays the exact plant (pip ∝ (((7i+3l+5k) mod 11)+1)^4, column
  * normalised) at every per-locus size that occurs in the three
  * driver SF dirs and asserts a 1e-7 floor — seven orders of
  * magnitude of guard band. Re-plant the distribution in
  * Q.credsetExtraction / Oracles.credsetExtraction and this must stay
  * green.
  */
class CredsetExtractionMarginSpec extends SparkSpec {

  private def margin(p: Int, k: Int, l: Int): Double = {
    def raw(i: Int): Double = {
      val r = ((i * 7 + l * 3 + k * 5) % 11 + 1).toDouble
      r * r * r * r
    }
    val raws = Array.tabulate(p)(raw)
    val sum = raws.sum
    val pips = raws.map(_ / sum)
    // same ordering the query uses: pip desc, index asc (stable sort)
    val order = (0 until p).sortBy(i => (-pips(i), i))
    var cum = 0.0
    var min = Double.MaxValue
    order.foreach { i =>
      min = math.min(min, math.abs(cum - 0.99))
      cum += pips(i)
    }
    min
  }

  test("planted pip cumsums keep a >1e-7 margin from the 0.99 cut " +
    "at every SF's locus sizes") {
    val sizes = Seq("sf0.001", "sf0.01", "sf0.1").flatMap { sf =>
      spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
        .filter(col("l_orderkey") % 13 === 0 && col("l_linenumber") === 1 &&
          col("l_orderkey") <= 26000)
        .groupBy((col("l_orderkey") % 8).cast("int").as("k"))
        .agg(count(lit(1)).cast("int").as("p"))
        .collect().map(_.getInt(1))
    }.distinct
    assert(sizes.nonEmpty)
    val worst = (for {
      p <- sizes; k <- 0 until 8; l <- 0 until 2
    } yield (margin(p, k, l), (p, k, l))).minBy(_._1)
    assert(worst._1 > 1e-7,
      s"planted cum_before within ${worst._1} of the 0.99 boundary at " +
        s"(p,k,l)=${worst._2} — re-plant per Oracles.credsetExtraction's " +
        "BOUNDARY-MARGIN REQUIREMENT")
  }
}
