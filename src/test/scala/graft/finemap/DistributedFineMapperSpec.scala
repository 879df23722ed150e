package graft.finemap

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DistributedFineMapperSpec extends SparkSpec {
  import spark.implicits._

  test("loci fine-map in parallel on executors with long-format LD") {
    // two loci: locus A has a clear causal SNP (idx of v09 after
    // name-sort), locus B is null
    val variants = (
      (0 until 12).map(i => ("A", f"v$i%02d", if (i == 9) 7.5 else 0.2)) ++
        (0 until 8).map(i => ("B", f"v$i%02d", 0.1))
      ).toDF("locusId", "variantId", "z")
    // LD: identity plus one correlated pair in A (indices 9,10 after sort)
    val ld = Seq(("A", 9, 10, 0.9)).toDF("locusId", "i", "j", "r")

    val out = DistributedFineMapper.finemapAll(spark, variants, ld,
      n = 10000, L = 3).collect()

    val aPips = out.filter(_.locusId == "A").map(r => r.variantId -> r.pip).toMap
    val bPips = out.filter(_.locusId == "B").map(_.pip)
    assert(out.length == 20)
    // causal variant v09 carries the bulk of PIP (possibly shared with
    // its LD partner v10)
    assert(aPips("v09") + aPips("v10") > 0.8, s"pips=$aPips")
    assert(aPips("v09") > aPips("v00"))
    assert(bPips.max < 0.5)
    // credible set marks the causal variant
    assert(out.exists(r => r.locusId == "A" && r.variantId == "v09" &&
      r.inCredibleSet))
  }
}
