package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The golden-digest contract: invariance to everything that may
  * legitimately vary (row order, partitioning, column order), and
  * sensitivity to everything that must not (any one-row value change,
  * a dropped row, a duplicated row). */
class GoldensSpec extends SparkSpec {
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 1.25), (2L, "b", -0.5), (3L, "c", 0.0), (4L, null, 2.5)
  ).toDF("id", "s", "x")

  test("digest is invariant to row order, partitioning, and column order") {
    val d0 = Goldens.canonicalDigest(base)
    assert(Goldens.canonicalDigest(base.orderBy(col("x").desc)) === d0)
    assert(Goldens.canonicalDigest(base.repartition(7)) === d0)
    assert(Goldens.canonicalDigest(base.select("x", "id", "s")) === d0)
  }

  test("tamper: a one-row perturbation, drop, or duplicate flips the digest") {
    val d0 = Goldens.canonicalDigest(base)
    val perturbed = base.withColumn("x",
      when(col("id") === 3L, lit(1e-6)).otherwise(col("x")))
    assert(Goldens.canonicalDigest(perturbed) !== d0, "value tamper")
    assert(Goldens.canonicalDigest(base.filter(col("id") =!= 2L)) !== d0,
      "dropped row")
    assert(Goldens.canonicalDigest(base.unionAll(
      base.filter(col("id") === 1L))) !== d0, "duplicated row")
  }

  test("digest distinguishes NULL from empty string and from 'NULL' text") {
    val withNull = Seq((1L, null: String)).toDF("id", "s")
    val withEmpty = Seq((1L, "")).toDF("id", "s")
    val withNullText = Seq((1L, "NULL")).toDF("id", "s")
    val ds = Seq(withNull, withEmpty, withNullText).map(Goldens.canonicalDigest)
    assert(ds.distinct.size === 3)
  }

  test("ulp jitter below 6 dp does not flip the digest; -0.0 equals 0.0") {
    val a = Seq((1L, 0.123456749)).toDF("id", "x")
    val b = Seq((1L, 0.123456751)).toDF("id", "x")
    assert(Goldens.canonicalDigest(a) === Goldens.canonicalDigest(b))
    val nz = Seq((1L, -0.0)).toDF("id", "x")
    val pz = Seq((1L, 0.0)).toDF("id", "x")
    assert(Goldens.canonicalDigest(nz) === Goldens.canonicalDigest(pz))
  }

  test("empty frame digests to the fixed empty sentinel") {
    assert(Goldens.canonicalDigest(base.limit(0)) === "0:0:0")
  }

  test("committed sf0.001 goldens reproduce for the cheap stable queries") {
    // the partition-stable pair (probed identical at 4 and 8 cpus);
    // the full golden set is locked per-round by Verify at the driver
    // config (q_dedup_simhash left the set when its production
    // xxhash64 path became DuckDB-oracle-checked)
    for (name <- Seq("q_text_bpe", "q_gx_qc_battery_full")) {
      val got = Goldens.canonicalDigest(
        graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
      assert(got === Goldens.expected(name)("sf0.001"), name)
    }
  }
}
