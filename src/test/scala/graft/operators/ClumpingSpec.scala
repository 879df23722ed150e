package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClumpingSpec extends SparkSpec {
  import spark.implicits._

  test("pruneLeads greedy kernel matches reference doctest") {
    // reference: src/gentropy/method/window_based_clumping.py:128-133
    assert(WindowBasedClumping.pruneLeads(Seq(3L, 9L, 8L, 4L, 6L), 2L) ==
      Seq(1.0, 1.0, 0.0, 0.0, 1.0))
  }

  test("pruneLeads floor/ceiling kernel is equivalent to the naive scan") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 100) {
      val n = 1 + rnd.nextInt(300)
      val window = 1L + rnd.nextInt(50)
      val positions = Seq.fill(n)(rnd.nextInt(1000).toLong)
      val leads = scala.collection.mutable.ArrayBuffer.empty[Long]
      val naive = positions.map { p =>
        if (leads.exists(l => math.abs(l - p) < window)) 0.0
        else { leads += p; 1.0 }
      }
      assert(WindowBasedClumping.pruneLeads(positions, window) == naive,
        s"window=$window positions=$positions")
    }
  }

  private def sumstats = Seq(
    // s1 chr1: cluster [100, 300] (gap 200 <= 500), then far cluster [5000]
    ("s1", "1", 100, "1_100_A_T", 1.0f, -10),
    ("s1", "1", 300, "1_300_A_T", 1.0f, -8),
    ("s1", "1", 5000, "1_5000_A_T", 1.0f, -9),
    // s2 chr1: single variant
    ("s2", "1", 100, "1_100_A_T", 1.0f, -8)
  ).toDF("studyId", "chromosome", "position", "variantId",
    "pValueMantissa", "pValueExponent")

  test("streamed lead kernel equals a per-cluster pruneLeads replay on random data") {
    // randomized positions at mixed density (isolated points AND dense
    // runs that fuse into mega-clusters), several (study, chrom) groups,
    // p-value ties broken by position — replayed against the collected
    // per-cluster greedy the streamed kernel replaced
    val rnd = new scala.util.Random(20260815)
    val distance = 50
    val rows = (0 until 3000).map { i =>
      val dense = rnd.nextBoolean()
      (s"s${i % 3}", s"${i % 2}",
        if (dense) rnd.nextInt(2000) else 10000 + rnd.nextInt(100000),
        s"v$i", (1.0f + rnd.nextInt(899) / 100.0f), -4 - rnd.nextInt(12))
    }.distinctBy(r => (r._1, r._2, r._3))
    val df = rows.toDF("studyId", "chromosome", "position", "variantId",
      "pValueMantissa", "pValueExponent").repartition(7)
    val got = WindowBasedClumping.clump(df, distance = distance)
      .filter(!array_contains(col("qualityControls"),
        WindowBasedClumping.WindowClumpedFlag))
      .select("studyId", "chromosome", "position")
      .as[(String, String, Int)].collect().toSet
    // replay: sessionize per group, per cluster sort by (exp, mant,
    // pos) and run the reference greedy over the collected array
    val expected = rows.groupBy(r => (r._1, r._2)).flatMap { case ((s, c), g) =>
      val sorted = g.sortBy(_._3)
      val clusters = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.tail.foreach { r =>
        if (r._3 - clusters.last.last._3 > distance) clusters +=
          scala.collection.mutable.ArrayBuffer(r)
        else clusters.last += r
      }
      clusters.flatMap { cl =>
        val byP = cl.sortBy(r => (r._6, r._5, r._3))
        val pos = byP.map(_._3.toLong)
        pos.zip(WindowBasedClumping.pruneLeads(pos.toSeq, distance.toLong))
          .collect { case (p, 1.0) => (s, c, p.toInt) }
      }
    }.toSet
    assert(got == expected && got.size > 100)
  }

  test("window clumping keeps cluster-best leads, flags the rest") {
    val clumped = WindowBasedClumping.clump(sumstats, distance = 500)
    val flags = clumped
      .select(col("variantId"), col("studyId"),
        array_contains(col("qualityControls"), "WINDOW_CLUMPED").as("clumped"))
      .as[(String, String, Boolean)].collect().toSet
    assert(flags == Set(
      ("1_100_A_T", "s1", false), // p=1e-10 lead of cluster 1
      ("1_300_A_T", "s1", true),  // within 500bp of stronger lead
      ("1_5000_A_T", "s1", false), // own cluster
      ("1_100_A_T", "s2", false)))
    val leadCount = WindowBasedClumping.leads(sumstats, distance = 500).count()
    assert(leadCount == 3)
  }

  test("window clumping can yield multiple leads within one cluster") {
    // chain 100,400,700: gaps 300 < 500 so one cluster; best p at 400;
    // 100 and 700 both within 500 of 400 -> clumped; but 1200 seeds a
    // second lead only if gap to 700 is < 500 (it is: 500 is not > 500,
    // same cluster) and it is >= 500 away from lead 400.
    val df = Seq(
      ("s1", "1", 100, "v100", 1.0f, -8),
      ("s1", "1", 400, "v400", 1.0f, -12),
      ("s1", "1", 700, "v700", 1.0f, -9),
      ("s1", "1", 1200, "v1200", 1.0f, -10)
    ).toDF("studyId", "chromosome", "position", "variantId",
      "pValueMantissa", "pValueExponent")
    val leads = WindowBasedClumping.leads(df, distance = 500)
      .select("variantId").as[String].collect().toSet
    assert(leads == Set("v400", "v1200"))
  }

  test("locus breaker splits at distance gaps and keeps top variant") {
    val df = Seq(
      // locus 1: 100..600 (gap to 5000 breaks)
      ("s1", "1", 100, "v1", 1.0f, -6),
      ("s1", "1", 600, "v2", 1.0f, -9),
      // locus 2: 5000 alone, significant
      ("s1", "1", 5000, "v3", 1.0f, -8),
      // insignificant baseline row dropped up front
      ("s1", "1", 7000, "v4", 1.0f, -2)
    ).toDF("studyId", "chromosome", "position", "variantId",
      "pValueMantissa", "pValueExponent")
    val loci = LocusBreakerClumping.clump(df,
      baselinePValueCutoff = 1e-5, distanceCutoff = 1000,
      pValueCutoff = 5e-8, flankingDistance = 50)
    val rows = loci.select("variantId", "locusStart", "locusEnd")
      .as[(String, Int, Int)].collect().toSet
    // locus1 top = v2 (1e-9), span [100-50, 600+50]; locus2 top = v3
    assert(rows == Set(("v2", 50, 650), ("v3", 4950, 5050)))
  }

  test("large loci are re-broken by window clumping via semi range join") {
    val lbc = Seq(
      ("s1", "1", 500, "vA", 0, 10000), // large locus (span 10000 > 1000)
      ("s1", "1", 20000, "vB", 19900, 20100) // small locus
    ).toDF("studyId", "chromosome", "position", "variantId",
      "locusStart", "locusEnd")
    val wbc = Seq(
      ("s1", "1", 400, "w1"), // inside large locus
      ("s1", "1", 30000, "w2") // outside any large locus
    ).toDF("studyId", "chromosome", "position", "variantId")
    val out = LocusBreakerClumping.processLocusBreakerOutput(lbc, wbc, 1000)
      .select("variantId", "locusStart", "locusEnd")
      .as[(String, Int, Int)].collect().toSet
    assert(out == Set(("w1", -100, 900), ("vB", 19900, 20100)))
  }
}
