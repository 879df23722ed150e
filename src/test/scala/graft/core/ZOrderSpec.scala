package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference Morton interleave in plain Scala. */
  private def morton(xs: Seq[Long], bitsPer: Int): Long = {
    var z = 0L
    for (i <- 0 until bitsPer; (x, j) <- xs.zipWithIndex)
      z |= ((x >> i) & 1L) << (i * xs.size + j)
    z
  }

  test("zvalue matches the reference interleave on random points") {
    val rnd = new scala.util.Random(7)
    val pts = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zvalue(Seq(col("x"), col("y")), 16).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == morton(Seq(x, y), 16)) }
  }

  test("zvalue masks bits above bitsPer and rejects overflowing widths") {
    val z = Seq((1L << 20, 0L)).toDF("x", "y")
      .select(ZOrder.zvalue(Seq(col("x"), col("y")), 16)).head.getLong(0)
    assert(z == 0L) // bit 20 masked away
    intercept[IllegalArgumentException] {
      ZOrder.zvalue(Seq(col("x"), col("y")), 32)
    }
  }

  test("three-dimension interleave places bits at stride 3") {
    val z = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
      .select(ZOrder.zvalue(Seq(col("a"), col("b"), col("c")), 4))
      .head.getLong(0)
    assert(z == 7L) // bits 0,1,2
  }

  test("clusterByZ range-partitions and sorts on the z-value") {
    val grid = for {x <- 0 until 64; y <- 0 until 64} yield (x.toLong, y.toLong)
    val clustered = ZOrder.clusterByZ(grid.toDF("x", "y"), Seq("x", "y"),
      bitsPer = 6, numPartitions = 16)
    val plan = clustered.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"))
    assert(plan.contains("Sort"))

    // locality: each partition's bounding box should be far smaller than
    // the full 64x64 domain (perfect z-blocks of 256 cells are 16x16 =
    // area 256; range boundaries straddle blocks, so allow 4x)
    val areas = clustered
      .withColumn("p", spark_partition_id())
      .groupBy("p")
      .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"),
        count(lit(1)).as("n"))
      .as[(Int, Long, Long)].collect()
    assert(areas.map(_._3).sum == 64L * 64L)
    val avgArea = areas.map(_._2).sum.toDouble / areas.length
    assert(avgArea <= 1024.0,
      s"z-clustered partitions lost locality: avg bounding area $avgArea")
  }
}
