package graft.core

import graft.SparkSpec
import java.nio.file.Files

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction collapses a many-file dataset to the size-derived count") {
    val dir = Files.createTempDirectory("compact").toFile.getAbsolutePath
    val in = s"$dir/in"
    val out = s"$dir/out"
    (1 to 2000).map(i => (i.toLong, s"row-$i")).toDF("k", "s")
      .repartition(40).write.parquet(in)
    val inFiles = new java.io.File(in).listFiles.count(_.getName.endsWith(".parquet"))
    assert(inFiles === 40)

    // huge target ⇒ everything fits in one file
    val n = Compaction.compact(spark, in, out, targetBytes = 1L << 30)
    assert(n === 1)
    val outFiles = new java.io.File(out).listFiles.count(_.getName.endsWith(".parquet"))
    assert(outFiles === 1)
    assert(spark.read.parquet(out).count() === 2000)
  }

  test("sorted compaction range-clusters rows so file min/max are disjoint") {
    val dir = Files.createTempDirectory("compact2").toFile.getAbsolutePath
    val in = s"$dir/in"
    val out = s"$dir/out"
    (1 to 4000).map(i => (i.toLong, i.toString * 30)).toDF("k", "pad")
      .repartition(20).write.parquet(in)
    val bytes = new java.io.File(in).listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val n = Compaction.compact(spark, in, out, targetBytes = bytes / 3 + 1,
      sortCols = Seq("k"))
    assert(n >= 2 && n <= 4)
    // per-file key ranges must not overlap (pruning-friendly layout)
    val ranges = new java.io.File(out).listFiles
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(org.apache.spark.sql.functions.min("k"),
            org.apache.spark.sql.functions.max("k")).head
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, ranges.mkString(","))
      case _ =>
    }
    assert(spark.read.parquet(out).count() === 4000)
  }
}
