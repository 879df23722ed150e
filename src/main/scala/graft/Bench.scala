package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      // Library operators persist intermediates that feed multiple
      // consumers (dedup indexes, overlap tag explodes) and leave the
      // unpersist to the caller; the bench IS the caller, and measures
      // each query in isolation — drop every cached frame so query k
      // doesn't pay eviction/GC pressure for query k-1's cache.
      spark.sharedState.cacheManager.clearCache()
      System.err.println(f"[bench] $name%-28s $sec%8.2f s  rows=$n")
      name -> sec
    }.toMap
    // JIT health telemetry: if a CodeHeap pool peaks at its max, late
    // queries ran interpreted and their timings are compilation noise
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getName.startsWith("CodeHeap"))
      .foreach(p => System.err.println(
        f"[bench] codeheap '${p.getName}' peak=${p.getPeakUsage.getUsed / 1048576}%d MiB" +
          f" max=${p.getPeakUsage.getMax / 1048576}%d MiB"))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
