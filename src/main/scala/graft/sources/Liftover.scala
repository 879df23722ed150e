package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.Searching._

/** Pure-Scala UCSC chain-file liftover (GRCh37↔38 coordinate
  * conversion).
  *
  * The reference wraps the pyliftover package in a Python UDF
  * (reference: src/gentropy/common/Liftover.py:62-163). Here the chain
  * file parses once on the driver into a compact per-chromosome sorted
  * block index, broadcast to executors, and conversion runs as a Scala
  * UDF doing binary search — no Python workers, O(log blocks) per row.
  */
object Liftover {

  /** One alignment block: source [start, end) maps to target start. */
  case class Block(srcStart: Long, srcEnd: Long, tgtStart: Long,
    tgtChrom: String, flipped: Boolean, tgtChromSize: Long)

  type ChainIndex = Map[String, Array[Block]]

  private def normChrom(c: String): String = c.stripPrefix("chr")

  /** Parse a UCSC .over.chain file (plain text). */
  def parseChainFile(lines: Iterator[String]): ChainIndex = {
    val blocks = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.ArrayBuffer[Block]]
    var srcChrom = ""
    var tgtChrom = ""
    var tgtChromSize = 0L
    var srcPos = 0L
    var tgtPos = 0L
    var flipped = false
    lines.map(_.trim).foreach { line =>
      if (line.startsWith("chain")) {
        val f = line.split("\\s+")
        // chain score tName tSize tStrand tStart tEnd qName qSize qStrand qStart qEnd id
        srcChrom = normChrom(f(2))
        srcPos = f(5).toLong
        tgtChrom = normChrom(f(7))
        tgtChromSize = f(8).toLong
        flipped = f(9) == "-"
        tgtPos = f(10).toLong
      } else if (line.nonEmpty && line.head.isDigit) {
        val f = line.split("\\s+")
        val size = f(0).toLong
        blocks.getOrElseUpdate(srcChrom,
          scala.collection.mutable.ArrayBuffer.empty) +=
          Block(srcPos, srcPos + size, tgtPos, tgtChrom, flipped, tgtChromSize)
        if (f.length == 3) {
          srcPos += size + f(1).toLong
          tgtPos += size + f(2).toLong
        }
      }
    }
    blocks.map { case (k, v) => k -> v.sortBy(_.srcStart).toArray }.toMap
  }

  def fromChainFile(path: String): ChainIndex = {
    val src = scala.io.Source.fromFile(path)
    try parseChainFile(src.getLines()) finally src.close()
  }

  /** Convert one (chromosome, 0-based position); None when unmapped. */
  def convert(index: ChainIndex, chromosome: String,
              position: Long): Option[(String, Long)] =
    index.get(normChrom(chromosome)).flatMap { blocks =>
      // binary search for the last block with srcStart <= position
      var lo = 0
      var hi = blocks.length - 1
      var found = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (blocks(mid).srcStart <= position) { found = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      if (found < 0) None
      else {
        val b = blocks(found)
        if (position < b.srcEnd) {
          val off = position - b.srcStart
          val tgt = if (b.flipped) b.tgtChromSize - 1 - (b.tgtStart + off)
            else b.tgtStart + off
          Some((b.tgtChrom, tgt))
        } else None
      }
    }

  /** Lift a DataFrame's 1-based (chromosome, `posCol`) to the target
    * assembly; unmapped rows drop. The chain index is broadcast once. */
  def liftPositions(spark: SparkSession, df: DataFrame, index: ChainIndex,
                    chromCol: String = "chromosome",
                    posCol: String = "position"): DataFrame = {
    val bc = spark.sparkContext.broadcast(index)
    val liftUdf = udf((chrom: String, pos: Int) =>
      convert(bc.value, chrom, pos.toLong - 1).map {
        case (c, p) => (c, (p + 1).toInt)
      })
    df.withColumn("_lifted", liftUdf(col(chromCol), col(posCol).cast("int")))
      .filter(col("_lifted").isNotNull)
      .withColumn(chromCol, col("_lifted._1"))
      .withColumn(posCol, col("_lifted._2"))
      .drop("_lifted")
  }

  /** Interval liftover matching the reference's convention
    * (reference: src/gentropy/common/Liftover.py:62-163): the start is
    * lifted at start+1 (1-based shift before conversion), the end
    * as-is; both ends must map, end ≥ start, and the absolute length
    * difference must stay within `maxDifference` bp. */
  def liftIntervals(spark: SparkSession, df: DataFrame, index: ChainIndex,
                    chromCol: String = "chromosome", startCol: String = "start",
                    endCol: String = "end",
                    maxDifference: Int = 100): DataFrame = {
    val bc = spark.sparkContext.broadcast(index)
    val liftUdf = udf((chrom: String, start: Int, end: Int) =>
      for {
        (c1, s) <- convert(bc.value, chrom, start.toLong + 1)
        (c2, e) <- convert(bc.value, chrom, end.toLong)
        if c1 == c2 && e >= s
        if math.abs((e - s) - (end - start)) <= maxDifference
      } yield (c1, s.toInt, e.toInt))
    df.withColumn("_lifted",
        liftUdf(col(chromCol), col(startCol).cast("int"), col(endCol).cast("int")))
      .filter(col("_lifted").isNotNull)
      .withColumn(chromCol, col("_lifted._1"))
      .withColumn(startCol, col("_lifted._2"))
      .withColumn(endCol, col("_lifted._3"))
      .drop("_lifted")
  }
}
