package graft.plans

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded top-k id selection as a native aggregate: per group, keep
  * the `k` ids smallest under a (double, id) total order, in a
  * size-capped heap that partially aggregates map-side.
  *
  * The point is the shuffle shape: a window-rank cut must shuffle
  * EVERY row of the corpus to its stratum before ranking, while this
  * aggregate ships at most k entries per (partition, group) — at
  * 100 TB with thousands of strata that is the difference between a
  * corpus-wide shuffle and kilobytes. Ties are impossible when ids are
  * unique (the order ends with the id), so the cut is deterministic.
  */
case class TopKIdsAgg(u: Expression, id: Expression, k: Int,
                      withKeys: Boolean = false,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[(Double, Long)]]
    with BinaryLike[Expression] {
  require(k > 0, "topk requires k > 0")

  override def left: Expression = u
  override def right: Expression = id
  override def dataType: DataType =
    if (withKeys) ArrayType(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("key", DoubleType, nullable = false))), containsNull = false)
    else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_ids"

  // max-at-head heap so the current worst survivor is O(1) to test
  private def cmp: Comparator[(Double, Long)] = TopKIdsAgg.MaxFirst

  override def createAggregationBuffer(): PriorityQueue[(Double, Long)] =
    new PriorityQueue[(Double, Long)](math.min(k, 1024), cmp)

  // NaN keys never enter the heap: both displacement tests (`<` and
  // `==`) are false against NaN, so one admitted while size < k would
  // hold its slot forever and surface as a NaN-scored "worst" row.
  private def insert(buf: PriorityQueue[(Double, Long)], e: (Double, Long)): Unit =
    if (e._1.isNaN) ()
    else if (buf.size < k) buf.add(e)
    else {
      val worst = buf.peek()
      if (e._1 < worst._1 || (e._1 == worst._1 && e._2 < worst._2)) {
        buf.poll(); buf.add(e)
      }
    }

  override def update(buf: PriorityQueue[(Double, Long)],
                      input: InternalRow): PriorityQueue[(Double, Long)] = {
    val uv = u.eval(input)
    val iv = id.eval(input)
    if (uv != null && iv != null)
      insert(buf, (uv.asInstanceOf[Double], iv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: PriorityQueue[(Double, Long)],
                     other: PriorityQueue[(Double, Long)]): PriorityQueue[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr, cmp.reversed())
    if (withKeys)
      new GenericArrayData(arr.map { case (d, l) => InternalRow(l, d): Any })
    else new GenericArrayData(arr.map(_._2))
  }

  override def serialize(buf: PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (d, l) = it.next(); bb.putDouble(d); bb.putLong(l) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { insert(buf, (bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKIdsAgg =
    copy(u = newLeft, id = newRight)
}

object TopKIdsAgg {
  /** Serializable (max-first) heap order — a lambda field would drag a
    * non-serializable class into the task closure. */
  object MaxFirst extends Comparator[(Double, Long)] with Serializable {
    override def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(b._2, a._2)
    }
  }
}

object TopK {
  /** `topk_ids(orderKey, id, k)`: the k ids smallest by
    * (orderKey, id), ascending. */
  def topkIds(orderKey: Column, id: Column, k: Int): Column =
    Bridge.column(TopKIdsAgg(
      Cast(Bridge.expression(orderKey), DoubleType),
      Cast(Bridge.expression(id), LongType), k).toAggregateExpression())

  /** `topk_ids` keeping the order key: array<struct<id, key>> in
    * ascending key order — callers reconstruct derived metrics (e.g.
    * similarity = −key) without a re-join. */
  def topkIdsKeyed(orderKey: Column, id: Column, k: Int): Column =
    Bridge.column(TopKIdsAgg(
      Cast(Bridge.expression(orderKey), DoubleType),
      Cast(Bridge.expression(id), LongType), k,
      withKeys = true).toAggregateExpression())

  /** Per-group (`scoreCol` DESC, `idCol` ASC) top-k with 1-based
    * ranks — the one shared reconstruction for every heap-aggregate
    * caller (ANN ranking, BM25, RRF, windowed trending). Returns
    * `groupCols ++ (idCol, scoreCol, rankCol)`; id and score keep
    * their input types.
    *
    * Integral ids rank through the k-bounded heap (map-side combine:
    * at most k entries per partition-group shuffle); any other id
    * type falls back to the window-rank cut the heap replaced — the
    * heap's `Cast(id, LongType)` would silently null a string id and
    * drop the row, so non-integral ids take the slower-but-correct
    * path (batch only: window ranks are unsupported over streams, so
    * a streaming frame requires an integral id). NaN scores never
    * rank on either path: the heap rejects them ([[TopKIdsAgg]]) and
    * the window variant filters them, so both paths agree.
    *
    * Precision note: the heap path carries the score as a Double
    * (`0.0 - score`, cast back on the way out), so a LongType score
    * with |value| > 2^53 loses low bits and can misrank or alias
    * near-ties. Long scores that large are outside every registered
    * use (counts, nano-quantised sums ≪ 9.2e15 stay exact); when a
    * full-64-bit-exact long ranking matters, rank on a non-integral
    * id (string) to take the window path, which compares longs
    * natively. */
  def rankBy(df: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
             scoreCol: String, idCol: String, k: Int,
             rankCol: String = "rank"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(k > 0, "rankBy requires k > 0")
    val idType = df.schema(idCol).dataType
    val scoreType = df.schema(scoreCol).dataType
    val integralId = idType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    val groups = groupCols.map(col)
    if (integralId) {
      // `0.0 - score` (not unary minus) normalises -0.0 so ties break
      // exactly like (score DESC, id ASC)
      df.groupBy(groups: _*)
        .agg(topkIdsKeyed(lit(0.0) - col(scoreCol), col(idCol), k)
          .as("__top"))
        .select(groups :+ posexplode(col("__top")).as(Seq("__pos", "__t")): _*)
        .select(groups ++ Seq(
          col("__t.id").cast(idType).as(idCol),
          (lit(0.0) - col("__t.key")).cast(scoreType).as(scoreCol),
          (col("__pos") + 1).as(rankCol)): _*)
    } else {
      require(!df.isStreaming,
        s"top-k over a stream needs an integral id column; '$idCol' is $idType")
      val noNan = scoreType match {
        case DoubleType | FloatType => df.filter(!isnan(col(scoreCol)))
        case _ => df
      }
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(groups: _*).orderBy(col(scoreCol).desc, col(idCol))
      noNan.withColumn(rankCol, row_number().over(w))
        .filter(col(rankCol) <= k)
        .select(groups ++ Seq(col(idCol), col(scoreCol), col(rankCol)): _*)
    }
  }
}
