package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** One-pass sufficient statistics of a d-dimensional vector column:
  * count, per-dimension sums, and the upper triangle of the outer-
  * product sum — everything mean/covariance/PCA need, in a single
  * aggregation whose buffer is 1 + d + d(d+1)/2 doubles.
  *
  * The scale point: a covariance at 100 TB must NOT be a d² explode
  * (n·d² shuffle rows) or a driver-side pass. This buffer partially
  * aggregates map-side, so the shuffle carries one ~d²/2-double
  * vector per partition and the final merge is elementwise addition —
  * the same shape MLlib's RowMatrix uses, expressed as a native
  * Catalyst aggregate over an `array<double>` column.
  *
  * Output layout (array<double>): [n, s₀…s_{d−1}, upper-tri outer
  * sums row-major: (0,0),(0,1)…(0,d−1),(1,1)…(d−1,d−1)].
  */
case class VectorOuterSumAgg(child: Expression, d: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]]
    with UnaryLike[Expression] {
  require(d > 0, "dimension must be positive")

  private val len = 1 + d + d * (d + 1) / 2

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vector_outer_sums"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](len)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(arr.numElements(), d)
      val x = new Array[Double](n)
      var i = 0
      // a vector with ANY null element is dropped whole: element-wise
      // skipping would make the count/sums/outer-sums inconsistent
      // (covariance over mismatched divisors), and getDouble on a null
      // slot reads garbage
      while (i < n) {
        if (arr.isNullAt(i)) return buf
        x(i) = arr.getDouble(i); i += 1
      }
      buf(0) += 1.0
      i = 0
      while (i < n) { buf(1 + i) += x(i); i += 1 }
      var off = 1 + d
      i = 0
      while (i < n) {
        var j = i
        val xi = x(i)
        // row i of the upper triangle starts at off; contiguous walk
        while (j < n) { buf(off + (j - i)) += xi * x(j); j += 1 }
        off += d - i
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(len * 8)
    var i = 0
    while (i < len) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](len)
    var i = 0
    while (i < len) { buf(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorOuterSumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorOuterSumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorOuterSumAgg =
    copy(child = c)
}

/** Projection y = W (x − center): one tight loop per row with the
  * (k × d) matrix riding inside the plan — the transform side of PCA,
  * same native-expression pattern as [[NearestCells]]. */
case class MatVecCentered(child: Expression, w: Array[Array[Double]],
                          center: Array[Double])
    extends UnaryExpression with CodegenFallback {
  require(w.nonEmpty && w.forall(_.length == center.length),
    "every projection row must match the center's dimension")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "matvec_centered"

  override protected def nullSafeEval(emb: Any): Any = {
    val arr = emb.asInstanceOf[ArrayData]
    val d = math.min(arr.numElements(), center.length)
    val x = new Array[Double](d)
    var i = 0
    // a null element projects as the center (zero contribution) —
    // same "contributes nothing" stance as VectorPoolAgg, and safe
    // against getDouble reading garbage from a null slot
    while (i < d) {
      x(i) = if (arr.isNullAt(i)) 0.0 else arr.getDouble(i) - center(i)
      i += 1
    }
    val out = new Array[Any](w.length)
    var r = 0
    while (r < w.length) {
      val row = w(r)
      var s = 0.0
      i = 0
      while (i < d) { s += row(i) * x(i); i += 1 }
      out(r) = s
      r += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): MatVecCentered =
    copy(child = c)
}

/** Element-wise pooling of a vector column in one pass — the
  * chunk-embeddings → document-embedding reduction. Two modes:
  *
  *  - `mean`: each element is quantised to integer nano-units
  *    (round(x·1e9)) and accumulated in a long — integer addition is
  *    associative-commutative, so the distributed mean is
  *    BIT-DETERMINISTIC across partitionings and engines (the repo's
  *    integer-quantised-sums pattern); the ≤5e-10 per-element
  *    quantisation error is far below float32 input precision.
  *    Overflow bound: |group| × max|x| must stay under 9.2e9
  *    (value·rows) — astronomically above any real chunk group.
  *  - `max` / `min`: per-dimension extremum (order-independent by
  *    nature), carried as raw double bits in the same long buffer.
  *
  * The buffer sizes itself from the first NON-EMPTY vector seen
  * (count slot + d value slots); empty vectors and null elements
  * contribute nothing (the mean's divisor counts only non-empty
  * rows); shorter subsequent vectors contribute only their prefix,
  * longer ones are truncated — mixed dimensions are a caller bug,
  * not silently resized state. Buffer = (d+1) longs partially
  * aggregated map-side, so the shuffle carries one row per
  * (partition, group), never the chunk rows. */
case class VectorPoolAgg(child: Expression, mode: String,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
  require(mode == "mean" || mode == "max" || mode == "min",
    s"unknown pool mode '$mode'")

  // extremum modes differ only in comparison direction
  private val sign = if (mode == "min") -1.0 else 1.0

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = s"vector_pool_$mode"

  // slot 0 = row count; slots 1..d = nano sums (mean) or raw double
  // bits (max); length 1 until the first vector fixes d
  override def createAggregationBuffer(): Array[Long] = new Array[Long](1)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[ArrayData]
    // an empty vector is a non-row: admitting it would bump the mean's
    // divisor without contributing values — and an empty FIRST vector
    // would lock the buffer at d=0, making results depend on which
    // partition it lands in
    if (arr.numElements() == 0) return buf
    val out = if (buf(0) == 0L && buf.length == 1) {
      val b = new Array[Long](1 + arr.numElements())
      if (mode != "mean") {
        var i = 1
        while (i < b.length) {
          b(i) = java.lang.Double.doubleToRawLongBits(
            sign * Double.NegativeInfinity)
          i += 1
        }
      }
      b
    } else buf
    val n = math.min(arr.numElements(), out.length - 1)
    var i = 0
    // null ELEMENTS contribute nothing (getDouble on a null slot would
    // read garbage): the mean treats them as 0, extrema skip them
    if (mode == "mean")
      while (i < n) {
        if (!arr.isNullAt(i))
          out(1 + i) += math.round(arr.getDouble(i) * 1e9)
        i += 1
      }
    else
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = arr.getDouble(i)
          if (sign * x > sign * java.lang.Double.longBitsToDouble(out(1 + i)))
            out(1 + i) = java.lang.Double.doubleToRawLongBits(x)
        }
        i += 1
      }
    out(0) += 1L
    out
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b(0) == 0L) return a
    if (a(0) == 0L) return b
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 1
    if (mode == "mean")
      while (i < small.length) { big(i) += small(i); i += 1 }
    else
      while (i < small.length) {
        if (sign * java.lang.Double.longBitsToDouble(small(i)) >
            sign * java.lang.Double.longBitsToDouble(big(i))) big(i) = small(i)
        i += 1
      }
    big(0) += small(0)
    big
  }

  override def eval(buf: Array[Long]): Any = {
    if (buf(0) == 0L) return null
    val d = buf.length - 1
    val out = new Array[Any](d)
    var i = 0
    if (mode == "mean")
      while (i < d) { out(i) = buf(1 + i) / 1e9 / buf(0); i += 1 }
    else
      while (i < d) { out(i) = java.lang.Double.longBitsToDouble(buf(1 + i)); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorPoolAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorPoolAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorPoolAgg =
    copy(child = c)
}

object VectorStats {
  /** `vector_outer_sums(vec, d)`: see [[VectorOuterSumAgg]]. */
  def outerSums(vec: Column, d: Int): Column =
    Bridge.column(VectorOuterSumAgg(
      Bridge.expression(vec), d).toAggregateExpression())

  /** Bit-deterministic element-wise mean of a vector column (nano-unit
    * fixed-point accumulation) — see [[VectorPoolAgg]]. */
  def meanPool(vec: Column): Column =
    Bridge.column(VectorPoolAgg(
      Bridge.expression(vec.cast("array<double>")), "mean")
      .toAggregateExpression())

  /** Element-wise maximum of a vector column — see [[VectorPoolAgg]]. */
  def maxPool(vec: Column): Column =
    Bridge.column(VectorPoolAgg(
      Bridge.expression(vec.cast("array<double>")), "max")
      .toAggregateExpression())

  /** Element-wise minimum of a vector column — see [[VectorPoolAgg]]. */
  def minPool(vec: Column): Column =
    Bridge.column(VectorPoolAgg(
      Bridge.expression(vec.cast("array<double>")), "min")
      .toAggregateExpression())

  /** `matvec_centered(vec)`: project into the rows of `w` after
    * subtracting `center`. */
  def project(vec: Column, w: Array[Array[Double]],
              center: Array[Double]): Column =
    Bridge.column(MatVecCentered(Bridge.expression(vec), w, center))
}
