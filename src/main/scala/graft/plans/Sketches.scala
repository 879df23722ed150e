package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native sketch expressions.
  *
  * The Column-API versions of these sketches (nested `transform` /
  * `aggregate` higher-order functions) re-evaluate free subexpressions
  * per array element and run interpreted — tokenising a document 64
  * times and hashing per-(plane, dim) through the expression
  * interpreter made MinHash ~500 s on 5000 docs. Each expression here
  * does the whole sketch in a single pass over the row's data
  * (tokenise once, hash each shingle once, update k running minima),
  * which is the shape that survives a 100 TB corpus.
  *
  * Hashes reuse Spark's XXH64 with the same mixing as the built-in
  * `xxhash64` column function (seed 42), so results are identical to
  * the HOF formulations they replace.
  */
object Sketches {

  private[plans] val Seed = 42L

  private[plans] def hashUtf8(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Mirror of `xxhash64(longCol, lit(seedVal))`: fold the two longs
    * through XXH64 starting at seed 42. */
  private[graft] def hashTwoLongs(a: Long, b: Long): Long =
    XXH64.hashLong(b, XXH64.hashLong(a, Seed))

  // EXACT mirror of the Column formulation `split(lower(trim(text)),
  // "\\s+")`: UTF8String.toLowerCase/trim are the very
  // implementations Spark's lower()/trim() call, so there is no
  // divergence to reason about — Java String.trim would strip all
  // chars ≤ U+0020 where Spark trim strips only 0x20, and Java
  // toLowerCase is default-locale where Spark's has an ASCII fast
  // path (tr_TR: I → ı splits the token space)
  private[plans] def tokenize(text: UTF8String): Array[String] =
    text.trim.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)

  private[plans] def shingleStrings(toks: Array[String], n: Int): Array[String] =
    if (toks.length >= n) Array.tabulate(toks.length - n + 1)(i =>
      toks.slice(i, i + n).mkString(" "))
    else Array(toks.mkString(" "))

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `4·nibbles` bits of md5(s) as an unsigned long — exactly
    * `conv(substring(md5(s), 1, nibbles), 16, 10)` (both Spark and
    * DuckDB md5 the UTF-8 bytes and hex-encode big-endian). Max 15
    * nibbles (60 bits) so the value stays non-negative in a Long. */
  private[plans] def md5Prefix(s: String, nibbles: Int): Long = {
    val md = md5Digest.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < (nibbles + 1) / 2) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    if (nibbles % 2 == 1) v >>>= 4
    v
  }
}

/** MinHash signature: k running minima of affine-rehashed shingle
  * hashes, one pass. Matches [[graft.operators.Dedup.minhashSignature]]
  * over [[graft.operators.Dedup.shingles]] semantically (same hash
  * family: a_h = 2h+1, b_h = h·0x9E3779B9, over the upper 32 bits of
  * xxhash64(shingle)). */
case class MinHashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(text: Any): Any =
    MinHashSignature.kernel(text.asInstanceOf[UTF8String], shingleSize,
      numHashes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinHashSignature.kernel($c, $shingleSize, $numHashes)")

  override protected def withNewChildInternal(c: Expression): MinHashSignature =
    copy(child = c)
}

object MinHashSignature {
  /** Static kernel, callable from generated code. */
  def kernel(text: UTF8String, shingleSize: Int, numHashes: Int): ArrayData = {
    val toks = Sketches.tokenize(text)
    val shingles = Sketches.shingleStrings(toks, shingleSize)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val h64 = Sketches.hashUtf8(UTF8String.fromString(shingles(i)), Sketches.Seed)
      val h32 = h64 >>> 32 // upper 32 bits, in [0, 2^32)
      var h = 0
      while (h < numHashes) {
        // mask back to 32 bits: the affine map must wrap to act as a
        // permutation of the hash domain — without the mod it is
        // order-preserving, every component's argmin is the same
        // shingle, and the signature degenerates to a k=1 sketch
        val v = ((2L * h + 1) * h32 + h * 0x9E3779B9L) & 0xFFFFFFFFL
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** [[MinHashSignature]] with an md5-derived shingle hash — the
  * SQL-anchored variant: x = first 8 md5 hex digits as an unsigned
  * 32-bit value (`conv(substring(md5(s),1,8),16,10)`), then the same
  * affine family mod 2^32. Replaces the explode-64×-rehash → two
  * hash-aggregate pipeline of the Column formulation (95M intermediate
  * rows at sf0.1) with one pass per document and zero shuffles.
  * Byte-identical to [[graft.operators.Dedup.minhashDupPairsMd5]]'s
  * component stage and to the DuckDB oracle. */
case class Md5MinHashSignature(child: Expression, shingleSize: Int,
                               numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_signature"

  override protected def nullSafeEval(text: Any): Any =
    Md5MinHashSignature.kernel(text.asInstanceOf[UTF8String], shingleSize,
      numHashes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.Md5MinHashSignature.kernel($c, $shingleSize, $numHashes)")

  override protected def withNewChildInternal(c: Expression): Md5MinHashSignature =
    copy(child = c)
}

object Md5MinHashSignature {
  /** Static kernel, callable from generated code. */
  def kernel(text: UTF8String, shingleSize: Int, numHashes: Int): ArrayData = {
    val toks = Sketches.tokenize(text)
    val shingles = Sketches.shingleStrings(toks, shingleSize)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      val x = Sketches.md5Prefix(shingles(i), 8) // 32-bit domain
      var h = 0
      while (h < numHashes) {
        val v = ((2L * h + 1) * x + h * 0x9E3779B9L) & 0xFFFFFFFFL
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** [[SimHash64]] with an md5-derived 60-bit token hash — the
  * SQL-anchored variant (`conv(substring(md5(t),1,15),16,10)`; 15
  * nibbles keep `conv`'s signed-long parse exact in both engines).
  * One pass per document instead of explode-60×-vote → two
  * aggregations. */
case class Md5SimHash(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits <= 60, "md5 prefix parse is exact only up to 60 bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash"

  override protected def nullSafeEval(text: Any): Any =
    Md5SimHash.kernel(text.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5SimHash.kernel($c, $bits)")

  override protected def withNewChildInternal(c: Expression): Md5SimHash =
    copy(child = c)
}

object Md5SimHash {
  /** Static kernel, callable from generated code. */
  def kernel(text: UTF8String, bits: Int): Long = {
    val toks = Sketches.tokenize(text)
    val counts = new Array[Int](bits)
    var t = 0
    while (t < toks.length) {
      val h = Sketches.md5Prefix(toks(t), 15)
      var i = 0
      while (i < bits) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var packed = 0L
    var i = 0
    while (i < bits) {
      if (counts(i) > 0) packed |= (1L << i)
      i += 1
    }
    packed
  }
}

/** 64-bit SimHash of the token multiset, one pass (bit i of
  * xxhash64(token) votes ±1; sign packs bit i). Matches
  * [[graft.operators.Dedup.simhash]]. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(text: Any): Any =
    SimHash64.kernel(text.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.kernel($c)")

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

object SimHash64 {
  /** Static kernel, callable from generated code. */
  def kernel(text: UTF8String): Long = {
    val toks = Sketches.tokenize(text)
    val counts = new Array[Int](64)
    var t = 0
    while (t < toks.length) {
      val h = Sketches.hashUtf8(UTF8String.fromString(toks(t)), Sketches.Seed)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
        i += 1
      }
      t += 1
    }
    var packed = 0L
    var i = 0
    while (i < 64) {
      if (counts(i) > 0) packed |= (1L << i)
      i += 1
    }
    packed
  }
}

/** Random-hyperplane LSH table keys over an embedding: `tables` keys,
  * each packing `planesPerTable` sign bits (plane components derived
  * from xxhash64(p·131071 + i, seed), mirroring
  * [[graft.operators.Similarity.lshTableKeys]]). One pass over
  * (planes × dims).
  *
  * The projection folds integer nano-quantised addends
  * (`floor(xᵢ·compᵢ·1e9 + 0.5)` summed as longs) instead of raw
  * doubles: the sign bit is then exact and order-independent — the
  * same engine everywhere, and DuckDB-replayable, so the LSH tier is
  * hash-checked end to end instead of golden-locked. The planes are
  * this library's own pseudo-random construction (no reference
  * fidelity constraint); a 1e-9 grid on unit-scale components does
  * not change their geometry.
  *
  * Scale shape: the (planes × dims) component matrix is a pure
  * function of (tables·planesPerTable, dims, seed) — it is memoised
  * per executor instead of re-hashed per ROW (the per-row recompute
  * was 2·planes·dims XXH64 rounds: ~1.2e9 hash ops for a 200k-vector
  * probe), and the expression generates code like [[NearestCells]]
  * so the fused scan span stays whole-stage. */
case class RhpTableKeys(child: Expression, tables: Int, planesPerTable: Int,
                        seed: Long) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rhp_table_keys"

  override protected def nullSafeEval(emb: Any): Any =
    RhpTableKeys.kernel(emb.asInstanceOf[ArrayData], tables, planesPerTable,
      seed)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.RhpTableKeys.kernel($c, $tables, $planesPerTable, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): RhpTableKeys =
    copy(child = c)
}

object RhpTableKeys {

  /** (planes, dims, seed) → component matrix, plane-major. Bounded:
    * one entry per distinct LSH configuration in the running plans
    * (planes·dims doubles each — a few KB). */
  private val componentCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Long), Array[Double]]()

  private def components(planes: Int, dims: Int, seed: Long): Array[Double] =
    componentCache.computeIfAbsent((planes, dims, seed), { key =>
      val (pl, d, sd) = key
      val out = new Array[Double](pl * d)
      var p = 0
      while (p < pl) {
        var i = 0
        while (i < d) {
          val h = Sketches.hashTwoLongs(p.toLong * 131071 + i, sd)
          out(p * d + i) = h.toDouble / Long.MaxValue.toDouble
          i += 1
        }
        p += 1
      }
      out
    })

  /** Static kernel, callable from generated code. */
  def kernel(arr: ArrayData, tables: Int, planesPerTable: Int,
             seed: Long): ArrayData = {
    val dims = arr.numElements()
    val x = new Array[Double](dims)
    var i = 0
    while (i < dims) { x(i) = arr.getDouble(i); i += 1 }
    val planes = tables * planesPerTable
    val comp = components(planes, dims, seed)
    val bits = new Array[Long](planes)
    var p = 0
    while (p < planes) {
      var projN = 0L
      val off = p * dims
      i = 0
      while (i < dims) {
        projN += math.floor(x(i) * comp(off + i) * 1e9 + 0.5).toLong
        i += 1
      }
      bits(p) = if (projN > 0) 1L else 0L
      p += 1
    }
    val keys = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < planesPerTable) {
        key = key * 2 + bits(t * planesPerTable + b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }
}

/** Distinct word-shingle set of a document in one pass: tokenise
  * once, slide the n-gram window, dedupe. Replaces
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(tokens, i, n))))`, whose interpreted lambdas re-slice the
  * token array per position (the index-build half of the n-gram
  * Jaccard cost). Semantics identical to
  * [[graft.operators.Dedup.shingles]] + `array_distinct`. */
case class DistinctShingles(child: Expression, shingleSize: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "distinct_shingles"

  override protected def nullSafeEval(text: Any): Any =
    DistinctShingles.kernel(text.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.DistinctShingles.kernel($c, $shingleSize)")

  override protected def withNewChildInternal(c: Expression): DistinctShingles =
    copy(child = c)
}

object DistinctShingles {
  /** Static kernel, callable from generated code. */
  def kernel(text: UTF8String, shingleSize: Int): ArrayData = {
    val toks = Sketches.tokenize(text)
    val shingles = Sketches.shingleStrings(toks, shingleSize)
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i < shingles.length) { seen.add(shingles(i)); i += 1 }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}

/** Native dot product of two double arrays: one tight loop per row.
  * The HOF formulation (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate array and interprets 2 lambdas per
  * element — measured ~50× slower across a 12.5M-pair join. Generates
  * a static-kernel call instead of falling back (a fallback breaks
  * the surrounding WholeStageCodegen span and boxes through the eval
  * path — this expression runs once per CANDIDATE PAIR, the hottest
  * site in every similarity join). */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.kernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.DotProduct.kernel($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
}

object DotProduct {
  /** Static kernel, callable from generated code. */
  def kernel(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
}

/** Indices of the `nProbe` centroids nearest to the embedding
  * (squared-L2, ties by centroid index), nearest first — the IVF
  * coarse-quantiser cell assignment as one tight loop per row over
  * the (tiny, plan-embedded) centroid matrix. Replaces the per-row
  * Scala UDF over a broadcast model: same arithmetic, no
  * serialisation boundary. Generates a static-kernel call with the
  * centroid matrix passed as a codegen reference object — this runs
  * N×k multiply-adds per corpus scan (SemDeDup/IVF/k-means
  * assignment, the dominant FLOP term at scale), where a fallback
  * would box every row out of the WholeStageCodegen span. */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
                        nProbe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override protected def nullSafeEval(emb: Any): Any =
    NearestCells.kernel(emb.asInstanceOf[ArrayData], centroids, nProbe)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.NearestCells.kernel($c, $ref, $nProbe)")
  }

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

object NearestCells {
  /** Static kernel, callable from generated code. */
  def kernel(arr: ArrayData, centroids: Array[Array[Double]],
             nProbe: Int): ArrayData = {
    val dims = arr.numElements()
    val x = new Array[Double](dims)
    var i = 0
    while (i < dims) { x(i) = arr.getDouble(i); i += 1 }
    val d2 = new Array[Double](centroids.length)
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(cent.length, dims)
      var s = 0.0
      i = 0
      while (i < n) { val d = x(i) - cent(i); s += d * d; i += 1 }
      d2(c) = s
      c += 1
    }
    val order = centroids.indices.sortBy(i => d2(i)) // stable: ties by index
    val take = math.min(nProbe, centroids.length)
    val out = new Array[Any](take)
    i = 0
    while (i < take) { out(i) = order(i); i += 1 }
    new GenericArrayData(out)
  }
}

/** Product-quantisation codes, PACKED TO BINARY (m bytes per vector —
  * the storage shape that lets a quantised 100 TB corpus sit in
  * cluster RAM): the embedding is split into `codebooks.length`
  * contiguous subvectors; byte s is the index of subvector s's
  * nearest (squared-L2) codebook entry, ties to the lower index.
  * Requires kCodes ≤ 256. `codebooks(s)(c)` = centroid c of subspace
  * s. One tight loop per row; the (m × k × subDim) codebook rides in
  * the plan like [[NearestCells]]' centroids. */
case class PqCodes(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.forall(_.length <= 256),
    "PqCodes packs one byte per subspace: kCodes must be <= 256")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(emb: Any): Any =
    PqCodes.kernel(emb.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PqCodes.kernel($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PqCodes =
    copy(child = c)
}

object PqCodes {
  /** Static kernel, callable from generated code. */
  def kernel(arr: ArrayData, codebooks: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var off = 0
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val subDim = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < subDim) {
          val diff = arr.getDouble(off + i) - cent(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      off += subDim
      s += 1
    }
    out
  }
}

/** Per-query ADC lookup table: lut[s][c] = inner product of the
  * query's subvector s with codebook entry c. Computed ONCE per query
  * row; candidate scoring then costs m array lookups per pair
  * ([[PqAdc]]) instead of a full d-dimensional dot product — the
  * asymmetric-distance shape of IVF-PQ (Jégou et al. 2011). */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(emb: Any): Any =
    PqLut.kernel(emb.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.PqLut.kernel($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): PqLut =
    copy(child = c)
}

object PqLut {
  /** Static kernel, callable from generated code. */
  def kernel(arr: ArrayData, codebooks: Array[Array[Array[Double]]]): ArrayData = {
    val m = codebooks.length
    val out = new Array[Any](m)
    var off = 0
    var s = 0
    while (s < m) {
      val book = codebooks(s)
      val subDim = book(0).length
      val row = new Array[Any](book.length)
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var ip = 0.0
        var i = 0
        while (i < subDim) { ip += arr.getDouble(off + i) * cent(i); i += 1 }
        row(c) = ip
        c += 1
      }
      out(s) = new GenericArrayData(row)
      off += subDim
      s += 1
    }
    new GenericArrayData(out)
  }
}

/** ADC score: Σ_s lut[s][codes[s]] — the approximate inner product of
  * the query against the RECONSTRUCTED corpus vector, in m lookups. */
case class PqAdc(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  // left = packed codes binary (one unsigned byte per subspace),
  // right = lut array<array<double>>
  override protected def nullSafeEval(codesAny: Any, lutAny: Any): Any =
    PqAdc.kernel(codesAny.asInstanceOf[Array[Byte]],
      lutAny.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.PqAdc.kernel($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdc = copy(left = l, right = r)
}

object PqAdc {
  /** Static kernel, callable from generated code — runs per candidate
    * PAIR in the ADC scoring join, the hottest PQ site. */
  def kernel(codes: Array[Byte], lut: ArrayData): Double = {
    val m = math.min(codes.length, lut.numElements())
    var s = 0
    var sum = 0.0
    while (s < m) {
      sum += lut.getArray(s).getDouble(codes(s) & 0xff)
      s += 1
    }
    sum
  }
}

/** Per-document term frequencies in one pass: tokenize once, count
  * into an insertion-ordered map, emit array<struct<term, tf>> —
  * pre-combined IN THE ROW, so the (id, term) hash-aggregate shuffle
  * of the `explode → groupBy` formulation disappears entirely (the
  * explode of per-doc entries is a narrow map-side op). Multiset
  * semantics are byte-identical to
  * `explode(tokens) groupBy (id, term) count` (spec-pinned). */
case class TermCounts(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(text: Any): Any =
    TermCounts.kernel(text.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TermCounts.kernel($c)")

  override protected def withNewChildInternal(c: Expression): TermCounts =
    copy(child = c)
}

object TermCounts {
  /** Static kernel, callable from generated code. */
  def kernel(text: UTF8String): ArrayData = {
    val toks = Sketches.tokenize(text)
    val counts = new java.util.LinkedHashMap[String, Long](toks.length * 2)
    var i = 0
    while (i < toks.length) {
      counts.merge(toks(i), 1L, (a, b) => a + b) // one probe per token
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document BIGRAM frequencies in one pass — [[TermCounts]] over
  * space-joined adjacent token pairs: tokenize once, count pairs in
  * the row, emit pre-combined array<struct<term, tf>> entries. Same
  * output columns as TermCounts so consumers share the explode
  * shape; same one-row-per-id caller contract. */
case class BigramCounts(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "bigram_counts"

  override protected def nullSafeEval(text: Any): Any =
    BigramCounts.kernel(text.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BigramCounts.kernel($c)")

  override protected def withNewChildInternal(c: Expression): BigramCounts =
    copy(child = c)
}

object BigramCounts {
  /** Static kernel, callable from generated code. */
  def kernel(text: UTF8String): ArrayData = {
    val toks = Sketches.tokenize(text)
    val counts = new java.util.LinkedHashMap[String, Long](toks.length * 2)
    var i = 0
    while (i < toks.length - 1) {
      counts.merge(toks(i) + " " + toks(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document n-gram repetition statistics in ONE pass — the Gopher
  * repetition signals need no cross-document state at all, so the
  * explode → per-(doc, gram) aggregate → per-doc aggregate pipeline
  * (two corpus shuffles) collapses to a scan: tokenize once, count
  * bigrams and trigrams in two in-row maps, emit
  * struct<nBigrams, topBigram, nTrigrams, dupTri> (all exact integer
  * counts — downstream fractions are unchanged). Null when the
  * document has fewer than two tokens (absent from the operator's
  * output, as before). */
case class RepetitionStats(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("nBigrams", LongType, nullable = false),
    StructField("topBigram", LongType, nullable = false),
    StructField("nTrigrams", LongType, nullable = false),
    StructField("dupTri", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(text: Any): Any =
    RepetitionStats.kernel(text.asInstanceOf[UTF8String])

  // the kernel returns null for <2-token documents, so defineCodeGen
  // (which never sets isNull from the result) cannot be used here
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.InternalRow kr${ev.value} =
        graft.plans.RepetitionStats.kernel($c);
      if (kr${ev.value} == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = kr${ev.value};
      }""")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
}

object RepetitionStats {
  /** Static kernel, callable from generated code; null for <2-token
    * documents (absent from the operator output, as before). */
  def kernel(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val toks = Sketches.tokenize(text)
    val n = toks.length
    if (n < 2) return null
    val bi = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n - 1) {
      bi.merge(toks(i) + " " + toks(i + 1), 1L, (a, b) => a + b)
      i += 1
    }
    var topBigram = 0L
    val bit = bi.values().iterator()
    while (bit.hasNext) { val c = bit.next(); if (c > topBigram) topBigram = c }
    var nTrigrams = 0L
    var dupTri = 0L
    if (n >= 3) {
      nTrigrams = n - 2L
      val tri = new java.util.HashMap[String, Long](n * 2)
      i = 0
      while (i < n - 2) {
        tri.merge(toks(i) + " " + toks(i + 1) + " " + toks(i + 2), 1L,
          (a, b) => a + b)
        i += 1
      }
      val tit = tri.values().iterator()
      while (tit.hasNext) { val c = tit.next(); if (c > 1) dupTri += c }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      n - 1L, topBigram, nTrigrams, dupTri)
  }
}

/** One-pass hashed n-gram feature buckets for DSIR: tokenize once,
  * md5-bucket each unigram and space-joined bigram — one long per
  * gram, multiplicity preserved. Byte-identical to the Column
  * formulation `md5-prefix(concat(tokens, bigrams)) % buckets`
  * (`ImportanceSampling.bucketOf`) and to the DuckDB oracle, but
  * skips the bigram string-array materialisation and the per-gram
  * hex-encode → substring → conv string round-trip that made the
  * corpus feature pass the dominant cost of dsir scoring. */
case class DsirBuckets(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, "buckets must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_buckets"

  override protected def nullSafeEval(text: Any): Any =
    DsirBuckets.kernel(text.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.DsirBuckets.kernel($c, $buckets)")

  override protected def withNewChildInternal(c: Expression): DsirBuckets =
    copy(child = c)
}

object DsirBuckets {
  /** Static kernel, callable from generated code. */
  def kernel(text: UTF8String, buckets: Int): ArrayData = {
    val toks = Sketches.tokenize(text)
    val n = toks.length
    val out = new Array[Long](if (n >= 2) 2 * n - 1 else n)
    var i = 0
    while (i < n) {
      out(i) = Sketches.md5Prefix(toks(i), 8) % buckets
      i += 1
    }
    i = 0
    while (i < n - 1) {
      out(n + i) = Sketches.md5Prefix(toks(i) + " " + toks(i + 1), 8) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }
}

object SketchFunctions {
  import org.apache.spark.sql.catalyst.expressions.Cast

  def minhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(text), shingleSize, numHashes))

  def md5MinhashSignature(text: Column, shingleSize: Int, numHashes: Int): Column =
    Bridge.column(Md5MinHashSignature(Bridge.expression(text), shingleSize, numHashes))

  def md5Simhash(text: Column, bits: Int): Column =
    Bridge.column(Md5SimHash(Bridge.expression(text), bits))

  def distinctShingles(text: Column, shingleSize: Int): Column =
    Bridge.column(DistinctShingles(Bridge.expression(text), shingleSize))

  def dsirBuckets(text: Column, buckets: Int): Column =
    Bridge.column(DsirBuckets(Bridge.expression(text), buckets))

  def termCounts(text: Column): Column =
    Bridge.column(TermCounts(Bridge.expression(text)))

  def bigramCounts(text: Column): Column =
    Bridge.column(BigramCounts(Bridge.expression(text)))

  def repetitionStats(text: Column): Column =
    Bridge.column(RepetitionStats(Bridge.expression(text)))

  def dotProduct(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Cast(Bridge.expression(a), ArrayType(DoubleType)),
      Cast(Bridge.expression(b), ArrayType(DoubleType))))

  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  def rhpTableKeys(embedding: Column, tables: Int, planesPerTable: Int,
                   seed: Long = 42L): Column =
    Bridge.column(RhpTableKeys(
      Cast(Bridge.expression(embedding), ArrayType(DoubleType)),
      tables, planesPerTable, seed))

  def nearestCells(embedding: Column, centroids: Array[Array[Double]],
                   nProbe: Int): Column =
    Bridge.column(NearestCells(
      Cast(Bridge.expression(embedding), ArrayType(DoubleType)),
      centroids, nProbe))

  def pqCodes(embedding: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqCodes(
      Cast(Bridge.expression(embedding), ArrayType(DoubleType)), codebooks))

  def pqLut(embedding: Column, codebooks: Array[Array[Array[Double]]]): Column =
    Bridge.column(PqLut(
      Cast(Bridge.expression(embedding), ArrayType(DoubleType)), codebooks))

  def pqAdc(codes: Column, lut: Column): Column =
    Bridge.column(PqAdc(Bridge.expression(codes), Bridge.expression(lut)))
}
