package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - brute-force cosine top-k: one scan, codegen'd zip_with dot
  *    product, per-query window top-k — the correctness baseline;
  *  - LSH-bucketed (random hyperplane) variant: candidates restricted
  *    to signature buckets, turning the all-pairs O(n·q) scan into an
  *    equi-join — the 100 TB path. Hyperplanes are derived
  *    deterministically from a seed via hash mixing, so no state needs
  *    distributing.
  */
object Similarity {

  /** Dot product of two equal-length float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d =!= 0.0, dot(a, b) / d)
  }

  /** Brute-force cosine top-k neighbours for every query row.
    * `queries` and `corpus` both carry (id, embedding); the result has
    * one row per (queryId, neighbourId, rank<=k). The corpus scan is
    * a broadcast-join-free cross join — use only when one side is
    * small or as an oracle; the LSH variant is the scale path. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = queries.select(col("id").as("queryId"), col("embedding").as("q"))
      .crossJoin(corpus.select(col("id").as("neighbourId"), col("embedding").as("c")))
      .filter(col("queryId") =!= col("neighbourId"))
      .withColumn("similarity", cosine(col("q"), col("c")))
    val w = Window.partitionBy("queryId")
      .orderBy(col("similarity").desc, col("neighbourId"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("queryId", "neighbourId", "similarity", "rank")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dimension i): a hash-mixed value in [-1, 1). */
  private def planeComponent(p: Column, i: Column, seed: Long): Column = {
    val h = xxhash64(p * 131071 + i, lit(seed))
    (h.cast("double") / lit(Long.MaxValue.toDouble))
  }

  /** Random-hyperplane signature: `planes` sign bits packed to long. */
  def rhpSignature(embedding: Column, planes: Int, seed: Long = 42L): Column =
    aggregate(
      transform(sequence(lit(0), lit(planes - 1)), p => {
        val proj = aggregate(
          zip_with(embedding, sequence(lit(0), size(embedding) - 1),
            (x, i) => x * planeComponent(p, i, seed)),
          lit(0.0), (acc, v) => acc + v)
        when(proj > 0, lit(1L)).otherwise(lit(0L))
      }),
      lit(0L), (acc, b) => acc * 2 + b)

  /** Per-table band keys over one long signature: table t uses plane
    * bits [t·perTable, (t+1)·perTable). A candidate matches if it
    * shares ANY table's sub-signature with the query (OR-amplified
    * LSH) — the knob trading recall vs candidates is
    * (tables, planesPerTable). */
  def lshTableKeys(embedding: Column, tables: Int, planesPerTable: Int,
                   seed: Long): Column = {
    val sigBits = transform(sequence(lit(0), lit(tables * planesPerTable - 1)), p => {
      val proj = aggregate(
        zip_with(embedding, sequence(lit(0), size(embedding) - 1),
          (x, i) => x * planeComponent(p, i, seed)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit(1L)).otherwise(lit(0L))
    })
    transform(sequence(lit(0), lit(tables - 1)), t =>
      struct(t.as("table"),
        aggregate(slice(sigBits, t * planesPerTable + 1, lit(planesPerTable)),
          lit(0L), (acc, b) => acc * 2 + b).as("key")))
  }

  /** LSH-bucketed approximate top-k: only corpus rows sharing at least
    * one of the query's table buckets are scored. At 100 TB this turns
    * the all-pairs scan into `tables` equi-joins' worth of shuffle. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 8, planesPerTable: Int = 4,
              seed: Long = 42L): DataFrame = {
    def banded(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col("id").as(idAs), col("embedding").as(vecAs),
        posexplode(graft.plans.SketchFunctions
          .rhpTableKeys(col("embedding"), tables, planesPerTable, seed)))
        .withColumnsRenamed(Map("pos" -> "table", "col" -> "key"))
        .select(col(idAs), col(vecAs), col("table"), col("key"))
    val sigC = banded(corpus, "neighbourId", "c")
    val sigQ = banded(queries, "queryId", "q")
    val w = Window.partitionBy("queryId")
      .orderBy(col("similarity").desc, col("neighbourId"))
    sigQ.join(sigC, Seq("table", "key"))
      .filter(col("queryId") =!= col("neighbourId"))
      .select(col("queryId"), col("neighbourId"), col("q"), col("c"))
      .dropDuplicates("queryId", "neighbourId")
      .withColumn("similarity", cosine(col("q"), col("c")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("queryId", "neighbourId", "similarity", "rank")
  }

  /** Exact all-pairs cosine near-duplicates (id-ordered, one row per
    * pair) — the O(n²) correctness baseline and the DuckDB-mirrorable
    * oracle for [[embeddingDupPairs]]; use the LSH variant at scale. */
  def bruteForceDupPairs(df: DataFrame, threshold: Double): DataFrame =
    df.select(col("id").as("idA"), col("embedding").as("a"))
      .join(df.select(col("id").as("idB"), col("embedding").as("b")),
        col("idA") < col("idB"))
      .withColumn("similarity", cosine(col("a"), col("b")))
      .filter(col("similarity") >= threshold)
      .select("idA", "idB", "similarity")

  /** All near-duplicate pairs by embedding cosine ≥ threshold, LSH
    * bucketed (candidates must share the full signature). */
  def embeddingDupPairs(df: DataFrame, threshold: Double = 0.95,
                        planes: Int = 8, seed: Long = 42L): DataFrame = {
    val sig = df.select(col("id"), col("embedding"),
      rhpSignature(col("embedding"), planes, seed).as("sig"))
    sig.alias("a")
      .join(sig.alias("b"),
        col("a.sig") === col("b.sig") && col("a.id") < col("b.id"))
      .withColumn("similarity", cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("similarity") >= threshold)
      .select(col("a.id").as("idA"), col("b.id").as("idB"), col("similarity"))
  }
}
