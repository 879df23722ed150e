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

  /** Dot product of two equal-length numeric arrays — the native
    * one-pass expression ([[graft.plans.DotProduct]]); the HOF
    * formulation interprets two lambdas per element and measured ~50×
    * slower across a 12.5M-pair join. */
  def dot(a: Column, b: Column): Column =
    graft.plans.SketchFunctions.dotProduct(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d =!= 0.0, dot(a, b) / d)
  }

  /** Cosine from a precomputed per-side norm: inside a pairwise join
    * ALWAYS precompute the norms on each side before joining — the
    * naive `cosine(a, b)` re-derives both self-dots once per PAIR,
    * tripling the per-pair work. */
  private def cosineWithNorms(dotAb: Column, normA: Column,
                              normB: Column): Column = {
    val d = normA * normB
    when(d =!= 0.0, dotAb / d)
  }

  /** Brute-force cosine top-k neighbours for every query row.
    * `queries` and `corpus` both carry (id, embedding); the result has
    * one row per (queryId, neighbourId, rank<=k). The corpus scan is
    * a broadcast-join-free cross join — use only when one side is
    * small or as an oracle; the LSH variant is the scale path. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = queries.select(col("id").as("queryId"), col("embedding").as("q"),
      norm(col("embedding")).as("_nq"))
      .crossJoin(corpus.select(col("id").as("neighbourId"),
        col("embedding").as("c"), norm(col("embedding")).as("_nc")))
      .filter(col("queryId") =!= col("neighbourId"))
      .withColumn("similarity",
        cosineWithNorms(dot(col("q"), col("c")), col("_nq"), col("_nc")))
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

  /** IVF (inverted-file) ANN: corpus vectors are partitioned into
    * `nLists` k-means cells; a query probes only its `nProbe` nearest
    * cells, turning the all-pairs scan into a centroid-bucketed
    * equi-join — the classic coarse-quantiser scale path alongside
    * the random-hyperplane LSH variant. The centroid model is tiny
    * (nLists × dim) and broadcasts; cell assignment is one distributed
    * transform per side, so nothing about the index lives on the
    * driver. Recall is governed by nProbe exactly as in FAISS-style
    * IVF-flat. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nLists: Int = 16, nProbe: Int = 3,
              seed: Long = 42L, trainIters: Int = 5): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val train = corpus.select(array_to_vector(
      col("embedding").cast("array<double>")).as("features"))
    // a coarse quantiser needs rough cells, not converged clusters —
    // few iterations keep the (driver-coordinated) training cheap
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(trainIters)
      .setFeaturesCol("features").fit(train)
    val centroids = model.clusterCenters.map(_.toArray)
    // native one-pass cell assignment: the (nLists × dim) centroid
    // matrix rides inside the expression — no broadcast variable, no
    // per-row UDF serialisation boundary
    def cellsOf(emb: Column, probes: Int): Column =
      graft.plans.SketchFunctions.nearestCells(emb, centroids, probes)
    val corpusCells = corpus.select(col("id").as("neighbourId"),
      col("embedding").cast("array<double>").as("c"),
      norm(col("embedding")).as("_nc"),
      explode(cellsOf(col("embedding"), 1)).as("cell"))
    val queryCells = queries.select(col("id").as("queryId"),
      col("embedding").cast("array<double>").as("q"),
      norm(col("embedding")).as("_nq"),
      explode(cellsOf(col("embedding"), nProbe)).as("cell"))
    val w = Window.partitionBy("queryId")
      .orderBy(col("similarity").desc, col("neighbourId"))
    queryCells
      .join(corpusCells, Seq("cell"))
      .filter(col("queryId") =!= col("neighbourId"))
      .dropDuplicates("queryId", "neighbourId")
      .withColumn("similarity",
        cosineWithNorms(dot(col("q"), col("c")), col("_nq"), col("_nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("queryId", "neighbourId", "similarity", "rank")
  }

  /** Exact all-pairs cosine near-duplicates (id-ordered, one row per
    * pair) — the O(n²) correctness baseline and the DuckDB-mirrorable
    * oracle for [[embeddingDupPairs]]; use the LSH variant at scale. */
  def bruteForceDupPairs(df: DataFrame, threshold: Double): DataFrame =
    df.select(col("id").as("idA"), col("embedding").as("a"),
      norm(col("embedding")).as("_na"))
      .join(df.select(col("id").as("idB"), col("embedding").as("b"),
        norm(col("embedding")).as("_nb")),
        col("idA") < col("idB"))
      .withColumn("similarity",
        cosineWithNorms(dot(col("a"), col("b")), col("_na"), col("_nb")))
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

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): every
    * embedding is assigned to its most-cosine-similar seed centroid,
    * then near-duplicate pairs are searched WITHIN clusters only —
    * the pigeonhole that turns the all-pairs scan into per-cluster
    * blocks. `centroids` is a small deterministic seed frame (id,
    * embedding) — e.g. a fixed modulus of the corpus ids or k-means
    * centres from [[ivfTopK]]'s trainer; it broadcasts, so assignment
    * is one map-side pass + one per-id top-1 (no driver model state,
    * and the pipeline stays SQL-mirrorable for the oracle, unlike the
    * k-means path). Ties (equal similarity) resolve to the smallest
    * centroid id. Returns (cell, idA, idB, similarity) with idA<idB
    * and cosine ≥ threshold. Dropping every idB leaves exactly the
    * SemDeDup survivor set (keep-lowest-id policy). */
  def semanticDupPairs(embeddings: DataFrame, centroids: DataFrame,
                       threshold: Double = 0.9): DataFrame = {
    val cents = centroids.select(col("id").as("centId"),
      col("embedding").as("cv"), norm(col("embedding")).as("_ncv"))
    val w = Window.partitionBy("id")
      .orderBy(col("csim").desc_nulls_last, col("centId"))
    val assigned = embeddings
      .select(col("id"), col("embedding"), norm(col("embedding")).as("_n"))
      .crossJoin(broadcast(cents))
      .withColumn("csim",
        cosineWithNorms(dot(col("embedding"), col("cv")), col("_n"), col("_ncv")))
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("id"), col("embedding"), col("_n"), col("centId").as("cell"))
    assigned.alias("a")
      .join(assigned.alias("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .withColumn("similarity",
        cosineWithNorms(dot(col("a.embedding"), col("b.embedding")),
          col("a._n"), col("b._n")))
      .filter(col("similarity") >= threshold)
      .select(col("a.cell").as("cell"), col("a.id").as("idA"),
        col("b.id").as("idB"), col("similarity"))
  }
}
