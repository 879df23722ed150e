package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.TopK

/** Keyword retrieval over a document corpus: Okapi BM25 scoring with
  * bounded top-k per query — the sparse (lexical) counterpart of the
  * dense ANN family in [[Similarity]], and the retrieval verb a
  * training-data pipeline needs for benchmark mining, hard-negative
  * sourcing, and corpus QA ("which documents answer this probe?").
  *
  * Scale shape: the corpus is reduced once to (doc, term, tf) with a
  * single explode + hash-groupBy (map-side combine); everything
  * query-dependent is then pruned to the QUERY VOCABULARY before it
  * touches corpus-scale frames — the query-term table broadcasts (a
  * query batch is KBs), so the only corpus-sized work after the tf
  * pass is one equi-join fetching the pruned postings and one join
  * against the per-doc length table. Per-query ranking ships k-bounded
  * heaps ([[graft.plans.TopKIdsAgg]]), never candidate sets, so the
  * final shuffle is kilobytes regardless of corpus size.
  */
object Search {

  /** (id, term, tf) term frequencies: one explode + one hash-groupBy
    * over [[TextAnalysis.tokens]] (lowercased whitespace tokens). */
  def termFrequencies(docs: DataFrame, textCol: String,
                      idCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("id", "term")
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k documents per query: (query_id, rank, doc_id,
    * score), rank 1 = best, ties broken toward the smaller doc_id.
    *
    * `queries` is (queryIdCol, queryTextCol) — a query BATCH, scored
    * against the corpus in one dataflow. idf is the Lucene
    * non-negative variant ln(1 + (N − df + 0.5)/(df + 0.5)); df
    * counts documents containing the term corpus-wide (computed on
    * the postings already pruned to query terms, which is the same
    * number).
    *
    * The per-(query, doc) score sums at most |query terms| values, so
    * the scoring groupBy state is bounded by the query length; the
    * top-k groupBy state is the k-entry heap. */
  def bm25TopK(docs: DataFrame, textCol: String, idCol: String,
               queries: DataFrame,
               queryIdCol: String = "query_id",
               queryTextCol: String = "qtext",
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
               cache: graft.core.CacheHandle =
                 graft.core.CacheHandle()): DataFrame = {
    require(k > 0, "k must be positive")
    val tf = cache.persist(termFrequencies(docs, textCol, idCol))
    val dl = tf.groupBy("id").agg(sum("tf").as("dl"))
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg("dl").as("avgdl"))
    val qterms = queries.select(col(queryIdCol).as("query_id"),
      explode(array_distinct(TextAnalysis.tokens(col(queryTextCol))))
        .as("term"))
    // prune the postings to the query vocabulary FIRST: every later
    // stage (df counts, query fan-out, scoring) runs on this frame,
    // which is |query vocab| postings lists, not the corpus
    val tfq = cache.persist(
      tf.join(broadcast(qterms.select("term").distinct()), Seq("term")))
    val dfreq = tfq.groupBy("term").agg(count(lit(1)).as("df"))
    val perTerm = tfq
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("score_t",
        col("idf") * (col("tf") * (k1 + 1.0)) /
          (col("tf") + (col("dl") / col("avgdl") * b + (1.0 - b)) * k1))
    perTerm
      .groupBy("query_id", "id")
      .agg(sum("score_t").as("score"))
      .groupBy("query_id")
      .agg(TopK.topkIdsKeyed(-col("score"), col("id"), k).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("hit.id").as("doc_id"),
        (-col("hit.key")).as("score"))
  }
}
