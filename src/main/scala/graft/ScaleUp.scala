package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale-up generator for the scale rehearsal: clones the
  * `documents` and `embeddings` tables N× so the iterative /
  * quadratic-risk operators (connected components, minhash /
  * containment pairs, k-means, IVF-PQ build, DSIR) can be benched for
  * near-linear scaling beyond the largest driver-provided testdata.
  *
  * The clone transforms are chosen so the near-duplicate/cluster
  * STRUCTURE scales linearly — the property the rehearsal must hold
  * fixed. A naive N× copy makes every clone a (near-)duplicate of its
  * original: cluster sizes grow N×, candidate pairs grow N², and the
  * benchmark would measure a different workload shape at every scale.
  * Instead each copy preserves intra-copy geometry exactly and shares
  * nothing with other copies:
  *
  *  - documents: every token gets a copy-specific suffix (`tok~i`).
  *    Within a copy, shingle/minhash/simhash structure is isomorphic
  *    to the original (a shingle (a b c) maps 1:1 to (a~i b~i c~i));
  *    across copies, no shingle is shared — so pair counts and
  *    component sizes scale exactly N×.
  *  - embeddings: dimensions are rotated by a copy-specific offset
  *    (an orthogonal permutation): norms, inner products, and hence
  *    the entire within-copy cosine structure are preserved exactly,
  *    while cross-copy cosine decorrelates to noise.
  *
  * ids are offset by copy × (max id + 1); copy 0 is byte-identical to
  * the source. Usage:
  * {{{ sbt "runMain graft.ScaleUp /root/testdata/sf0.1 target/sf1 10" }}}
  */
object ScaleUp {

  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val stride = docs.agg(max("doc_id")).head().getLong(0) + 1L
    (0 until factor).map { i =>
      if (i == 0) docs
      else docs
        .withColumn("doc_id", col("doc_id") + lit(i * stride))
        .withColumn("text",
          array_join(
            transform(
              filter(split(col("text"), "\\s+"), t => t =!= ""),
              t => concat(t, lit(s"~$i"))),
            " "))
    }.reduce(_ unionByName _)
  }

  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val stride = emb.agg(max("vec_id")).head().getLong(0) + 1L
    val d = emb.select(size(col("embedding"))).head().getInt(0)
    (0 until factor).map { i =>
      val k = (i * 7) % d
      if (k == 0) emb.withColumn("vec_id", col("vec_id") + lit(i * stride))
      else emb
        .withColumn("vec_id", col("vec_id") + lit(i * stride))
        .withColumn("embedding",
          concat(slice(col("embedding"), k + 1, d - k),
            slice(col("embedding"), 1, k)))
    }.reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, destDir, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scaleDocuments(spark.read.parquet(s"$srcDir/documents.parquet"), factor)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$destDir/documents.parquet")
    scaleEmbeddings(spark.read.parquet(s"$srcDir/embeddings.parquet"), factor)
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$destDir/embeddings.parquet")
    println(s"SCALEUP done: $destDir at $factor x " +
      s"docs=${spark.read.parquet(s"$destDir/documents.parquet").count()} " +
      s"vecs=${spark.read.parquet(s"$destDir/embeddings.parquet").count()}")
    spark.stop()
  }
}
