package graft.steps

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class StepsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory("steps").resolve(name).toString

  test("registry exposes the production steps with usage text") {
    assert(Steps.registry.size >= 18)
    assert(Steps.registry.contains("window_based_clumping"))
    assert(Steps.registry.contains("susie_finemapping"))
    assert(Steps.usage.contains("l2g_feature_matrix"))
  }

  test("argument parsing: typed accessors, defaults, and errors") {
    val a = Steps.StepArgs(Map("in" -> "/x", "distance" -> "1000",
      "flag" -> "true"))
    assert(a("in") == "/x")
    assert(a.int("distance", 5) == 1000)
    assert(a.int("missing", 5) == 5)
    assert(a.bool("flag", false))
    intercept[IllegalArgumentException](a("nope"))
    intercept[IllegalArgumentException](
      Steps.runFromArgs(spark, Seq("no_such_step")))
    intercept[IllegalArgumentException](
      Steps.runFromArgs(spark, Seq("pics", "malformed-arg")))
  }

  test("window_based_clumping step runs end-to-end on parquet") {
    val in = tmp("sumstats_in")
    val out = tmp("clumped_out")
    (0 until 100).map { i =>
      ("s1", "1", i * 1000, s"v$i", 1.0f, -10 - (i % 5))
    }.toDF("studyId", "chromosome", "position", "variantId",
      "pValueMantissa", "pValueExponent")
      .write.parquet(in)
    Steps.runFromArgs(spark,
      Seq("window_based_clumping", s"in=$in", s"out=$out", "distance=10000"))
    val result = spark.read.parquet(out)
    assert(result.count() == 100)
    assert(result.columns.contains("qualityControls"))
    assert(result.columns.contains("studyLocusId"))
  }

  test("dedup_exact step runs end-to-end on parquet") {
    val in = tmp("docs_in")
    val out = tmp("docs_out")
    Seq((1L, "same"), (2L, "same"), (3L, "different"))
      .toDF("doc_id", "text").write.parquet(in)
    Steps.runFromArgs(spark, Seq("dedup_exact", s"in=$in", s"out=$out"))
    assert(spark.read.parquet(out).count() == 2)
  }

  test("training-data steps chain: signals -> split -> canonical dedup") {
    val in = tmp("corpus_in")
    Seq((1L, "src0", "the quick brown fox jumps"),
      (2L, "src0", "the quick brown fox jumps"),
      (3L, "src1", "entirely different text here"),
      (4L, "src1", "zz qq xx yy ww vv"))
      .toDF("doc_id", "source", "text").write.parquet(in)
    val signals = tmp("signals_out")
    Steps.runFromArgs(spark, Seq("text_signals", s"in=$in", s"out=$signals"))
    val sig = spark.read.parquet(signals)
    assert(sig.count() == 4 && sig.columns.contains("unigramLogProb") &&
      sig.columns.contains("qualityScore"))
    val split = tmp("split_out")
    Steps.runFromArgs(spark, Seq("assign_split", s"in=$in", s"out=$split",
      "val_frac=0.25", "test_frac=0.25"))
    assert(spark.read.parquet(split).select("split").distinct().count() >= 1)
    val pairs = tmp("pairs_in")
    Seq((1L, 2L)).toDF("idA", "idB").write.parquet(pairs)
    val deduped = tmp("dedup_out")
    Steps.runFromArgs(spark, Seq("dedup_cluster_canonical",
      s"in=$in", s"pairs=$pairs", s"out=$deduped"))
    assert(spark.read.parquet(deduped).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 3L, 4L))
  }

  test("pq index steps: build, append, search") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    val base = tmp("pq_corpus"); val delta = tmp("pq_delta")
    emb.filter(col("id") < 400).write.parquet(base)
    emb.filter(col("id") >= 400).write.parquet(delta)
    val idx = tmp("pq_index")
    Steps.runFromArgs(spark, Seq("pq_index_build", s"in=$base", s"out=$idx",
      "m=16", "n_lists=8"))
    val appended = tmp("pq_appended")
    Steps.runFromArgs(spark, Seq("pq_index_append", s"in=$delta",
      s"index=$idx", s"out=$appended"))
    assert(spark.read.parquet(appended).count() == 100)
    val queries = tmp("pq_queries")
    emb.filter(col("id") < 3).write.parquet(queries)
    val hits = tmp("pq_hits")
    Steps.runFromArgs(spark, Seq("pq_search", s"index=$idx",
      s"queries=$queries", s"out=$hits", "k=5", "n_probe=4",
      s"refine_corpus=$base"))
    val got = spark.read.parquet(hits)
    assert(got.count() == 15 && got.columns.contains("score"))
  }

  test("study_validation step chains optional validators") {
    val in = tmp("studies_in")
    val targets = tmp("targets_in")
    val out = tmp("studies_out")
    Seq(("s1", "eqtl", "gKnown"), ("s2", "eqtl", "gUnknown"))
      .toDF("studyId", "studyType", "geneId").write.parquet(in)
    Seq("gKnown").toDF("id").write.parquet(targets)
    Steps.runFromArgs(spark, Seq("study_validation",
      s"in=$in", s"out=$out", s"target_index=$targets"))
    val flagged = spark.read.parquet(out)
      .filter(size(col("qualityControls")) > 0)
      .select("studyId").as[String].collect().toSeq
    assert(flagged == Seq("s2"))
  }
}
