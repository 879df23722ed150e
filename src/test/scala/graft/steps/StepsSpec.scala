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
