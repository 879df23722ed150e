package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ArrayFnsSpec extends SparkSpec {
  import spark.implicits._

  test("harmonicSum: sorted-desc scores weighted by 1/i^2, normalised") {
    val scores = Seq(0.2, 0.9, 0.5)
    val df = Seq(Tuple1(scores)).toDF("s")
      .select(ArrayFns.harmonicSum(col("s")).as("h"))
    val sorted = scores.sorted.reverse
    val num = sorted.zipWithIndex.map { case (x, i) => x / math.pow(i + 1.0, 2) }.sum
    val den = (1 to scores.size).map(i => 1.0 / (i.toDouble * i)).sum
    assert(math.abs(df.head.getDouble(0) - num / den) < 1e-12)
  }

  test("updateQualityFlag appends flag only when condition holds, null-safe") {
    val df = Seq(
      (Some(Seq("A")), true),
      (None: Option[Seq[String]], true),
      (Some(Seq("A")), false),
      (None: Option[Seq[String]], false)
    ).toDF("qc", "cond")
    val out = df.select(ArrayFns.updateQualityFlag(col("qc"), col("cond"), "F").as("qc"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("A", "F"))
    assert(out(1) == Seq("F"))
    assert(out(2) == Seq("A"))
    assert(out(3) == Seq())
  }

  test("validRows drops rows with any excluded flag") {
    val df = Seq(
      ("keep_null", None: Option[Seq[String]]),
      ("keep_other", Some(Seq("OK"))),
      ("drop", Some(Seq("OK", "BAD")))
    ).toDF("name", "qc")
    val kept = df.filter(ArrayFns.validRows(col("qc"), Seq("BAD", "WORSE")))
      .select("name").as[String].collect().toSet
    assert(kept == Set("keep_null", "keep_other"))
  }

  test("generateIdentifier is deterministic md5 and null-safe") {
    val df = Seq(("a", Some(1)), ("a", None)).toDF("x", "y")
    val ids = df.select(ArrayFns.generateIdentifier(Seq(col("x"), col("y"))).as("id"))
      .as[String].collect()
    assert(ids(0).length == 32 && ids(0) != ids(1))
  }

  test("sortArrayOfStructsDesc orders by field desc with nulls last") {
    val df = Seq(Tuple1(Seq((Some(1.0), "a"), (None, "b"), (Some(3.0), "c")))).toDF("arr")
      .select(col("arr").cast("array<struct<score:double,name:string>>").as("arr"))
      .select(ArrayFns.sortArrayOfStructsDesc(col("arr"), "score").as("arr"))
    val names = df.select(expr("transform(arr, x -> x.name)")).as[Seq[String]].head
    assert(names == Seq("c", "a", "b"))
  }

  test("extractChromosome/Position from variantId") {
    val df = Seq("X_123_A_T", "10_500_GC_G").toDF("v").select(
      ArrayFns.extractChromosome(col("v")).as("c"),
      ArrayFns.extractPosition(col("v")).as("p"))
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1)))
    assert(rows(0) == ("X", 123) && rows(1) == ("10", 500))
  }

  test("safeArrayUnion and nullifyEmptyArray") {
    val df = Seq(
      (Some(Seq("a")), Some(Seq("b"))),
      (Some(Seq("a")), None),
      (None: Option[Seq[String]], None: Option[Seq[String]])
    ).toDF("a", "b")
    val out = df.select(ArrayFns.safeArrayUnion(col("a"), col("b")).as("u"))
      .as[Option[Seq[String]]].collect()
    assert(out(0).get.toSet == Set("a", "b") && out(1).get == Seq("a") && out(2).isEmpty)
    val e = Seq(Tuple1(Seq.empty[String])).toDF("x")
      .select(ArrayFns.nullifyEmptyArray(col("x"))).head
    assert(e.isNullAt(0))
  }
}
