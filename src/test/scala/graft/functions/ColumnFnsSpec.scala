package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ColumnFnsSpec extends SparkSpec {
  import spark.implicits._

  test("coerceToSchema drops extras, nulls missing, casts types") {
    val df = Seq((1, 0.5f, "x")).toDF("a", "b", "c")
      .select(struct(col("a"), col("b"), col("c")).as("s"))
      .select(ColumnFns.coerceToSchema(col("s"),
        "struct<a:string,b:double,d:int>").as("s"))
    val r = df.select("s.a", "s.b", "s.d").head
    assert(r.getString(0) == "1")
    assert(r.getDouble(1) == 0.5)
    assert(r.isNullAt(2))
    assert(!df.select("s.*").columns.contains("c"))
  }

  test("camelCase conversion matches the reference doctests") {
    assert(ColumnFns.toCamelCase("hello_world") == "helloWorld")
    assert(ColumnFns.toCamelCase("hello world") == "helloWorld")
    assert(ColumnFns.toCamelCase("p-value (log)") == "pValueLog")
  }

  test("wide/long round trip and extreme-record selection") {
    val df = Seq(("a", 1.0, 2.0), ("b", 3.0, 4.0)).toDF("id", "f1", "f2")
    val long = ColumnFns.wideToLong(df, Seq("id"), Seq("f1", "f2"))
    assert(long.count() == 4)
    val wide = ColumnFns.longToWide(long, Seq("id"))
    assert(wide.columns.sorted.toSeq == Seq("f1", "f2", "id"))
    assert(wide.filter(col("id") === "a").select("f2").head.getDouble(0) == 2.0)
    val recs = Seq(("g1", 1), ("g1", 5), ("g2", 3)).toDF("g", "v")
    assert(ColumnFns.recordWithMaximumValue(recs, Seq("g"), "v")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("g1", 5), ("g2", 3)))
    assert(ColumnFns.recordWithMinimumValue(recs, Seq("g"), "v")
      .filter(col("g") === "g1").head.getInt(1) == 1)
    val norm = ColumnFns.normaliseColumn(recs, "v", "nv")
      .select("v", "nv").collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(norm(1) == 0.0 && norm(5) == 1.0 && math.abs(norm(3) - 0.5) < 1e-12)
    // reference doctest: spark_helpers.py:773-787
    val se = Seq((0.5, 1.5)).toDF("lo", "hi")
      .select(PValues.standardErrorFromConfidenceInterval(
        col("lo"), col("hi"))).head.getDouble(0)
    assert(math.abs(se - 0.25510204081632654) < 1e-15)
  }

  test("renamers: camelCase all columns, prefix with exceptions") {
    val df = Seq((1, 2)).toDF("col_one", "col_two")
    assert(ColumnFns.camelCaseColumns(df).columns.toSeq ==
      Seq("colOne", "colTwo"))
    assert(ColumnFns.prefixColumns(df, "x_", except = Seq("col_one"))
      .columns.toSeq == Seq("col_one", "x_col_two"))
  }
}
