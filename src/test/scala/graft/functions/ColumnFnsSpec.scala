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

  test("renamers: camelCase all columns, prefix with exceptions") {
    val df = Seq((1, 2)).toDF("col_one", "col_two")
    assert(ColumnFns.camelCaseColumns(df).columns.toSeq ==
      Seq("colOne", "colTwo"))
    assert(ColumnFns.prefixColumns(df, "x_", except = Seq("col_one"))
      .columns.toSeq == Seq("col_one", "x_col_two"))
  }
}
