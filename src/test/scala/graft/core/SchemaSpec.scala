package graft.core

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaSpec extends SparkSpec {
  import SchemaValidator._

  private val expected = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("score", DoubleType, nullable = true),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("weight", DoubleType, nullable = true)))), nullable = true)))

  test("identical schema validates clean") {
    assert(compare(expected, expected).isEmpty)
  }

  test("missing mandatory, unexpected, and nested type mismatch detected") {
    val observed = StructType(Seq(
      StructField("score", DoubleType), // id missing (mandatory)
      StructField("extra", IntegerType), // undeclared
      StructField("tags", ArrayType(StructType(Seq(
        StructField("name", IntegerType), // nested type mismatch
        StructField("weight", DoubleType)))))))
    val issues = compare(expected, observed)
    assert(issues.contains(MissingMandatoryColumn("id")))
    assert(issues.contains(UnexpectedColumn("extra")))
    assert(issues.exists {
      case TypeMismatch("tags[].name", _, _) => true
      case _ => false
    })
  }

  test("missing optional column is tolerated") {
    val observed = StructType(Seq(StructField("id", StringType, nullable = false)))
    assert(compare(expected, observed).isEmpty)
  }

  test("GDataset round trip: write, typed read, validation") {
    import spark.implicits._
    val rows = Seq(
      SummaryStatisticsRow("s1", "1_100_A_T", "1", 100, 0.5, Some(1000),
        1.0f, -8, None, Some(0.1)))
    val path = java.nio.file.Files.createTempDirectory("gds").toString + "/ss"
    rows.toDF().write.parquet(path)
    val ds = GDataset.fromParquet[SummaryStatisticsRow](spark, path)
    assert(ds.validated.df.count() == 1)
    // domain schemas derive from case classes
    assert(GDataset.schemaOf[StudyLocusRow].fieldNames.contains("locus"))
    assert(GDataset.schemaOf[ColocalisationRow].fieldNames.contains("h4"))
  }

  test("fromParquet fails on empty data") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("gds").toString + "/empty"
    Seq.empty[SummaryStatisticsRow].toDF().write.parquet(path)
    intercept[IllegalArgumentException] {
      GDataset.fromParquet[SummaryStatisticsRow](spark, path)
    }
  }
}
