package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Column-shape helpers: schema coercion through a JSON round-trip
  * (F14) and column renamers (F16).
  * reference: src/gentropy/common/spark_helpers.py:316-351, 545-585 */
object ColumnFns {

  /** Coerce a (possibly nested) column to the expected schema: extra
    * fields dropped, missing fields nulled, mismatched types cast —
    * the reference's `enforce_schema` JSON round-trip. */
  def coerceToSchema(c: Column, schema: DataType): Column =
    from_json(to_json(c), schema)

  /** Coerce via a DDL schema string, e.g.
    * `"struct<method:string,score:float>"`. */
  def coerceToSchema(c: Column, ddl: String): Column =
    coerceToSchema(c, DataType.fromDDL(ddl))

  /** snake/space/punctuated string → camelCase.
    * reference: src/gentropy/common/spark_helpers.py:316-335 */
  def toCamelCase(name: String): String = {
    val normalised = name.replaceAll("[/()\\-]+", " ")
    val parts = normalised.split("[ _-]").filter(_.nonEmpty)
    if (parts.isEmpty) ""
    else parts.head.toLowerCase +
      parts.tail.map(_.capitalize).mkString
  }

  /** Wide → long: one (id, featureName, featureValue) row per value
    * column, via the native `unpivot` operator.
    * reference: src/gentropy/common/spark_helpers.py:24-73 */
  def wideToLong(df: DataFrame, idCols: Seq[String],
                 valueCols: Seq[String],
                 nameCol: String = "featureName",
                 valueCol: String = "featureValue"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      nameCol, valueCol)

  /** Long → wide: pivot the name column back into value columns.
    * reference: src/gentropy/common/spark_helpers.py:74-100, 485-518 */
  def longToWide(df: DataFrame, idCols: Seq[String],
                 nameCol: String = "featureName",
                 valueCol: String = "featureValue"): DataFrame =
    df.groupBy(idCols.map(col): _*)
      .pivot(nameCol)
      .agg(first(col(valueCol)))

  /** One row per group carrying the extreme of `orderCol` (ties broken
    * arbitrarily but deterministically by the sort).
    * reference: src/gentropy/common/spark_helpers.py:160-214 */
  def recordWithExtremeValue(df: DataFrame, groupCols: Seq[String],
                             orderCol: String, max: Boolean): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(if (max) col(orderCol).desc else col(orderCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  def recordWithMaximumValue(df: DataFrame, groupCols: Seq[String],
                             orderCol: String): DataFrame =
    recordWithExtremeValue(df, groupCols, orderCol, max = true)

  def recordWithMinimumValue(df: DataFrame, groupCols: Seq[String],
                             orderCol: String): DataFrame =
    recordWithExtremeValue(df, groupCols, orderCol, max = false)

  /** Min-max normalise a column into [0, 1] over the whole frame.
    * reference: src/gentropy/common/spark_helpers.py:215-255 */
  def normaliseColumn(df: DataFrame, colName: String,
                      outName: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    df.withColumn(outName,
      (col(colName) - min(col(colName)).over(w)) /
        (max(col(colName)).over(w) - min(col(colName)).over(w)))
  }

  /** Rename every column to camelCase. */
  def camelCaseColumns(df: DataFrame): DataFrame =
    df.columns.foldLeft(df)((d, c) => d.withColumnRenamed(c, toCamelCase(c)))

  /** Prefix every column except the keys (the reference's pivot-helper
    * renamer shape). */
  def prefixColumns(df: DataFrame, prefix: String,
                    except: Seq[String] = Nil): DataFrame =
    df.columns.foldLeft(df)((d, c) =>
      if (except.contains(c)) d else d.withColumnRenamed(c, s"$prefix$c"))
}
