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
