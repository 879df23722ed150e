package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** The reusable Column-expression library the reference keeps in
  * `common/spark_helpers.py` — array algebra, QC-flag handling,
  * identifier hashing. All pure `functions._` compositions (codegen'd,
  * no UDFs).
  */
object ArrayFns {

  /** Harmonic sum of scores: Σ score_i / i² / Σ 1/i² over the
    * descending-sorted scores.
    * reference: src/gentropy/common/spark_helpers.py:853-888 */
  def harmonicSum(scores: Column): Column = {
    val sorted = sort_array(scores, asc = false)
    val n = size(scores)
    val maxTheoretical = aggregate(
      sequence(lit(1), n),
      lit(0.0),
      (acc, i) => acc + lit(1.0) / pow(i.cast("double"), 2.0))
    aggregate(
      arrays_zip(sorted.as("score"), sequence(lit(1), n).as("pos")),
      lit(0.0),
      (acc, x) =>
        acc + x.getField("score") / pow(x.getField("pos").cast("double"), 2.0)) / maxTheoretical
  }

  /** Null-safe append of a QC flag when `condition` holds; initialises
    * the array when null. reference: src/gentropy/dataset/dataset.py:323-341 */
  def updateQualityFlag(qc: Column, condition: Column, flag: String): Column =
    when(condition,
      array_union(coalesce(qc, array().cast(ArrayType(StringType))), array(lit(flag))))
      .otherwise(coalesce(qc, array().cast(ArrayType(StringType))))

  /** Keep rows whose QC array contains none of the given flags.
    * reference: src/gentropy/dataset/dataset.py:204-250 */
  def validRows(qc: Column, flags: Seq[String]): Column =
    !arrays_overlap(coalesce(qc, array().cast(ArrayType(StringType))),
      array(flags.map(lit): _*))

  /** Deterministic identifier: md5 of null-safe concatenated columns.
    * reference: src/gentropy/dataset/dataset.py:359-375 */
  def generateIdentifier(cols: Seq[Column]): Column =
    md5(concat(cols.map(c => coalesce(c.cast(StringType), lit(""))): _*))

  /** Null out empty arrays. reference: src/gentropy/common/spark_helpers.py:137-157 */
  def nullifyEmptyArray(c: Column): Column =
    when(size(c) > 0, c)

  /** Union of two nullable arrays where either side may be null.
    * reference: src/gentropy/common/spark_helpers.py:618-708 */
  def safeArrayUnion(a: Column, b: Column): Column =
    when(a.isNotNull && b.isNotNull, array_union(a, b))
      .when(a.isNotNull, a)
      .otherwise(b)

  /** Sort an array of structs by one of its fields, descending with
    * nulls last. reference: src/gentropy/common/spark_helpers.py:354-448 */
  def sortArrayOfStructsDesc(arr: Column, field: String): Column =
    array_sort(arr, (l, r) => {
      val lf = l.getField(field)
      val rf = r.getField(field)
      when(lf.isNull && rf.isNull, 0)
        .when(lf.isNull, 1)
        .when(rf.isNull, -1)
        .when(lf < rf, 1)
        .when(lf > rf, -1)
        .otherwise(0)
    })

  /** Map values through a literal dictionary.
    * reference: src/gentropy/common/spark_helpers.py:451-482 */
  def mapColumnByDictionary(c: Column, dict: Map[String, String]): Column = {
    val kvs = dict.flatMap { case (k, v) => Seq(lit(k), lit(v)) }.toSeq
    element_at(map(kvs: _*), c)
  }

  /** Extract chromosome / position from a "{chrom}_{pos}_{ref}_{alt}"
    * variant id. reference: src/gentropy/common/utils.py:320-373 */
  def extractChromosome(variantId: Column): Column =
    regexp_extract(variantId, "^(.*)_(\\d+)_([ACGT]+)_([ACGT]+)$", 1)

  def extractPosition(variantId: Column): Column =
    regexp_extract(variantId, "^(.*)_(\\d+)_([ACGT]+)_([ACGT]+)$", 2).cast("int")

  /** Normalise free text for matching: lowercase, strip non-alphanumerics.
    * reference: src/gentropy/common/spark_helpers.py:891-914 */
  def cleanStringsFromSymbols(c: Column): Column =
    regexp_replace(lower(c), "[^a-z0-9]", "_")
}
