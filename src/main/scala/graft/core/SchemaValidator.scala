package graft.core

import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Recursive schema validation: observed vs expected StructType with
  * typed error buckets, mirroring the reference's
  * `compare_struct_schemas` (reference:
  * src/gentropy/common/schemas.py:57-212). Mandatory = nullable=false
  * in the expected schema; extra observed columns are tolerated only
  * when declared.
  */
object SchemaValidator {

  sealed trait Issue { def path: String }
  case class DuplicatedColumn(path: String) extends Issue
  case class MissingMandatoryColumn(path: String) extends Issue
  case class UnexpectedColumn(path: String) extends Issue
  case class TypeMismatch(path: String, expected: String, observed: String)
      extends Issue

  /** All issues found comparing `observed` against `expected`. */
  def compare(expected: StructType, observed: StructType,
              prefix: String = ""): Seq[Issue] = {
    val issues = scala.collection.mutable.ArrayBuffer.empty[Issue]

    val dupes = observed.fieldNames.groupBy(identity).filter(_._2.length > 1).keys
    dupes.foreach(d => issues += DuplicatedColumn(s"$prefix$d"))

    val expectedByName = expected.fields.map(f => f.name -> f).toMap
    val observedByName = observed.fields.map(f => f.name -> f).toMap

    expected.fields.foreach { ef =>
      if (!observedByName.contains(ef.name) && !ef.nullable)
        issues += MissingMandatoryColumn(s"$prefix${ef.name}")
    }
    observed.fields.foreach { of =>
      expectedByName.get(of.name) match {
        case None => issues += UnexpectedColumn(s"$prefix${of.name}")
        case Some(ef) =>
          issues ++= compareTypes(ef.dataType, of.dataType, s"$prefix${of.name}")
      }
    }
    issues.toSeq
  }

  private def compareTypes(expected: DataType, observed: DataType,
                           path: String): Seq[Issue] =
    (expected, observed) match {
      case (e: StructType, o: StructType) => compare(e, o, s"$path.")
      case (ArrayType(e, _), ArrayType(o, _)) =>
        compareTypes(e, o, s"$path[]")
      case (e, o) if e.typeName == o.typeName => Seq.empty
      case (e, o) => Seq(TypeMismatch(path, e.simpleString, o.simpleString))
    }

  /** Throw with a readable report when the observed schema deviates. */
  def validate(expected: StructType, observed: StructType): Unit = {
    val issues = compare(expected, observed)
    if (issues.nonEmpty) {
      val report = issues.map {
        case DuplicatedColumn(p) => s"  duplicated column: $p"
        case MissingMandatoryColumn(p) => s"  missing mandatory column: $p"
        case UnexpectedColumn(p) => s"  unexpected column: $p"
        case TypeMismatch(p, e, o) => s"  type mismatch at $p: expected $e, got $o"
      }.mkString("\n")
      throw new IllegalArgumentException(s"Schema validation failed:\n$report")
    }
  }
}
