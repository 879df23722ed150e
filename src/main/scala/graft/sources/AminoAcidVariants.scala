package graft.sources

import graft.functions.ArrayFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Amino-acid-level variant consequences: FoldX ΔΔG ingestion, curated
  * loss-of-function verdicts, effect-score normalisation and the
  * variant-index enrichment join.
  *
  * Mirrors the reference
  * (reference: src/gentropy/dataset/amino_acid_variants.py:16-26,
  * src/gentropy/datasource/open_targets/foldex_integration.py:14-103,
  * src/gentropy/datasource/open_targets/lof_curation.py:17-98,
  * src/gentropy/dataset/variant_index.py:287-340, 367-575). The
  * variantEffect struct shape matches [[VepParser]]'s predictors:
  * (method, assessment, score, assessmentFlag, targetId
  * [, normalisedScore]).
  */
object AminoAcidVariants {

  /** FoldX ΔΔG → [0,1]: |ΔΔG| ≥ 2 kcal/mol saturates at 1.
    * reference: src/gentropy/dataset/variant_index.py:465-485 */
  def normaliseFoldx(score: Column): Column =
    when(abs(score) >= 2, lit(1.0)).otherwise(abs(score) / 2.0)

  /** Ordinal LoF verdicts → [−1,1].
    * reference: src/gentropy/dataset/variant_index.py:546-573 */
  def normaliseLof(assessment: Column): Column =
    when(assessment === "lof", 1.0)
      .when(assessment === "likely_lof", 0.5)
      .when(assessment === "uncertain", 0.0)
      .when(assessment === "likely_not_lof", -0.5)
      .when(assessment === "not_lof", -1.0)

  /** Append `normalisedScore` to every effect struct, resolved by
    * method. reference: src/gentropy/dataset/variant_index.py:379-438 */
  def normaliseVariantEffect(effects: Column): Column =
    transform(effects, e =>
      e.withField("normalisedScore",
        when(e.getField("method") === "FoldX",
          normaliseFoldx(e.getField("score")))
          .when(e.getField("method") === "LossOfFunctionCuration",
            normaliseLof(e.getField("assessment")))
          .cast("double")))

  private def effectStruct(method: String, assessment: Column,
                           score: Column): Column =
    struct(lit(method).as("method"), assessment.as("assessment"),
      score.cast("float").as("score"),
      lit(null).cast("string").as("assessmentFlag"),
      lit(null).cast("string").as("targetId"))

  /** FoldX dataset → amino-acid variants. Residues below the pLDDT
    * confidence threshold are dropped, as are proteins where one
    * structural position maps to several sequence positions (ambiguous
    * by construction).
    * reference: src/gentropy/datasource/open_targets/foldex_integration.py:37-81 */
  def ingestFoldx(foldx: DataFrame, plddtThreshold: Double = 0.7): DataFrame = {
    val ambiguous = foldx
      .groupBy("protein_acc", "position", "wild_type")
      .agg(countDistinct(col("plddt")).as("_n"))
      .filter(col("_n") > 1)
      .select("protein_acc")
      .distinct()
    foldx
      .filter(col("plddt") > plddtThreshold)
      .join(ambiguous, Seq("protein_acc"), "left_anti")
      .select(
        col("protein_acc").as("uniprotAccession"),
        concat(col("wild_type"), col("position"), col("mutated_type"))
          .as("aminoAcidChange"),
        effectStruct("FoldX", lit(null).cast("string"), col("foldx_ddg"))
          .as("_effect"))
      .groupBy("uniprotAccession", "aminoAcidChange")
      .agg(collect_set(col("_effect")).as("variantEffect"))
      .withColumn("variantEffect", normaliseVariantEffect(col("variantEffect")))
  }

  /** Curated LoF verdicts → variant-index rows. chr/pos come from the
    * GRCh38 id, ref/alt from the GRCh37 id (some variants do not lift
    * over cleanly).
    * reference: src/gentropy/datasource/open_targets/lof_curation.py:62-98 */
  def lofCurationAsVariantIndex(lof: DataFrame): DataFrame = {
    val csvSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "chr string, pos string, ref string, alt string")
    val opts = Map("sep" -> "-")
    val description = concat(
      when(col("Verdict") === "lof", "Assessed to cause LoF")
        .when(col("Verdict") === "likely_lof", "Suspected to cause LoF")
        .when(col("Verdict") === "uncertain", "Uncertain LoF assessment")
        .when(col("Verdict") === "likely_not_lof", "Suspected not to cause LoF")
        .when(col("Verdict") === "not_lof", "Assessed not to cause LoF"),
      lit(" by OTAR2075 variant curation effort."))
    lof
      .select(
        from_csv(col("Variant ID GRCh37"), csvSchema, opts).as("h37"),
        from_csv(col("Variant ID GRCh38"), csvSchema, opts).as("h38"),
        col("Verdict"))
      .select(
        concat_ws("_", col("h38.chr"), col("h38.pos"), col("h37.ref"),
          col("h37.alt")).as("variantId"),
        col("h38.chr").as("chromosome"),
        col("h38.pos").cast("int").as("position"),
        col("h37.ref").as("referenceAllele"),
        col("h37.alt").as("alternateAllele"),
        array(effectStruct("LossOfFunctionCuration", col("Verdict"),
          lit(null).cast("float"))).as("variantEffect"),
        description.as("variantDescription"))
      .withColumn("variantEffect", normaliseVariantEffect(col("variantEffect")))
  }

  /** Enrich a variant index with amino-acid-level predictions: extract
    * (uniprotAccession, aminoAcidChange) from the transcript
    * consequences, left-join the annotation, union the effect arrays
    * and keep the best-annotated row per variant.
    * reference: src/gentropy/dataset/variant_index.py:287-340 */
  def annotateWithAminoAcidConsequences(variantIndex: DataFrame,
                                        annotation: DataFrame): DataFrame = {
    val aaTc = get(filter(col("transcriptConsequences"),
      tc => tc.getField("aminoAcidChange").isNotNull), lit(0))
    val w = Window.partitionBy("variantId")
      .orderBy(size(col("variantEffect")).desc)
    variantIndex
      .withColumn("aminoAcidChange", aaTc.getField("aminoAcidChange"))
      .withColumn("uniprotAccession",
        explode_outer(aaTc.getField("uniprotAccessions")))
      .join(annotation.withColumnRenamed("variantEffect", "_annotations"),
        Seq("uniprotAccession", "aminoAcidChange"), "left")
      .withColumn("variantEffect",
        when(col("_annotations").isNotNull,
          ArrayFns.safeArrayUnion(col("variantEffect"), col("_annotations")))
          .otherwise(col("variantEffect")))
      .drop("uniprotAccession", "aminoAcidChange", "_annotations")
      .distinct()
      .withColumn("_rank", row_number().over(w))
      .filter(col("_rank") === 1)
      .drop("_rank")
  }
}
