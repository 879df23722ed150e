package graft.sources

import graft.operators.VariantOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ensembl VEP JSON output → VariantIndex parser.
  *
  * Covers the reference parser's core extractor family
  * (reference: src/gentropy/datasource/ensembl/vep_parser.py:57-830):
  * VCF-style `input` location parsing, rsID / xref extraction from
  * colocated variants, most-severe-transcript selection by score,
  * amino-acid change, UniProt accession collection, max AlphaMissense,
  * transcript-consequence assembly, OTVAR hashing of long alleles.
  * All higher-order column expressions — no UDFs.
  */
object VepParser {

  /** Subset of the VEP JSON schema the parser consumes. */
  val vepSchema: StructType = StructType(Seq(
    StructField("input", StringType),
    StructField("most_severe_consequence", StringType),
    StructField("colocated_variants", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("var_synonyms", StructType(Seq(
        StructField("OMIM", ArrayType(StringType)),
        StructField("ClinVar", ArrayType(StringType))))))))),
    StructField("transcript_consequences", ArrayType(StructType(Seq(
      StructField("gene_id", StringType),
      StructField("transcript_id", StringType),
      StructField("canonical", IntegerType),
      StructField("consequence_terms", ArrayType(StringType)),
      StructField("distance", LongType),
      StructField("amino_acids", StringType),
      StructField("protein_end", IntegerType),
      StructField("swissprot", ArrayType(StringType)),
      StructField("trembl", ArrayType(StringType)),
      StructField("alphamissense", StructType(Seq(
        StructField("am_pathogenicity", DoubleType),
        StructField("am_class", StringType))))))))))

  /** chrom/pos/ref/alt from the VCF-ish `input` line ("chrom pos id ref alt ..."). */
  def parseVariantLocation(input: Column): Seq[Column] = {
    val parts = split(input, "\\t")
    Seq(
      regexp_replace(parts.getItem(0), "chr", "").as("chromosome"),
      parts.getItem(1).cast("int").as("position"),
      parts.getItem(3).as("referenceAllele"),
      parts.getItem(4).as("alternateAllele"))
  }

  /** rsIDs of all colocated variants. */
  def colocatedRsIds(colocated: Column): Column =
    when(colocated.isNotNull,
      filter(transform(colocated, v => v.getField("id")), id => id.isNotNull))
      .otherwise(array().cast("array<string>"))

  /** dbXref structs from an id array + fixed source label. */
  def dbXrefs(ids: Column, source: String): Column = {
    val x = transform(ids, id =>
      struct(id.as("id"), lit(source).as("source")))
    when(x.isNull, array().cast("array<struct<id:string,source:string>>"))
      .otherwise(x)
  }

  /** OMIM xrefs nested inside colocated variants' var_synonyms. */
  def omimXrefs(colocated: Column): Column =
    flatten(transform(
      filter(colocated,
        v => v.getField("var_synonyms").getField("OMIM").isNotNull),
      v => dbXrefs(transform(v.getField("var_synonyms").getField("OMIM"),
        o => o.cast("string")), "omim")))

  /** Most severe transcript: among those with a non-null score field,
    * the maximum by that field.
    * reference: src/gentropy/datasource/ensembl/vep_parser.py:298-346 */
  def mostSevereTranscript(transcripts: Column, scoreField: String): Column = {
    val scored = filter(transcripts, t => t.getField(scoreField).isNotNull)
    sort_array(scored, asc = false) // struct sort: first field must be score
  }

  /** Amino-acid change "A123T" from amino_acids "A/T" + protein_end. */
  def aminoAcidChange(aminoAcids: Column, proteinEnd: Column): Column =
    when(aminoAcids.isNotNull && proteinEnd.isNotNull &&
      size(split(aminoAcids, "/")) === 2,
      concat(split(aminoAcids, "/").getItem(0), proteinEnd,
        split(aminoAcids, "/").getItem(1)))

  /** UniProt accessions from swissprot+trembl (version suffix stripped). */
  def uniprotAccessions(trembl: Column, swissprot: Column): Column =
    transform(
      array_union(coalesce(swissprot, array().cast("array<string>")),
        coalesce(trembl, array().cast("array<string>"))),
      acc => regexp_replace(acc, "\\.\\d+$", ""))

  /** Max AlphaMissense pathogenicity across transcripts. */
  def maxAlphaMissense(transcripts: Column): Column = {
    val am = filter(transcripts, t => t.getField("alphamissense").isNotNull)
    when(size(am) > 0, struct(
      lit("AlphaMissense").as("method"),
      array_max(transform(am,
        t => t.getField("alphamissense").getField("am_pathogenicity")))
        .as("score")))
  }

  /** Full VEP output → VariantIndex-shaped rows. */
  def processVepOutput(spark: SparkSession, path: String,
                       hashThreshold: Int = 100): DataFrame = {
    val raw = spark.read.schema(vepSchema).json(path)
    parseVepDataFrame(raw, hashThreshold)
  }

  def parseVepDataFrame(raw: DataFrame, hashThreshold: Int = 100): DataFrame =
    raw
      .select(
        parseVariantLocation(col("input")) ++ Seq(
          col("most_severe_consequence").as("mostSevereConsequence"),
          colocatedRsIds(col("colocated_variants")).as("rsIds"),
          when(col("colocated_variants").isNotNull,
            omimXrefs(col("colocated_variants")))
            .otherwise(array().cast(
              "array<struct<id:string,source:string>>")).as("dbXrefs"),
          when(col("transcript_consequences").isNotNull,
            transform(col("transcript_consequences"), t => struct(
              t.getField("gene_id").as("targetId"),
              t.getField("transcript_id").as("transcriptId"),
              (t.getField("canonical") === 1).as("isEnsemblCanonical"),
              t.getField("consequence_terms").as("variantConsequenceIds"),
              t.getField("distance").as("distanceFromTss"),
              aminoAcidChange(t.getField("amino_acids"),
                t.getField("protein_end")).as("aminoAcidChange"),
              uniprotAccessions(t.getField("trembl"), t.getField("swissprot"))
                .as("uniprotAccessions"))))
            .as("transcriptConsequences"),
          maxAlphaMissense(col("transcript_consequences")).as("alphaMissense")): _*)
      .withColumn("variantId",
        VariantOps.hashLongVariantIds(
          concat_ws("_", col("chromosome"), col("position"),
            col("referenceAllele"), col("alternateAllele")),
          col("chromosome"), col("position"), hashThreshold))
      .filter(col("chromosome").isNotNull && col("position").isNotNull)
}
