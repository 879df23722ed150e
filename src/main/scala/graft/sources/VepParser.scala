package graft.sources

import graft.operators.VariantOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ensembl VEP JSON output → VariantIndex parser.
  *
  * Full extractor family of the reference parser
  * (reference: src/gentropy/datasource/ensembl/vep_parser.py:57-1137):
  * VCF-style `input` location parsing, rsID / Ensembl / OMIM / ClinVar
  * / ProtVar cross-references, in-silico predictor extraction (CADD,
  * PolyPhen, SIFT, LOFTEE, GERP, AlphaMissense, VEP class) with
  * most-severe-transcript selection, SO-term + pathogenicity-score
  * mapping, amino-acid change, UniProt accession collection,
  * transcript-consequence assembly with severity ordering and index,
  * human-readable variant descriptions, effect-score normalisation and
  * OTVAR hashing of long alleles. All higher-order column
  * expressions — no UDFs, one projection pipeline per variant row.
  */
object VepParser {

  /** Consequence label → (SO identifier, pathogenicity score); the
    * published VEP consequence table
    * (reference: src/gentropy/config.py:469-529). */
  val ConsequenceTable: Seq[(String, String, Double)] = Seq(
    ("splice_donor_variant", "SO_0001575", 1.0),
    ("frameshift_variant", "SO_0001589", 1.0),
    ("splice_acceptor_variant", "SO_0001574", 1.0),
    ("stop_gained", "SO_0001587", 1.0),
    ("start_lost", "SO_0002012", 1.0),
    ("stop_lost", "SO_0001578", 1.0),
    ("transcript_ablation", "SO_0001893", 1.0),
    ("inframe_deletion", "SO_0001822", 0.66),
    ("protein_altering_variant", "SO_0001818", 0.66),
    ("inframe_insertion", "SO_0001821", 0.66),
    ("splice_donor_5th_base_variant", "SO_0001787", 0.66),
    ("missense_variant", "SO_0001583", 0.66),
    ("stop_retained_variant", "SO_0001567", 0.33),
    ("splice_region_variant", "SO_0001630", 0.33),
    ("start_retained_variant", "SO_0002019", 0.33),
    ("splice_polypyrimidine_tract_variant", "SO_0002169", 0.33),
    ("incomplete_terminal_codon_variant", "SO_0001626", 0.33),
    ("synonymous_variant", "SO_0001819", 0.33),
    ("splice_donor_region_variant", "SO_0002170", 0.33),
    ("3_prime_UTR_variant", "SO_0001624", 0.1),
    ("5_prime_UTR_variant", "SO_0001623", 0.1),
    ("intron_variant", "SO_0001627", 0.1),
    ("non_coding_transcript_variant", "SO_0001619", 0.0),
    ("coding_sequence_variant", "SO_0001580", 0.0),
    ("downstream_gene_variant", "SO_0001632", 0.0),
    ("upstream_gene_variant", "SO_0001631", 0.0),
    ("non_coding_transcript_exon_variant", "SO_0001792", 0.0),
    ("mature_miRNA_variant", "SO_0001620", 0.0),
    ("intergenic_variant", "SO_0001060", 0.0))

  private val soMap: Column =
    typedLit(ConsequenceTable.map(c => c._1 -> c._2).toMap)
  private val scoreMap: Column =
    typedLit(ConsequenceTable.map(c => c._1 -> c._3).toMap)

  /** SO identifier of a consequence label. */
  def soTermId(label: Column): Column = element_at(soMap, label)

  /** Pathogenicity score of a consequence label. */
  def consequenceScore(label: Column): Column = element_at(scoreMap, label)

  private val transcriptSchema = StructType(Seq(
    StructField("gene_id", StringType),
    StructField("gene_symbol", StringType),
    StructField("transcript_id", StringType),
    StructField("canonical", IntegerType),
    StructField("biotype", StringType),
    StructField("impact", StringType),
    StructField("consequence_terms", ArrayType(StringType)),
    StructField("distance", LongType),
    StructField("tssdistance", LongType),
    StructField("codons", StringType),
    StructField("amino_acids", StringType),
    StructField("protein_end", IntegerType),
    StructField("swissprot", ArrayType(StringType)),
    StructField("trembl", ArrayType(StringType)),
    StructField("hgvsg", StringType),
    StructField("appris", StringType),
    StructField("mane_select", StringType),
    StructField("cadd_phred", DoubleType),
    StructField("polyphen_score", DoubleType),
    StructField("polyphen_prediction", StringType),
    StructField("sift_score", DoubleType),
    StructField("sift_prediction", StringType),
    StructField("lof", StringType),
    StructField("lof_filter", StringType),
    StructField("conservation", DoubleType),
    StructField("alphamissense", StructType(Seq(
      StructField("am_pathogenicity", DoubleType),
      StructField("am_class", StringType))))))

  /** Subset of the VEP JSON schema the parser consumes. */
  val vepSchema: StructType = StructType(Seq(
    StructField("input", StringType),
    StructField("most_severe_consequence", StringType),
    StructField("colocated_variants", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("var_synonyms", StructType(Seq(
        StructField("OMIM", ArrayType(StringType)),
        StructField("ClinVar", ArrayType(StringType))))))))),
    StructField("transcript_consequences", ArrayType(transcriptSchema)),
    StructField("intergenic_consequences", ArrayType(transcriptSchema))))

  /** chrom/pos/ref/alt from the VCF-ish `input` line ("chrom pos id ref alt ..."). */
  def parseVariantLocation(input: Column): Seq[Column] = {
    val parts = split(input, "\\t")
    Seq(
      regexp_replace(parts.getItem(0), "chr", "").as("chromosome"),
      parts.getItem(1).cast("int").as("position"),
      parts.getItem(3).as("referenceAllele"),
      parts.getItem(4).as("alternateAllele"))
  }

  // --------------------------------------------------------- xrefs

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

  /** Ensembl variation xrefs for every colocated rsID.
    * reference: vep_parser.py:112-129 */
  def ensemblXrefs(colocated: Column): Column =
    dbXrefs(colocatedRsIds(colocated), "ensembl_variation")

  /** OMIM xrefs nested inside colocated variants' var_synonyms. */
  def omimXrefs(colocated: Column): Column =
    flatten(transform(
      filter(colocated,
        v => v.getField("var_synonyms").getField("OMIM").isNotNull),
      v => dbXrefs(transform(v.getField("var_synonyms").getField("OMIM"),
        o => o.cast("string")), "omim")))

  /** ClinVar xrefs: VCV-prefixed synonyms only.
    * reference: vep_parser.py:251-297 */
  def clinvarXrefs(colocated: Column): Column =
    dbXrefs(
      flatten(transform(
        filter(colocated,
          v => v.getField("var_synonyms").getField("ClinVar").isNotNull),
        v => filter(v.getField("var_synonyms").getField("ClinVar"),
          x => x.startsWith("VCV")))),
      "clinvar")

  // --------------------------------------- in-silico predictor family

  /** Most severe transcript: highest non-null `scoreField`, via an
    * array_sort comparator (works for numeric and string scores).
    * reference: vep_parser.py:298-346 */
  def mostSevereTranscriptBy(transcripts: Column, scoreField: String): Column = {
    val scored = filter(transcripts, t => t.getField(scoreField).isNotNull)
    val sorted = array_sort(scored, (l, r) =>
      when(l.getField(scoreField) > r.getField(scoreField), -1)
        .when(l.getField(scoreField) < r.getField(scoreField), 1)
        .otherwise(0))
    get(sorted, lit(0))
  }

  /** ANSI-safe float parse (the reference relies on lax casts). */
  private def tryCastFloat(c: Column): Column =
    when(c.cast("string").rlike("^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"),
      c.cast("string").cast("float"))

  /** Generic predictor extractor: the most severe transcript's score /
    * assessment / flag as a variantEffect struct.
    * reference: vep_parser.py:417-494 */
  def variantEffectExtractor(transcripts: Column, methodName: String,
                             scoreField: Option[String] = None,
                             assessmentField: Option[String] = None,
                             assessmentFlagField: Option[String] = None): Column = {
    val best = scoreField match {
      case Some(sf) => mostSevereTranscriptBy(transcripts, sf)
      case None =>
        get(filter(transcripts,
          t => t.getField(assessmentField.get).isNotNull), lit(0))
    }
    val assessment = assessmentField
      .map(f => best.getField(f).cast("string"))
      .getOrElse(lit(null).cast("string")).as("assessment")
    val score = scoreField
      .map(f => tryCastFloat(best.getField(f)))
      .getOrElse(lit(null).cast("float")).as("score")
    val flag = assessmentFlagField
      .map(f => best.getField(f).cast("string"))
      .getOrElse(lit(null).cast("string")).as("assessmentFlag")
    when(best.isNotNull, struct(
      lit(methodName).as("method"), assessment, score, flag,
      best.getField("gene_id").as("targetId")))
  }

  /** VEP class prediction from the most severe consequence label.
    * reference: vep_parser.py:348-357 */
  def vepPrediction(mostSevereConsequence: Column): Column =
    struct(
      lit("VEP").as("method"),
      mostSevereConsequence.as("assessment"),
      consequenceScore(mostSevereConsequence).cast("float").as("score"),
      lit(null).cast("string").as("assessmentFlag"),
      lit(null).cast("string").as("targetId"))

  /** Max AlphaMissense prediction across transcripts.
    * reference: vep_parser.py:359-415 */
  def maxAlphaMissense(transcripts: Column): Column = {
    val am = get(filter(transcripts,
      t => t.getField("alphamissense").isNotNull), lit(0))
    when(am.isNotNull, struct(
      lit("AlphaMissense").as("method"),
      am.getField("alphamissense").getField("am_class").as("assessment"),
      am.getField("alphamissense").getField("am_pathogenicity").cast("float")
        .as("score"),
      lit(null).cast("string").as("assessmentFlag"),
      am.getField("gene_id").as("targetId")))
  }

  // ------------------------------------------------- scalar helpers

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

  /** Sort an array of structs descending by one field, ascending by a
    * second, stably. reference: common/spark_helpers.py:380-420 */
  def orderStructsByTwoFields(arr: Column, descField: String,
                              ascField: String): Column =
    array_sort(arr, (l, r) =>
      when(l.getField(descField) > r.getField(descField), -1)
        .when(l.getField(descField) < r.getField(descField), 1)
        .when(l.getField(ascField) < r.getField(ascField), -1)
        .when(l.getField(ascField) > r.getField(ascField), 1)
        .otherwise(0))

  // --------------------------------------------- variant description

  /** "Intron variant", "Missense variant" … from the raw label.
    * reference: vep_parser.py:949-963 */
  def processConsequenceTerm(term: Column): Column = {
    val suffix = when(term.contains("variant"), lit("")).otherwise(lit(" variant"))
    concat(regexp_replace(initcap(term), "_", " "), suffix)
  }

  private def geneLabel(t: Column): Column =
    coalesce(t.getField("approvedSymbol"), t.getField("targetId"))

  /** " overlapping with GENE" / " N basepair away from GENE".
    * reference: vep_parser.py:964-992 */
  def processOverlap(t: Column): Column =
    when(t.getField("distanceFromFootprint") === 0,
      concat(lit(" overlapping with "), geneLabel(t)))
      .otherwise(concat(lit(" "),
        format_number(t.getField("distanceFromFootprint"), 0),
        lit(" basepair away from "), geneLabel(t)))

  /** ", causing amio-acid change: … with low impact." (sic, as the
    * reference spells it). reference: vep_parser.py:993-1012 */
  def processAaChange(t: Column): Column =
    when(t.getField("aminoAcidChange").isNotNull,
      concat(lit(", causing amio-acid change: "), t.getField("aminoAcidChange"),
        lit(" with "), lower(t.getField("impact")), lit(" impact.")))
      .otherwise(lit("."))

  /** LOFTEE high-confidence sentence. reference: vep_parser.py:1014-1028 */
  def processLof(t: Column): Column =
    when(t.getField("lofteePrediction").isNotNull &&
      t.getField("lofteePrediction") === "HC",
      lit(" A high-confidence loss-of-function variant by loftee."))
      .otherwise(lit(""))

  /** ", a <biotype> gene." reference: vep_parser.py:1060-1081 */
  def addingBiotype(t: Column): Column = {
    val b = when(t.getField("biotype").contains("gene"),
      regexp_replace(t.getField("biotype"), "_", " "))
      .otherwise(concat(regexp_replace(t.getField("biotype"), "_", " "),
        lit(" gene.")))
    concat(lit(", a "), b)
  }

  /** " The closest protein-coding gene is GENE (N basepair away)."
    * reference: vep_parser.py:1082-1107 */
  def parseProteinCodingTranscript(t: Column): Column =
    when(t.isNotNull,
      concat(lit(" The closest protein-coding gene is "), geneLabel(t),
        lit(" ("), format_number(t.getField("distanceFromFootprint"), 0),
        lit(" basepair away).")))
      .otherwise(lit(""))

  /** Human-readable description of the variant.
    * reference: vep_parser.py:911-948, 1030-1137 */
  def composeVariantDescription(mostSevereConsequence: Column,
                                firstTranscript: Column,
                                firstProteinCoding: Column): Column = {
    val consequenceText = processConsequenceTerm(mostSevereConsequence)
    when(firstTranscript.isNull, lit("Intergenic variant no gene in window"))
      .when(firstTranscript.getField("biotype") === "protein_coding",
        concat(consequenceText, processOverlap(firstTranscript),
          processAaChange(firstTranscript), processLof(firstTranscript)))
      .otherwise(
        concat(consequenceText, processOverlap(firstTranscript),
          addingBiotype(firstTranscript),
          parseProteinCodingTranscript(firstProteinCoding)))
  }

  // --------------------------------------------------- main pipeline

  private val xrefType = "array<struct<id:string,source:string>>"

  /** Full VEP output → VariantIndex-shaped rows. */
  def processVepOutput(spark: SparkSession, path: String,
                       hashThreshold: Int = 100): DataFrame = {
    val raw = spark.read.schema(vepSchema).json(path)
    parseVepDataFrame(raw, hashThreshold)
  }

  /** reference: vep_parser.py:604-830 */
  def parseVepDataFrame(raw: DataFrame, hashThreshold: Int = 100): DataFrame = {
    val transcriptEffects = filter(array(
      variantEffectExtractor(col("transcript_consequences"), "CADD",
        scoreField = Some("cadd_phred")),
      variantEffectExtractor(col("transcript_consequences"), "PolyPhen",
        scoreField = Some("polyphen_score"),
        assessmentField = Some("polyphen_prediction")),
      variantEffectExtractor(col("transcript_consequences"), "SIFT",
        scoreField = Some("sift_score"),
        assessmentField = Some("sift_prediction")),
      variantEffectExtractor(col("transcript_consequences"), "LOFTEE",
        scoreField = Some("lof"), assessmentField = Some("lof"),
        assessmentFlagField = Some("lof_filter")),
      variantEffectExtractor(col("transcript_consequences"), "GERP",
        scoreField = Some("conservation")),
      maxAlphaMissense(col("transcript_consequences")),
      vepPrediction(col("most_severe_consequence"))),
      p => p.isNotNull)
    val intergenicEffects = filter(array(
      variantEffectExtractor(col("intergenic_consequences"), "CADD",
        scoreField = Some("cadd_phred")),
      variantEffectExtractor(col("intergenic_consequences"), "GERP",
        scoreField = Some("conservation")),
      vepPrediction(col("most_severe_consequence"))),
      p => p.isNotNull)

    raw
      // canonical transcripts only, as the reference
      .withColumn("transcript_consequences",
        filter(col("transcript_consequences"),
          t => t.getField("canonical") === 1))
      .select(
        parseVariantLocation(col("input")) ++ Seq(
          ensemblXrefs(col("colocated_variants")).as("ensembl_xrefs"),
          when(col("colocated_variants").isNotNull,
            omimXrefs(col("colocated_variants")))
            .otherwise(array().cast(xrefType)).as("omim_xrefs"),
          when(col("colocated_variants").isNotNull,
            clinvarXrefs(col("colocated_variants")))
            .otherwise(array().cast(xrefType)).as("clinvar_xrefs"),
          when(col("transcript_consequences").isNotNull, transcriptEffects)
            .otherwise(intergenicEffects).as("variantEffect"),
          soTermId(col("most_severe_consequence"))
            .as("mostSevereConsequenceId"),
          col("most_severe_consequence").as("mostSevereConsequence"),
          when(size(col("transcript_consequences")) > 0,
            col("transcript_consequences").getItem(0).getField("hgvsg"))
            .when(size(col("intergenic_consequences")) > 0,
              col("intergenic_consequences").getItem(0).getField("hgvsg"))
            .otherwise(lit(null)).as("hgvsId"),
          when(col("transcript_consequences").isNotNull,
            transform(col("transcript_consequences"), t => struct(
              transform(t.getField("consequence_terms"),
                y => soTermId(y)).as("variantFunctionalConsequenceIds"),
              array_max(transform(t.getField("consequence_terms"),
                y => consequenceScore(y))).cast("float")
                .as("consequenceScore"),
              aminoAcidChange(t.getField("amino_acids"),
                t.getField("protein_end")).as("aminoAcidChange"),
              uniprotAccessions(t.getField("trembl"), t.getField("swissprot"))
                .as("uniprotAccessions"),
              (t.getField("canonical") === 1).as("isEnsemblCanonical"),
              t.getField("codons").as("codons"),
              coalesce(t.getField("distance"), lit(0L)).cast("long")
                .as("distanceFromFootprint"),
              t.getField("tssdistance").cast("long").as("distanceFromTss"),
              t.getField("appris").as("appris"),
              t.getField("mane_select").as("maneSelect"),
              t.getField("gene_id").as("targetId"),
              t.getField("impact").as("impact"),
              t.getField("lof").cast("string").as("lofteePrediction"),
              t.getField("sift_score").cast("float").as("siftPrediction"),
              t.getField("polyphen_score").cast("float")
                .as("polyphenPrediction"),
              t.getField("transcript_id").as("transcriptId"),
              t.getField("biotype").as("biotype"),
              t.getField("gene_symbol").as("approvedSymbol"))))
            .as("transcriptConsequences"),
          colocatedRsIds(col("colocated_variants")).as("rsIds"),
          array().cast(
            "array<struct<populationName:string,alleleFrequency:double>>")
            .as("alleleFrequencies")): _*)
      .withColumn("variantId",
        concat_ws("_", col("chromosome"), col("position"),
          col("referenceAllele"), col("alternateAllele")))
      // drop transcripts with no score or no footprint distance
      .withColumn("transcriptConsequences",
        filter(col("transcriptConsequences"),
          x => x.getField("consequenceScore").isNotNull &&
            x.getField("distanceFromFootprint").isNotNull))
      // severity order + 1-based index
      .withColumn("transcriptConsequences",
        when(col("transcriptConsequences").isNotNull,
          transform(
            orderStructsByTwoFields(col("transcriptConsequences"),
              "consequenceScore", "distanceFromFootprint"),
            (x, i) => x.withField("transcriptIndex", i + lit(1)))))
      // ProtVar xref for missense variants (pre-hash id, as reference)
      .withColumn("protvar_xrefs",
        when(size(filter(col("transcriptConsequences"),
          x => array_contains(x.getField("variantFunctionalConsequenceIds"),
            "SO_0001583"))) > 0,
          dbXrefs(array(col("variantId")), "protvar")))
      .withColumn("dbXrefs",
        flatten(filter(array(
          col("ensembl_xrefs"), col("omim_xrefs"), col("clinvar_xrefs"),
          col("protvar_xrefs")), x => x.isNotNull)))
      .withColumn("variantId",
        VariantOps.hashLongVariantIds(col("variantId"),
          col("chromosome"), col("position"), hashThreshold))
      .withColumn("variantDescription", {
        val first = get(filter(col("transcriptConsequences"),
          t => t.getField("transcriptIndex") === 1), lit(0))
        val firstCoding = get(array_sort(
          filter(col("transcriptConsequences"),
            t => t.getField("biotype") === "protein_coding"),
          (l, r) => when(l.getField("transcriptIndex") <
            r.getField("transcriptIndex"), -1)
            .when(l.getField("transcriptIndex") >
              r.getField("transcriptIndex"), 1).otherwise(0)), lit(0))
        composeVariantDescription(col("mostSevereConsequence"), first,
          firstCoding)
      })
      // normalised in-silico scores (F25)
      .withColumn("variantEffect",
        transform(col("variantEffect"), e => e.withField("normalisedScore",
          VariantOps.normalisedEffectScore(e.getField("method"),
            e.getField("score")))))
      .drop("ensembl_xrefs", "omim_xrefs", "clinvar_xrefs", "protvar_xrefs",
        "mostSevereConsequence")
      .filter(col("chromosome").isNotNull && col("position").isNotNull)
  }
}
