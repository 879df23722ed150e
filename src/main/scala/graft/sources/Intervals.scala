package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Genomic interval→gene sources (S11). Each raw format parses to the
  * common Intervals shape `(chromosome, start, end, geneId,
  * resourceScore, datasourceId, datatypeId)`, optionally lifted over
  * and joined to the gene index.
  *
  * reference: src/gentropy/datasource/intervals/{andersson,jung,thurman}.py
  */
object Intervals {

  /** Andersson 2014 enhancer-TSS associations: TSV whose `name` field
    * embeds "chrom:start-end,score;gene" style composite values.
    * reference: src/gentropy/datasource/intervals/andersson.py:24-140 */
  def andersson(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .option("comment", "#")
      .csv(path)
      // drop malformed names BEFORE casting (ANSI mode would throw)
      .filter(col("name").rlike("^[^:]+:\\d+-\\d+"))
      .select(
        regexp_extract(col("name"), "^([^:]+):(\\d+)-(\\d+)", 1)
          .as("chromosomeRaw"),
        regexp_extract(col("name"), "^([^:]+):(\\d+)-(\\d+)", 2).cast("int")
          .as("start"),
        regexp_extract(col("name"), "^([^:]+):(\\d+)-(\\d+)", 3).cast("int")
          .as("end"),
        regexp_extract(col("name"), ";(\\S+)$", 1).as("geneSymbol"),
        col("score").cast("double").as("resourceScore"))
      .withColumn("chromosome", regexp_replace(col("chromosomeRaw"), "chr", ""))
      .drop("chromosomeRaw")
      .filter(col("start").isNotNull && col("end").isNotNull)
      .withColumn("datasourceId", lit("andersson2014"))
      .withColumn("datatypeId", lit("interval"))

  /** BED-style 4+ column interval file (Jung/Thurman shape): region
    * plus a gene column. reference: src/gentropy/datasource/intervals/
    * jung.py, thurman.py */
  def bedWithGene(spark: SparkSession, path: String, datasource: String,
                  geneCol: Int = 3, scoreCol: Option[Int] = None): DataFrame = {
    val raw = spark.read.option("sep", "\t").csv(path)
    val base = raw.select(
      regexp_replace(col("_c0"), "chr", "").as("chromosome"),
      col("_c1").cast("int").as("start"),
      col("_c2").cast("int").as("end"),
      col(s"_c$geneCol").as("geneSymbol"),
      scoreCol.map(i => col(s"_c$i").cast("double")).getOrElse(lit(null))
        .cast("double").as("resourceScore"))
    base
      .filter(col("start").isNotNull && col("end").isNotNull)
      .withColumn("datasourceId", lit(datasource))
      .withColumn("datatypeId", lit("interval"))
  }

  /** Resolve gene symbols against a gene index (broadcast dim join)
    * and emit the canonical Intervals shape. */
  def resolveGenes(intervals: DataFrame, genes: DataFrame): DataFrame =
    intervals
      .join(broadcast(genes.select(col("geneSymbol"), col("geneId"))),
        Seq("geneSymbol"), "inner")
      .drop("geneSymbol")

  /** Typed-index entry point, mirroring the reference's `parse(raw,
    * target_index, lift)` signature (reference:
    * src/gentropy/datasource/intervals/andersson.py:49-61). */
  def resolveGenes(intervals: DataFrame,
                   genes: graft.core.GDataset[TargetIndexRow]): DataFrame =
    resolveGenes(intervals, TargetIndex.symbolsLut(genes))

  /** A liftover transform: (df, chromCol, startCol, endCol) → lifted
    * df with the same column names. Compose from
    * [[Liftover.liftIntervals]], or pass [[noLift]] for same-build data. */
  type IntervalLift = (DataFrame, String, String, String) => DataFrame

  val noLift: IntervalLift = (df, _, _, _) => df

  private val canonicalChromosomes =
    (1 to 22).map(_.toString) ++ Seq("X", "Y", "MT")

  /** Javierre et al. 2016 promoter-capture Hi-C: the `name` column
    * packs the second interval as "chr:start-end,score"; both interval
    * sets lift over, genes attach to the FIRST interval by overlap
    * (location LUT range join), rows keep only genes whose TSS is
    * within 2.45 Mb of the interval midpoint, and each
    * (interval2, gene, bioFeature) keeps its best score.
    * `genes` carries (geneId, chromosome, start, end, tss).
    * reference: src/gentropy/datasource/intervals/javierre.py:34-171 */
  def javierre(raw: DataFrame, genes: DataFrame,
               lift: IntervalLift = noLift,
               twosidedThreshold: Double = 2.45e6): DataFrame = {
    val parsed = raw
      .withColumn("name_split", split(col("name"), ":|-|,"))
      .withColumn("name_chr",
        regexp_replace(col("name_split").getItem(0), "chr", ""))
      // malformed tokens must not reach the ANSI cast
      .filter(col("name_split").getItem(1).rlike("^\\d+$") &&
        col("name_split").getItem(2).rlike("^\\d+$"))
      .withColumn("name_start", col("name_split").getItem(1).cast("int"))
      .withColumn("name_end", col("name_split").getItem(2).cast("int"))
      .withColumn("name_score",
        when(get(col("name_split"), lit(3)).rlike("^\\d+(\\.\\d+)?$"),
          get(col("name_split"), lit(3))).cast("float"))
      .withColumn("chrom", regexp_replace(col("chrom"), "chr", ""))
      .drop("name_split", "name")
      .filter(col("name_score").isNotNull &&
        col("chrom") === col("name_chr") &&
        col("name_chr").isin(canonicalChromosomes: _*))
    val remapped = lift(lift(parsed, "chrom", "start", "end"),
      "name_chr", "name_start", "name_end")
    val uniqueWithGenes = remapped
      .select(col("chrom"), col("start").cast("int").as("start"),
        col("end").cast("int").as("end"))
      .distinct()
      .join(broadcast(genes.select(col("geneId"), col("tss"),
        col("chromosome").as("g_chrom"), col("start").as("g_start"),
        col("end").as("g_end"))),
        col("chrom") === col("g_chrom") &&
          (col("start").between(col("g_start"), col("g_end")) ||
            col("end").between(col("g_start"), col("g_end"))),
        "left")
      .select("chrom", "start", "end", "geneId", "tss")
    remapped
      .join(uniqueWithGenes, Seq("chrom", "start", "end"), "left")
      .filter(abs((col("start") + col("end")) / 2 - col("tss")) <=
        twosidedThreshold)
      .groupBy("name_chr", "name_start", "name_end", "geneId", "bio_feature")
      .agg(max(col("name_score")).as("resourceScore"))
      .select(
        col("name_chr").as("chromosome"),
        col("name_start").as("start"),
        col("name_end").as("end"),
        col("resourceScore").cast("double").as("resourceScore"),
        col("geneId"),
        col("bio_feature").as("biofeature"),
        lit("javierre2016").as("datasourceId"),
        lit("pchic").as("datatypeId"),
        lit("27863249").as("pmid"))
  }

  /** Typed-index entry point for [[javierre]] (location LUT join).
    * reference: src/gentropy/datasource/intervals/javierre.py:34-50 */
  def javierre(raw: DataFrame, genes: graft.core.GDataset[TargetIndexRow],
               lift: IntervalLift): DataFrame =
    javierre(raw, TargetIndex.locationsLut(genes), lift)

  /** Jung et al. 2019 promoter-capture Hi-C: `Interacting_fragment` is
    * "chr.start.end" dot-separated, `Promoter` a ';'-joined gene list.
    * `genes` carries (geneId, geneSymbol, chromosome).
    * reference: src/gentropy/datasource/intervals/jung.py:35-103 */
  def jung(raw: DataFrame, genes: DataFrame,
           lift: IntervalLift = noLift): DataFrame = {
    val parsed = raw
      .withColumn("interval", split(col("Interacting_fragment"), "\\."))
      .filter(col("interval").getItem(1).rlike("^\\d+$") &&
        col("interval").getItem(2).rlike("^\\d+$"))
      .select(
        regexp_replace(col("interval").getItem(0), "chr", "").as("chrom"),
        col("interval").getItem(1).cast("int").as("start"),
        col("interval").getItem(2).cast("int").as("end"),
        col("Promoter").as("gene_name"),
        col("Tissue_type").as("tissue"))
    lift(parsed, "chrom", "start", "end")
      .select(col("chrom"), col("start"), col("end"),
        explode(split(col("gene_name"), ";")).as("geneSymbol"),
        col("tissue"))
      .join(broadcast(genes.select(col("geneId"), col("geneSymbol"),
        col("chromosome"))), Seq("geneSymbol"), "inner")
      .select(
        col("chromosome"),
        col("start"), col("end"), col("geneId"),
        col("tissue").as("biofeature"),
        lit(1.0).as("score"),
        lit("jung2019").as("datasourceId"),
        lit("pchic").as("datatypeId"),
        lit("31501517").as("pmid"))
      .dropDuplicates()
  }

  /** Typed-index entry point for [[jung]] (symbol LUT join).
    * reference: src/gentropy/datasource/intervals/jung.py:35-50 */
  def jung(raw: DataFrame, genes: graft.core.GDataset[TargetIndexRow],
           lift: IntervalLift): DataFrame =
    jung(raw, TargetIndex.symbolsLut(genes), lift)

  /** Thurman et al. 2012 DHS-promoter correlation: 8-column headerless
    * TSV (gene location + interval + score); gene symbols resolve
    * against the symbol LUT on (symbol, chromosome).
    * reference: src/gentropy/datasource/intervals/thurman.py:30-104 */
  def thurman(raw: DataFrame, genes: DataFrame,
              lift: IntervalLift = noLift): DataFrame = {
    val parsed = raw.select(
      regexp_replace(col("chrom"), "chr", "").as("chrom"),
      col("start"), col("end"), col("gene_name"), col("score"))
    lift(parsed, "chrom", "start", "end")
      .join(broadcast(genes.select(col("geneId"),
        col("geneSymbol"), col("chromosome").as("g_chrom"))),
        col("gene_name") === col("geneSymbol") &&
          col("chrom") === col("g_chrom"), "inner")
      .select(
        col("chrom").as("chromosome"),
        col("start"), col("end"), col("geneId"),
        col("score").cast("double").as("resourceScore"),
        lit("thurman2012").as("datasourceId"),
        lit("dhscor").as("datatypeId"),
        lit("22955617").as("pmid"))
      .distinct()
  }

  /** Typed-index entry point for [[thurman]] (symbol LUT join).
    * reference: src/gentropy/datasource/intervals/thurman.py:30-45 */
  def thurman(raw: DataFrame, genes: graft.core.GDataset[TargetIndexRow],
              lift: IntervalLift): DataFrame =
    thurman(raw, TargetIndex.symbolsLut(genes), lift)

  /** Reader for the raw Thurman TSV. */
  def readThurman(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t")
      .schema("gene_chr string, gene_start int, gene_end int, " +
        "gene_name string, chrom string, start int, end int, score float")
      .csv(path)
}
