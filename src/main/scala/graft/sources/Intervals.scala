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
}
