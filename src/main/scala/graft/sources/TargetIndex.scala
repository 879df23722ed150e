package graft.sources

import graft.core.GDataset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gene (target) index nested-struct row — the analytics-relevant core
  * of the reference's target index schema
  * (reference: assets/schemas/target_index.json; the reference's extra
  * annotation payloads — GO terms, tractability, safety — are not
  * consumed by any operator and are tolerated as extra columns by the
  * permissive readers below).
  */
case class GeneLocation(
  chromosome: Option[String],
  start: Option[Long],
  end: Option[Long],
  strand: Option[Int])

case class CanonicalTranscript(
  id: Option[String],
  chromosome: Option[String],
  start: Option[Long],
  end: Option[Long],
  strand: Option[String])

case class ObsoleteSymbol(label: Option[String], source: Option[String])

case class TargetIndexRow(
  id: String,
  approvedSymbol: Option[String],
  biotype: Option[String],
  approvedName: Option[String],
  transcriptIds: Option[Seq[String]],
  canonicalTranscript: Option[CanonicalTranscript],
  genomicLocation: Option[GeneLocation],
  obsoleteSymbols: Option[Seq[ObsoleteSymbol]],
  tss: Option[Long])

/** Typed gene index + the lookup-table projections every consumer
  * (interval sources, L2G feature factory) joins against — a
  * first-class dataset instead of ad-hoc gene frames.
  *
  * reference: src/gentropy/dataset/target_index.py:18-97
  *
  * Scale design: the index is a dimension table (~60k genes); every
  * LUT is meant to sit on the broadcast side of its consumer's join,
  * which the consumers already do (`broadcast(genes...)`).
  */
object TargetIndex {

  /** Typed parquet reader (schema-projected + validated). */
  def fromParquet(spark: SparkSession, path: String): GDataset[TargetIndexRow] =
    GDataset.fromParquet[TargetIndexRow](spark, path)

  /** Wrap a foreign frame, verifying the core schema. */
  def apply(df: DataFrame): GDataset[TargetIndexRow] = {
    val core = df.select(GDataset.schemaOf[TargetIndexRow]
      .fieldNames.map(col).toIndexedSeq: _*)
    GDataset[TargetIndexRow](core).validated
  }

  /** Keep approved biotypes only.
    * reference: src/gentropy/dataset/target_index.py:33-43 */
  def filterByBiotypes(genes: GDataset[TargetIndexRow],
                       biotypes: Seq[String]): GDataset[TargetIndexRow] =
    GDataset[TargetIndexRow](genes.df.filter(col("biotype").isin(biotypes: _*)))

  /** Gene location LUT: (geneId, chromosome, start, end, strand, tss).
    * reference: src/gentropy/dataset/target_index.py:45-58 */
  def locationsLut(genes: GDataset[TargetIndexRow]): DataFrame =
    genes.df.select(
      col("id").as("geneId"),
      col("genomicLocation.chromosome").as("chromosome"),
      col("genomicLocation.start").as("start"),
      col("genomicLocation.end").as("end"),
      col("genomicLocation.strand").as("strand"),
      col("tss"))

  /** Symbol LUT including obsoleted symbols: (geneSymbol, geneId,
    * chromosome, tss). Deviation: the reference's bare
    * `array_union(array(approvedSymbol), obsoleteSymbols.label)` nulls
    * out (and explode drops) genes whose obsoleteSymbols is null; the
    * coalesce keeps their approved symbol instead.
    * reference: src/gentropy/dataset/target_index.py:60-77 */
  def symbolsLut(genes: GDataset[TargetIndexRow]): DataFrame =
    genes.df.select(
      explode(array_union(
        array(col("approvedSymbol")),
        coalesce(col("obsoleteSymbols.label"),
          array().cast("array<string>")))).as("geneSymbol"),
      col("id").as("geneId"),
      col("genomicLocation.chromosome").as("chromosome"),
      col("tss"))

  /** Flattened gene dimension for the L2G feature factory:
    * (id, biotype, chromosome, tss). */
  def geneLut(genes: GDataset[TargetIndexRow]): DataFrame =
    genes.df.select(
      col("id"), col("biotype"),
      col("genomicLocation.chromosome").as("chromosome"),
      col("tss"))
}
