package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GnomAD / Pan-UKBB LD ingestion, Hail-free (S12/S13 ingestion path).
  *
  * The reference reads Hail BlockMatrix + Table pairs and resolves
  * matrix indices to variants (reference:
  * src/gentropy/datasource/gnomad/ld.py:25-553,
  * src/gentropy/datasource/pan_ukbb_ld/ld.py:1-214). This port takes
  * the same data as plain DataFrames — the `(i, j, r)` entry triangle
  * and the `(contig, position, alleles, idx)` index export — so any
  * parquet/CSV dump of the public matrices feeds the same pipeline:
  * entry filter → index liftover → id resolution → mirror →
  * per-population aggregation, ending in either the reference's ldSet
  * shape or the engine's long per-locus format consumed by
  * [[graft.finemap.DistributedFineMapper]].
  *
  * Scale shape: the entry triangle is the big side (10⁹+ rows at
  * min_r2=0.5 genome-wide); every step keeps it in (i, j) or
  * variant-keyed shuffles, the index LUT is broadcast, and nothing
  * ever materialises a dense matrix outside a per-locus executor task.
  *
  * One-time export recipe for users holding raw Hail-format LD (run
  * wherever Hail is installed; public Hail API only). A complete,
  * banded/prefiltered version of this recipe ships as
  * `tools/hail_export_ld.py` (sparsify_band before entries() — the
  * full 14M×14M GnomAD triangle is ~1e14 cells without it):
  * {{{
  *   import hail as hl
  *   hl.init()
  *   # entry triangle: (i, j, entry=r)
  *   bm = hl.linalg.BlockMatrix.read("gs://.../matrix.bm")
  *   et = bm.entries()                          # Table<i, j, entry>
  *   et = et.filter(et.entry ** 2 >= 0.25)      # optional r2 prefilter
  *   et.to_spark().write.parquet(".../entries.parquet")
  *   # variant index: (contig, position, alleles, idx)
  *   ht = hl.read_table("gs://.../index.ht").add_index("idx")
  *   ht.select(contig=ht.locus.contig, position=ht.locus.position,
  *             alleles=ht.alleles, idx=ht.idx) \
  *     .to_spark().write.parquet(".../index.parquet")
  * }}}
  * The two parquet outputs feed [[filterEntries]] /
  * [[processVariantIndices]] unchanged.
  */
object GnomadLd {

  /** Keep entries with |r| ≥ √minR2.
    * reference: src/gentropy/datasource/gnomad/ld.py:102-121 */
  def filterEntries(entries: DataFrame, minR2: Double): DataFrame =
    entries.filter(abs(col("r")) >= math.sqrt(minR2))

  /** Index export → (chromosome, position, variantId, idx) LUT in
    * GRCh38, dropping variants with ambiguous liftover (several
    * indices for one id).
    * reference: src/gentropy/datasource/gnomad/ld.py:158-199 */
  def processVariantIndices(ldIndexRaw: DataFrame,
                            lift: DataFrame => DataFrame = identity): DataFrame = {
    val lifted = lift(ldIndexRaw
      .select(
        regexp_replace(col("contig"), "chr", "").as("chromosome"),
        col("position"), col("alleles"), col("idx")))
    lifted
      .filter(col("position").isNotNull)
      .select(col("chromosome"), col("position"),
        concat_ws("_", col("chromosome"), col("position"),
          col("alleles").getItem(0), col("alleles").getItem(1))
          .as("variantId"),
        col("idx"))
      .withColumn("_n", count(lit(1)).over(Window.partitionBy("variantId")))
      .filter(col("_n") === 1)
      .drop("_n")
  }

  /** Resolve i/j matrix indices to variant ids. No broadcast hint: a
    * genome-wide GnomAD index LUT holds ~10⁷ variants per population —
    * too large to ship to every executor; the int-keyed shuffle joins
    * sort-merge cleanly against the entry triangle, and AQE will still
    * broadcast per-chromosome slices that fit.
    * reference: src/gentropy/datasource/gnomad/ld.py:201-222 */
  def resolveVariantIndices(ldIndex: DataFrame, ldMatrix: DataFrame): DataFrame = {
    val i = ldIndex.select(col("idx").as("i"),
      col("variantId").as("variantIdI"), col("chromosome"))
    val j = ldIndex.select(col("idx").as("j"),
      col("variantId").as("variantIdJ"))
    ldMatrix.join(i, Seq("i"), "inner").join(j, Seq("j"), "inner")
      .drop("i", "j")
  }

  /** Mirror the triangular matrix into a full square (diagonal kept
    * once). reference: src/gentropy/datasource/gnomad/ld.py:224-263 */
  def transposeLdMatrix(ldMatrix: DataFrame): DataFrame = {
    val mirrored = ldMatrix.select(
      col("variantIdJ").as("variantIdI"), col("variantIdI").as("variantIdJ"),
      col("r"), col("chromosome"), col("population"))
    ldMatrix.filter(col("variantIdI") =!= col("variantIdJ"))
      .select("variantIdI", "variantIdJ", "r", "chromosome", "population")
      .unionByName(mirrored)
  }

  /** Two-level aggregation into the reference's ldSet shape: per
    * (variant, tag) collect (population, r), then per variant collect
    * the tag structs. reference: src/gentropy/datasource/gnomad/ld.py:56-100 */
  def aggregateLdIndexAcrossPopulations(unaggregated: DataFrame): DataFrame =
    unaggregated
      .groupBy("chromosome", "variantId", "tagVariantId")
      .agg(collect_set(struct(col("population"), col("r"))).as("rValues"))
      .groupBy("variantId", "chromosome")
      .agg(collect_set(struct(col("tagVariantId"), col("rValues"))).as("ldSet"))

  /** Full per-population ingestion: entries + index per population →
    * aggregated LDIndex.
    * reference: src/gentropy/datasource/gnomad/ld.py:122-156, 264-310 */
  def asLdIndex(populations: Seq[(String, DataFrame, DataFrame)],
                minR2: Double = 0.5,
                lift: DataFrame => DataFrame = identity): DataFrame = {
    val perPop = populations.map { case (popId, entries, indexRaw) =>
      val index = processVariantIndices(indexRaw, lift)
      resolveVariantIndices(index, filterEntries(entries, minR2))
        .withColumn("population", lit(popId))
    }
    val mirrored = transposeLdMatrix(perPop.reduce(_ unionByName _))
    aggregateLdIndexAcrossPopulations(
      mirrored.select(col("variantIdI").as("variantId"),
        col("variantIdJ").as("tagVariantId"), col("r"),
        col("chromosome"), col("population")))
  }

  /** Square per-variant LD → the engine's long per-locus format
    * `(locusId, i, j, r)` with indices assigned by variantId order —
    * the exact contract of
    * [[graft.finemap.DistributedFineMapper.finemapAll]]. One shuffle
    * on variantId for each matrix side, one on locusId downstream. */
  def longFormatForLoci(loci: DataFrame, square: DataFrame): DataFrame = {
    val idxed = loci.select(col("locusId"), col("variantId"))
      .withColumn("idx",
        (row_number().over(
          Window.partitionBy("locusId").orderBy("variantId")) - 1).cast("int"))
    val a = idxed.select(col("locusId"), col("variantId").as("variantIdI"),
      col("idx").as("i"))
    val b = idxed.select(col("locusId"), col("variantId").as("variantIdJ"),
      col("idx").as("j"))
    square
      .join(a, Seq("variantIdI"))
      .join(b, Seq("locusId", "variantIdJ"))
      .select("locusId", "i", "j", "r")
  }
}
