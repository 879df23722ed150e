package graft.finemap

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Executor-parallel fine-mapping: loci fine-map inside `mapGroups`,
  * replacing the reference's per-locus driver loop
  * (reference: src/gentropy/susie_finemapper.py:461-691, which moves
  * each locus to the driver via `toPandas` and runs NumPy there).
  *
  * Input grain: one row per (locusId, variantId) with a z-score, plus
  * long-format LD `(locusId, i, j, r)` — the Hail-free LD
  * representation recommended in SURVEY §7. Both sides shuffle once on
  * locusId; each group materialises its dense LD block only inside the
  * executor task, bounded by the locus size.
  */
object DistributedFineMapper {

  case class LocusVariant(locusId: String, variantId: String,
                          z: Option[Double], idx: Int)
  case class LdEntry(locusId: String, i: Int, j: Int, r: Double)
  case class FineMapped(locusId: String, variantId: String, pip: Double,
    logBF: Double, inCredibleSet: Boolean)

  /** Fine-map every locus. `variants` must carry locusId, variantId, z
    * (idx assigned here); `ld` is long-format (locusId, i, j, r) over
    * those indices.
    *
    * With `runCarma`, each locus first runs the CARMA outlier scan and
    * LD-discordant variants are dropped from z and the LD block before
    * SuSiE — the reference's CARMA→SuSiE chain
    * (reference: src/gentropy/susie_finemapper.py:546-611), executed
    * per-locus on the executors instead of the driver.
    *
    * With `imputeMissing`, variants carrying a NULL z but present in
    * the locus' LD block are RAISS-imputed from the observed set and
    * admitted when `imputationR2 ≥ imputedR2Threshold` and
    * `ldScore ≥ ldScoreThreshold` — the reference's
    * run_sumstat_imputation branch (susie_finemapper.py:566-608).
    * Without the flag, NULL-z variants are dropped. */
  def finemapAll(spark: SparkSession, variants: DataFrame, ld: DataFrame,
                 n: Int = 100000, L: Int = 10,
                 coverage: Double = 0.99,
                 runCarma: Boolean = false,
                 carmaTimeLimitSec: Double = 600,
                 carmaTau: Double = 0.04,
                 imputeMissing: Boolean = false,
                 imputedR2Threshold: Double = 0.9,
                 ldScoreThreshold: Double = 5.0): Dataset[FineMapped] = {
    import spark.implicits._

    val indexed = variants
      .withColumn("idx",
        (row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("locusId").orderBy("variantId")) - 1).cast("int"))
      .select(col("locusId").cast("string"), col("variantId").cast("string"),
        col("z").cast("double"), col("idx"))
      .as[LocusVariant]

    val ldTyped = ld.select(col("locusId").cast("string"),
      col("i").cast("int"), col("j").cast("int"), col("r").cast("double"))
      .as[LdEntry]

    // one shuffle each on locusId; groups co-locate
    val grouped = indexed.groupByKey(_.locusId)
    val ldGrouped = ldTyped.groupByKey(_.locusId)

    grouped
      .cogroup(ldGrouped) { (locusId, vs, ldEntries) =>
        val variantsArr0 = vs.toArray.sortBy(_.idx)
        val p0 = variantsArr0.length
        if (p0 == 0) Iterator.empty
        else {
          val ldM0 = DenseMatrix.eye[Double](p0)
          ldEntries.foreach { e =>
            if (e.i < p0 && e.j < p0) { ldM0(e.i, e.j) = e.r; ldM0(e.j, e.i) = e.r }
          }
          def subLd(keep: Array[Int]): DenseMatrix[Double] =
            DenseMatrix.tabulate[Double](keep.length, keep.length) {
              (a, b) => ldM0(keep(a), keep(b))
            }
          // observed variants only; NULL-z rows are imputation candidates
          var knownIdx = variantsArr0.indices.filter(variantsArr0(_).z.isDefined)
            .toArray
          // CARMA pre-step on the observed set: drop LD-discordant
          // outliers, as the reference does before imputation and SuSiE
          // (outlier rows leave the output — susie_finemapper.py:546-560)
          if (runCarma && knownIdx.nonEmpty) {
            val out = Carma.timeLimitedCarmaSpikeSlabNoEM(
              DenseVector(knownIdx.map(variantsArr0(_).z.get)),
              subLd(knownIdx),
              secThreshold = carmaTimeLimitSec, tau = carmaTau)
            out.outliers match {
              case Some(outliers) if outliers.nonEmpty =>
                knownIdx = knownIdx.indices.filterNot(outliers.contains)
                  .map(knownIdx(_)).toArray
              case _ =>
            }
          }
          // RAISS imputation of NULL-z variants from the observed set
          // (susie_finemapper.py:566-608)
          val unknownIdx = variantsArr0.indices
            .filterNot(i => variantsArr0(i).z.isDefined).toArray
          val (finalIdx, zArr) =
            if (!imputeMissing || unknownIdx.isEmpty || knownIdx.isEmpty)
              (knownIdx, knownIdx.map(variantsArr0(_).z.get))
            else {
              val sigT = subLd(knownIdx)
              val sigIT = DenseMatrix.tabulate[Double](
                unknownIdx.length, knownIdx.length) {
                (a, b) => ldM0(unknownIdx(a), knownIdx(b))
              }
              val imp = Raiss.raissModel(
                DenseVector(knownIdx.map(variantsArr0(_).z.get)), sigT, sigIT)
              val accepted = unknownIdx.indices.filter { k =>
                imp.imputationR2(k) >= imputedR2Threshold &&
                  imp.ldScore(k) >= ldScoreThreshold
              }
              (knownIdx ++ accepted.map(unknownIdx(_)),
                knownIdx.map(variantsArr0(_).z.get) ++
                  accepted.map(k => imp.mu(k)).toArray)
            }
          if (finalIdx.isEmpty) Iterator.empty
          else {
            val variantsArr = finalIdx.map(variantsArr0(_))
            val ldM = subLd(finalIdx)
            val z = DenseVector(zArr)
            val res = SusieInf.susieInf(z, ldM, n = n, L = L)
            val marginal = SusieInf.marginalPip(res)
            val cred = SusieInf.credInf(res.pip, ldM, coverage = coverage)
            val inCs = cred.flatten.toSet
            variantsArr.iterator.zipWithIndex.map { case (v0, i) =>
              FineMapped(locusId, v0.variantId, marginal(i),
                res.lbfVariable(i, ::).t.toArray.max, inCs.contains(i))
            }
          }
        }
      }
  }
}
