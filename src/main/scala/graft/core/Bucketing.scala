package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers for co-located joins.
  *
  * At 100 TB the same join keys recur across the pipeline (studyLocusId
  * for credible-set consumers, tagVariantId for overlap machinery,
  * doc_id for dedup survivors): paying one bucketed write turns every
  * downstream equi-join/groupBy on those keys into a zero-exchange
  * plan — both sides arrive hash-partitioned and sorted on disk, so
  * SortMergeJoin runs without shuffling either input (asserted by
  * plan audit). Spark buckets only materialise through the catalog
  * (`saveAsTable`), not plain `parquet(path)` writes — hence table
  * names here, not paths.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet
    * table. Choose `numBuckets` so one bucket ≈ one comfortable task
    * (128–512 MB); both sides of a co-located join must agree on
    * (bucketCols, numBuckets). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit = {
    require(bucketCols.nonEmpty, "bucketCols must be non-empty")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata rides in the
    * catalog, so joins on the bucket keys skip their exchange). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
