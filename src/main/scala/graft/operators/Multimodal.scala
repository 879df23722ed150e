package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads with typed
  * metadata, and executor-side decode / feature-extraction hooks.
  *
  * The decode kernels are STUBS — deterministic fakes standing in for
  * image/audio codecs that are not present in this environment. What
  * is real (and tested) is the Spark-side contract a 100 TB multimodal
  * pipeline needs: binary + struct schema, `mapPartitions` batch shape
  * over typed rows (one decoder init per partition, not per row),
  * partition-count independence, and columnar metadata pruning (the
  * scan never touches `payload` unless a kernel needs the bytes).
  */
object Multimodal {

  case class BlobRow(id: Long, payload: Array[Byte], kind: String, nBytes: Long)
  case class DecodedRow(id: Long, kind: String, width: Int, height: Int,
    channels: Int, checksum: Long)

  /** Wrap a text table as a blob table: payload = utf-8 bytes +
    * metadata struct. In production this is the parquet shape images/
    * audio land in (payload binary, metadata struct). */
  def toBlobTable(df: DataFrame, idCol: String, textCol: String,
                  kind: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit(kind).as("kind"),
      length(encode(col(textCol), "UTF-8")).cast("long").as("nBytes"))

  /** STUB decode: a real implementation would call an image codec per
    * batch; this fake derives deterministic dimensions from the
    * payload hash so the plumbing (partitioning, encoder round-trip,
    * one-init-per-partition) is exercised end-to-end. */
  def decode(spark: SparkSession, blobs: DataFrame): Dataset[DecodedRow] = {
    import spark.implicits._
    blobs.as[BlobRow].mapPartitions { rows =>
      // one "codec" init per partition — the shape that matters at scale
      val codecSeed = 0x5DEECE66DL
      rows.map { r =>
        var h = codecSeed
        var i = 0
        while (i < r.payload.length) { h = h * 31 + r.payload(i); i += 1 }
        DecodedRow(r.id, r.kind,
          width = 64 + math.floorMod(h, 960).toInt,
          height = 64 + math.floorMod(h >> 10, 960).toInt,
          channels = 3,
          checksum = h)
      }
    }
  }

  /** Deterministic frame-sampling plan for (fake) video blobs: every
    * `stride`-th frame index up to `maxFrames`, as a column expression
    * — no decode required to plan the sampling. */
  def frameSamplePlan(nFrames: org.apache.spark.sql.Column, stride: Int,
                      maxFrames: Int): org.apache.spark.sql.Column =
    slice(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)), 1, maxFrames)

  case class FrameRow(id: Long, frameIdx: Int, width: Int, height: Int,
    checksum: Long)

  /** STUB frame sampler for video-kind blobs: the frame count comes
    * deterministically from the payload size (stand-in for reading the
    * container header), every `stride`-th frame up to `maxFrames` is
    * "decoded" to dimensions + a checksum mixed from the payload fold
    * and the frame index. The Spark shape is the real contract: one
    * codec init per partition, frames FLAT-MAPPED off the row iterator
    * (never a per-blob frame buffer — a long video must stream), and
    * output rows independent of input partitioning. */
  def sampleFrames(spark: SparkSession, blobs: DataFrame, stride: Int = 2,
                   maxFrames: Int = 4): Dataset[FrameRow] = {
    import spark.implicits._
    blobs.as[BlobRow].mapPartitions { rows =>
      val codecSeed = 0x5DEECE66DL // one "codec" init per partition
      rows.flatMap { r =>
        var h = codecSeed
        var i = 0
        while (i < r.payload.length) { h = h * 31 + r.payload(i); i += 1 }
        val base = h
        val nFrames = 1 + math.floorMod(r.nBytes, 16L).toInt
        Iterator.range(0, nFrames, stride).take(maxFrames).map { f =>
          val fh = base * 31 + f
          FrameRow(r.id, f,
            width = 64 + math.floorMod(fh, 960).toInt,
            height = 64 + math.floorMod(fh >> 10, 960).toInt,
            checksum = fh)
        }
      }
    }
  }

  /** STUB resize plan over decoded rows: the target dimensions fitting
    * `maxDim` with aspect preserved (never upscaled), half-up rounded,
    * floored at 1px. The real pixel resample is the per-partition
    * codec call the decode stub stands in for; the planning/metadata
    * side — what Spark owns — is exact and columnar. */
  def resize(decoded: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, "resize needs maxDim > 0")
    val w = col("width").cast("double")
    val h = col("height").cast("double")
    val scale = least(lit(1.0), lit(maxDim.toDouble) / greatest(w, h))
    decoded
      .withColumn("outWidth",
        greatest(lit(1L), floor(w * scale + 0.5).cast("long")))
      .withColumn("outHeight",
        greatest(lit(1L), floor(h * scale + 0.5).cast("long")))
      .withColumn("resizeScale", scale)
  }

  /** Feature extraction over decoded rows: aspect ratio + megapixels,
    * pure column math post-decode. */
  def features(decoded: DataFrame): DataFrame =
    decoded
      .withColumn("aspectRatio", round(col("width").cast("double") / col("height"), 4))
      .withColumn("megapixels",
        round(col("width").cast("double") * col("height") / 1e6, 4))
}
