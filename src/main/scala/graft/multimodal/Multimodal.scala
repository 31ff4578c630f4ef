package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns + typed
  * metadata, processed in partition-sized batches.
  *
  * The real decode (image/audio libs) is STUBBED — `decodeStub` derives
  * deterministic fake features from the bytes — but the Spark-side shape is
  * real: schema, batch iteration (`mapPartitions`, the JVM analog of
  * `mapInPandas` batches), and the partitioning story. At 100 TB the rule is
  * that the binary payload is scanned once, never shuffled: features are
  * extracted map-side and only the (id, features) projection moves on.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte], n_bytes: Long)
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      header_be32: Long, checksum: Long, feat: Array[Float])

  /** Synthesize an opaque media column from the documents table (16-byte
    * md5-derived payload standing in for real image/audio bytes).
    */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      unhex(md5(col("text"))).as("payload"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))

  /** The "decode" stage: batch-iterate records per partition, emit features.
    * ??? in a real deployment this calls the codec; here it derives
    * deterministic pseudo-features so the pipeline is testable end-to-end.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val bytes = r.payload
        val header = bytes.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
        val checksum = bytes.foldLeft(1469598103934665603L)((h, b) => (h ^ (b & 0xffL)) * 1099511628211L)
        val feat = Array.tabulate(8) { i =>
          val v = bytes((i * 2) % bytes.length) & 0xff
          (v.toFloat / 255.0f)
        }
        MediaFeatures(r.doc_id, r.media_type, r.n_bytes, header, checksum, feat)
      }
    }
  }

  /** Feature post-processing back in DataFrame land: per-type stats over the
    * extracted features (what a training-data curation job aggregates).
    */
  def featureStats(features: Dataset[MediaFeatures]): DataFrame =
    features.toDF()
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("header_be32")).as("min_header"),
        max(col("header_be32")).as("max_header"))

  case class ResizedMedia(doc_id: Long, media_type: String, n_bytes: Long,
      thumb: Array[Byte], thumb_bytes: Long)

  /** The "resize" stage (image → thumbnail): same per-partition batch slot as
    * [[decodeStub]]; the stub resamples every other byte to a fixed-size
    * payload where a real codec would decode-scale-reencode. Map-side only —
    * the original payload never shuffles, and the projection that moves on is
    * the (smaller) thumbnail.
    */
  def resizeStub(spark: SparkSession, media: DataFrame, outBytes: Int = 8): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.map { r =>
        val thumb = Array.tabulate(outBytes)(i => r.payload((i * 2) % r.payload.length))
        ResizedMedia(r.doc_id, r.media_type, r.n_bytes, thumb, thumb.length.toLong)
      }
    }
  }

  case class FrameRecord(doc_id: Long, frame_no: Int, frame_payload: Array[Byte],
      frame_checksum: Long)

  /** The frame-sampling stage (video → k frames): one media row flatMaps into
    * k frame rows inside the partition batch — the fan-out happens map-side
    * with no shuffle, so at 100 TB frame extraction is scan-bound. The stub
    * slices the payload per frame where a real demuxer would seek keyframes.
    */
  def frameSampleStub(spark: SparkSession, media: DataFrame, frames: Int = 4): Dataset[FrameRecord] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { batch =>
      batch.filter(_.media_type == "video").flatMap { r =>
        (0 until frames).iterator.map { f =>
          val start = (f * r.payload.length) / frames
          val end = ((f + 1) * r.payload.length) / frames
          val payload = r.payload.slice(start, end)
          val checksum = payload.foldLeft(1469598103934665603L)(
            (h, b) => (h ^ (b & 0xffL)) * 1099511628211L)
          FrameRecord(r.doc_id, f, payload, checksum)
        }
      }
    }
  }
}
