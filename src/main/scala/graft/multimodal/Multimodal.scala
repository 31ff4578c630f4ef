package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns + typed
  * metadata, processed in partition-sized batches.
  *
  * The IMAGE path is real: [[imageTable]] encodes actual PNGs, and
  * [[decodeImage]]/[[resizeImage]] run javax.imageio (decode → half-scale →
  * re-encode). The audio/video decode (`decodeStub`) remains STUBBED — those
  * codecs aren't in the JDK — with deterministic fake features, but the
  * Spark-side shape is real everywhere: schema, batch iteration
  * (`mapPartitions`, the JVM analog of `mapInPandas` batches), and the
  * partitioning story. At 100 TB the rule is that the binary payload is
  * scanned once, never shuffled: features are extracted map-side and only
  * the (id, features) projection moves on.
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

  // ---- real image codec path (mm1/mm3) ------------------------------------
  // javax.imageio is in the JDK, so the image pipeline needs no stub: the
  // fixture synthesizes REAL PNG payloads (encode), and decode/resize run the
  // actual codec. Scale story unchanged: encoding exists only to build the
  // fixture column; decode and resize are map-side batch stages — the binary
  // payload is scanned once and never shuffled.

  case class ImageRecord(doc_id: Long, payload: Array[Byte], n_bytes: Long)
  case class DecodedImage(doc_id: Long, width: Int, height: Int, channels: Int, n_bytes: Long)
  case class ImageThumb(doc_id: Long, width: Int, height: Int,
      thumb_width: Int, thumb_height: Int, thumb: Array[Byte], thumb_bytes: Long)

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic real-PNG fixture column: one (8 + id%16) × (8 + id%12)
    * RGB image per document, pixels a pure function of (id, x, y) — so an
    * external oracle can predict the decoded dimensions without a codec.
    */
  def imageTable(spark: SparkSession, docs: DataFrame): Dataset[ImageRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = 8 + (id % 16).toInt
        val h = 8 + (id % 12).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((id * 31 + x * 7 + y * 13) & 0xff).toInt
            img.setRGB(x, y, (v << 16) | (((v * 3) & 0xff) << 8) | ((v * 7) & 0xff))
            x += 1
          }
          y += 1
        }
        val bytes = pngBytes(img)
        ImageRecord(id, bytes, bytes.length.toLong)
      }
    }
  }

  /** mm1, honestly: ImageIO-decode each PNG payload in partition batches and
    * emit (dimensions, channels, size) — the metadata a curation pipeline
    * filters on before paying for pixel-level work.
    */
  def decodeImage(spark: SparkSession, images: Dataset[ImageRecord]): Dataset[DecodedImage] = {
    import spark.implicits._
    images.mapPartitions { batch =>
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        DecodedImage(r.doc_id, img.getWidth, img.getHeight,
          img.getColorModel.getNumComponents, r.n_bytes)
      }
    }
  }

  /** mm3, honestly: decode → scale to half dimensions (Graphics2D bilinear)
    * → re-encode PNG, map-side. The thumbnail (smaller payload) is what moves
    * downstream; the original never shuffles.
    */
  def resizeImage(spark: SparkSession, images: Dataset[ImageRecord]): Dataset[ImageThumb] = {
    import spark.implicits._
    images.mapPartitions { batch =>
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        val (w, h) = (img.getWidth, img.getHeight)
        val (tw, th) = (math.max(w / 2, 1), math.max(h / 2, 1))
        val thumb = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = thumb.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        val bytes = pngBytes(thumb)
        ImageThumb(r.doc_id, w, h, tw, th, bytes, bytes.length.toLong)
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
