package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns + typed
  * metadata, processed in partition-sized batches.
  *
  * All three modalities run REAL codecs from the JDK:
  *  - image: [[imageTable]] encodes actual PNGs; [[decodeImage]] /
  *    [[resizeImage]] run javax.imageio (decode → half-scale → re-encode);
  *  - audio: [[audioTable]] writes genuine RIFF/WAV (PCM16 mono);
  *    [[decodeAudio]] parses it back through javax.sound.sampled and reads
  *    the PCM frames (peak amplitude proves the data chunk is really read);
  *  - video: [[videoTable]] packs per-frame PNGs into a length-prefixed
  *    container; [[frameSample]] demuxes the frame index and ImageIO-decodes
  *    only the sampled frames.
  *
  * Every fixture field is a closed-form function of doc_id, so external
  * DuckDB oracles can predict exactly what each codec must recover from the
  * bytes — a decode that doesn't really parse the payload cannot pass.
  *
  * At 100 TB the rule is that the binary payload is scanned once, never
  * shuffled: features are extracted map-side (`mapPartitions`, the JVM analog
  * of `mapInPandas` batches) and only the (id, features) projection moves on.
  */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache: every read/write spills
  // through a temp file, which at scale turns a CPU-bound decode into file
  // churn on the executor's tmp dir. All our payloads are in-memory byte
  // arrays, so force the heap cache (JVM-wide, set when the first partition
  // touches this object).
  javax.imageio.ImageIO.setUseCache(false)

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
    // The synthesis + every chained decode stage runs at THIS projection's
    // partitioning (opaque typed maps fuse into one stage); a single-row-
    // group parquet scan would serialize all of it onto 1-2 tasks (r19
    // profile of mm6: the whole codec stage on 2 cores). Stats-gated: a
    // no-op at real scale.
    graft.ops.Scan.spreadIfStarved(docs.select(col("doc_id"))).as[Long].mapPartitions { ids =>
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
        // ImageIO returns null (not an exception) for unparseable bytes —
        // name the offending doc instead of NPE-ing the whole partition
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
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
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
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

  case class ImageHash(doc_id: Long, ahash_hi: Long, ahash_lo: Long)

  /** mm5: perceptual average-hash (aHash — the classic pHash-family
    * baseline: downsample to an 8×8 grid, threshold each cell against the
    * global mean, pack 64 bits). Computed on the RED channel with EXACT
    * integer arithmetic: cell-vs-global mean comparison is cross-multiplied
    * (`bs·tc > ts·bc`), so no float rounding exists anywhere and the hash
    * is reproducible bit-for-bit — including by a SQL oracle replaying the
    * fixture's closed-form pixels without any codec. The 64 bits ship as
    * two unsigned 32-bit halves (`ahash_hi`/`ahash_lo`): bit 63 of a packed
    * BIGINT would flip its sign, which engines shift/aggregate differently.
    *
    * See [[imageAHash]] for the shuffle story; this is the per-image core
    * shared by [[imageAHash]] and [[frameAHash]]: 8×8 grid sums,
    * cross-multiplied cell-vs-global mean compare, 2×32-bit pack.
    */
  private def aHashOf(img: java.awt.image.BufferedImage): (Long, Long) = {
    val w = img.getWidth; val h = img.getHeight
    val bs = new Array[Long](64); val bc = new Array[Long](64)
    var ts = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val red = (img.getRGB(x, y) >> 16) & 0xff
        val b = (y * 8 / h) * 8 + (x * 8 / w)
        bs(b) += red; bc(b) += 1; ts += red
        x += 1
      }
      y += 1
    }
    val tc = w.toLong * h
    // Overflow bound (round-12 audit): bs(i) ≤ 255·bc(i) ≤ 255·tc and
    // ts ≤ 255·tc, so each cross-multiply is ≤ 255·tc² — inside a signed
    // long only while tc ≤ ~1.9e8 pixels (√(2⁶³/255)). Past that (≈190 MP
    // panorama/satellite frames) the products wrap silently and flip hash
    // bits, so the rare huge image takes the exact 128-bit compare instead
    // of a silent cap or a wrong hash; same result, just slower there.
    val wide = tc > 134217728L // 2²⁷ px, safely under the bound
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 64) {
      val gt =
        if (wide)
          java.math.BigInteger.valueOf(bs(i)).multiply(java.math.BigInteger.valueOf(tc))
            .compareTo(java.math.BigInteger.valueOf(ts)
              .multiply(java.math.BigInteger.valueOf(bc(i)))) > 0
        else bs(i) * tc > ts * bc(i)
      if (gt) {
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      }
      i += 1
    }
    (hi, lo)
  }

  /** Map-side like every codec stage: the payload is decoded where it is
    * read and only (doc_id, 2 longs) ever shuffles.
    */
  def imageAHash(spark: SparkSession, images: Dataset[ImageRecord]): Dataset[ImageHash] = {
    import spark.implicits._
    images.mapPartitions { batch =>
      batch.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        require(img != null, s"undecodable image payload for doc ${r.doc_id}")
        val (hi, lo) = aHashOf(img)
        ImageHash(r.doc_id, hi, lo)
      }
    }
  }

  // ---- real audio codec path (mm2) ----------------------------------------
  // RIFF/WAV PCM16 is both trivially writable (fixture) and parseable by the
  // JDK's javax.sound.sampled, so the audio pipeline needs no stub either.

  case class AudioRecord(doc_id: Long, payload: Array[Byte], n_bytes: Long)

  case class AudioFp(doc_id: Long, afp: Long)

  /** mm7: energy-envelope audio fingerprint — [[imageAHash]]'s role for
    * audio: the PCM stream decodes map-side (the REAL WAV parse mm2
    * ships), |amplitude| sums over `windows` equal sample windows, and
    * each window is thresholded against the global mean by the SAME exact
    * cross-multiplied integer rule as the image hash
    * (`win_sum · n_samples > total_sum · win_count` — no float anywhere),
    * packed into `windows` bits. Identical envelopes group; re-encoded or
    * re-chunked byte streams that decode to the same PCM still collide,
    * which is what makes this stronger than a payload-byte dd1.
    *
    * Overflow bounds (the round-12 audit rule): |sample| ≤ 32768, so
    * total_sum ≤ 32768·n and each cross-multiply ≤ 32768·n² — inside a
    * signed long to n ≈ 5·10⁸ samples (~9 h of 16 kHz mono audio per
    * clip); clips beyond that should chunk upstream. Only (doc_id, one
    * long) ever shuffles.
    */
  def audioFingerprint(spark: SparkSession, audio: Dataset[AudioRecord],
      windows: Int = 16): Dataset[AudioFp] = {
    import spark.implicits._
    require(windows > 0 && windows <= 64, s"windows must be in [1, 64], got $windows")
    audio.mapPartitions { batch =>
      batch.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = in.getFormat
        // The window/sample math below is written for 16-bit mono PCM
        // (n = bytes/2, getShort per sample). Any other layout would
        // silently fingerprint garbage, so refuse loudly instead —
        // the same stance as the index META check and the
        // heavy-hitter determinism gate.
        require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1,
          s"audioFingerprint requires 16-bit mono PCM; doc ${r.doc_id} decodes as " +
            s"${fmt.getSampleSizeInBits}-bit ${fmt.getChannels}-channel")
        val pcm = in.readAllBytes()
        in.close()
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        val n = pcm.length / 2
        val ws = new Array[Long](windows)
        val wc = new Array[Long](windows)
        var ts = 0L
        var i = 0
        while (i < n) {
          val v = math.abs(bb.getShort.toInt)
          val w = (i.toLong * windows / n).toInt
          ws(w) += v; wc(w) += 1; ts += v
          i += 1
        }
        var fp = 0L
        var j = 0
        while (j < windows) {
          if (ws(j) * n > ts * wc(j)) fp |= 1L << j
          j += 1
        }
        AudioFp(r.doc_id, fp)
      }
    }
  }
  case class DecodedAudio(doc_id: Long, sample_rate: Int, channels: Int,
      bits_per_sample: Int, n_samples: Long, duration_ms: Long, peak_abs: Int)

  /** One PCM16-mono WAV per doc: rate 8000 + (id%8)·1000 Hz, 256 + (id%128)·16
    * samples, a planted peak of 20000 + id%10000 at sample 0 (all other
    * samples bounded by ±8192) — every decoded field is a closed-form function
    * of doc_id, so the oracle can predict what the codec must recover.
    */
  private[graft] def wavBytes(id: Long): Array[Byte] = {
    val sampleRate = 8000 + (id % 8).toInt * 1000
    val n = 256 + (id % 128).toInt * 16
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate = rate * blockAlign
      .putShort(2).putShort(16) // blockAlign, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.putShort((20000 + (id % 10000)).toShort)
    var i = 1
    while (i < n) {
      bb.putShort((((id * 131 + i * 17) % 16384) - 8192).toShort)
      i += 1
    }
    bb.array()
  }

  def audioTable(spark: SparkSession, docs: DataFrame): Dataset[AudioRecord] = {
    import spark.implicits._
    // NO spread here, unlike imageTable/videoTable: WAV synthesis+decode is
    // light (~0.3 s serial for the whole bench corpus), and the r19 bench
    // measured the added exchange + task scheduling costing MORE than the
    // serial decode it relieves (mm2 0.49 -> 1.36 s, mm7 1.29 -> 2.90 s;
    // both recovered on revert). Image decode and video demux are heavy
    // enough to pay for the spread; audio is not.
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val bytes = wavBytes(id)
        AudioRecord(id, bytes, bytes.length.toLong)
      }
    }
  }

  /** mm2, honestly: parse each WAV through javax.sound.sampled in partition
    * batches — format fields from the header, then the PCM data chunk read in
    * full for the peak amplitude (so a header-only "decode" can't pass the
    * planted-peak oracle). Map-side; the payload never shuffles.
    */
  def decodeAudio(spark: SparkSession, audio: Dataset[AudioRecord]): Dataset[DecodedAudio] = {
    import spark.implicits._
    audio.mapPartitions { batch =>
      batch.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val fmt = in.getFormat
        val nFrames = in.getFrameLength
        val pcm = in.readAllBytes()
        in.close()
        val bb = java.nio.ByteBuffer.wrap(pcm).order(
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN)
        var peak = 0
        while (bb.remaining() >= 2) {
          val v = math.abs(bb.getShort.toInt)
          if (v > peak) peak = v
        }
        val rate = fmt.getSampleRate.toInt
        DecodedAudio(r.doc_id, rate, fmt.getChannels, fmt.getSampleSizeInBits,
          nFrames, nFrames * 1000L / rate, peak)
      }
    }
  }

  // ---- real video container path (mm4) ------------------------------------
  // There is no video codec in the JDK, but a container demux doesn't need
  // one: frames are individually-encoded PNGs packed behind a length-prefixed
  // index (the MJPEG idea). The demux walks real offsets and ImageIO-decodes
  // only the sampled frames — seek-and-decode, exactly the access pattern a
  // keyframe sampler has over a real container.

  case class VideoRecord(doc_id: Long, payload: Array[Byte], n_bytes: Long)
  case class VideoProbe(doc_id: Long, n_frames: Int, n_bytes: Long)
  case class SampledFrame(doc_id: Long, frame_no: Int, frame_index: Int,
      width: Int, height: Int)

  /** Container layout: "GFV1" | frameCount:int32BE | (len:int32BE | png)*.
    * 2 + id%5 frames per doc; frame f is a real PNG of
    * (4 + (id+f)%8) × (4 + (id+f)%6) — closed-form for the oracle.
    */
  private[graft] def videoBytes(id: Long): Array[Byte] = {
    val fc = 2 + (id % 5).toInt
    val frames = (0 until fc).map { f =>
      val w = 4 + ((id + f) % 8).toInt
      val h = 4 + ((id + f) % 6).toInt
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = ((id * 37 + f * 11 + x * 5 + y * 3) & 0xff).toInt
          img.setRGB(x, y, (v << 16) | (((v * 5) & 0xff) << 8) | ((v * 11) & 0xff))
          x += 1
        }
        y += 1
      }
      pngBytes(img)
    }
    val bb = java.nio.ByteBuffer.allocate(8 + frames.map(4 + _.length).sum)
    bb.put("GFV1".getBytes("US-ASCII")).putInt(fc)
    frames.foreach(f => bb.putInt(f.length).put(f))
    bb.array()
  }

  def videoTable(spark: SparkSession, docs: DataFrame): Dataset[VideoRecord] = {
    import spark.implicits._
    // spread before the opaque synthesis+decode chain — see imageTable
    graft.ops.Scan.spreadIfStarved(docs.select(col("doc_id"))).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val bytes = videoBytes(id)
        VideoRecord(id, bytes, bytes.length.toLong)
      }
    }
  }

  /** Header + index walk without pixel decode — what a curation filter runs
    * before paying for frame extraction. Validates the magic and that the
    * length-prefix walk lands exactly at end-of-payload.
    */
  def probeVideo(spark: SparkSession, videos: Dataset[VideoRecord]): Dataset[VideoProbe] = {
    import spark.implicits._
    videos.mapPartitions { batch =>
      batch.map { r =>
        val bb = wrapContainer(r)
        val fc = bb.getInt
        var i = 0
        while (i < fc) {
          val len = bb.getInt
          bb.position(bb.position() + len)
          i += 1
        }
        require(!bb.hasRemaining, s"container for doc ${r.doc_id} has trailing bytes")
        VideoProbe(r.doc_id, fc, r.n_bytes)
      }
    }
  }

  /** mm4, honestly: demux the frame index, pick min(k, n) evenly-spaced frame
    * indices (j·n/k), and ImageIO-decode only those — the map-side fan-out is
    * one row per sampled frame, no shuffle, and undecoded frames are never
    * touched beyond their length prefix.
    */
  def frameSample(spark: SparkSession, videos: Dataset[VideoRecord], k: Int = 4): Dataset[SampledFrame] = {
    import spark.implicits._
    videos.mapPartitions { batch =>
      batch.flatMap { r =>
        val bb = wrapContainer(r)
        val fc = bb.getInt
        val offsets = new Array[(Int, Int)](fc) // (start, len) per frame
        var i = 0
        while (i < fc) {
          val len = bb.getInt
          offsets(i) = (bb.position(), len)
          bb.position(bb.position() + len)
          i += 1
        }
        (0 until math.min(k, fc)).iterator.map { j =>
          val idx = if (fc <= k) j else (j * fc) / k
          val (start, len) = offsets(idx)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload, start, len))
          require(img != null, s"undecodable frame $idx for doc ${r.doc_id}")
          SampledFrame(r.doc_id, j, idx, img.getWidth, img.getHeight)
        }
      }
    }
  }

  case class FrameHash(doc_id: Long, frame_no: Int, frame_index: Int,
      ahash_hi: Long, ahash_lo: Long)

  /** mm6 building block: [[frameSample]]'s demux-and-seek plus the
    * [[imageAHash]] perceptual hash on each sampled frame — the per-frame
    * fingerprint a cross-video dedup joins on. Map-side like every codec
    * stage; only (doc_id, frame_no, frame_index, 2 longs) ever shuffles.
    */
  def frameAHash(spark: SparkSession, videos: Dataset[VideoRecord],
      k: Int = 4): Dataset[FrameHash] = {
    import spark.implicits._
    videos.mapPartitions { batch =>
      batch.flatMap { r =>
        val bb = wrapContainer(r)
        val fc = bb.getInt
        val offsets = new Array[(Int, Int)](fc)
        var i = 0
        while (i < fc) {
          val len = bb.getInt
          offsets(i) = (bb.position(), len)
          bb.position(bb.position() + len)
          i += 1
        }
        (0 until math.min(k, fc)).iterator.map { j =>
          val idx = if (fc <= k) j else (j * fc) / k
          val (start, len) = offsets(idx)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload, start, len))
          require(img != null, s"undecodable frame $idx for doc ${r.doc_id}")
          val (hi, lo) = aHashOf(img)
          FrameHash(r.doc_id, j, idx, hi, lo)
        }
      }
    }
  }

  /** mm8: scene boundaries from consecutive-frame perceptual-hash deltas.
    * Input is a [[frameAHash]] frame (one row per decoded frame); a cut is
    * where the 64-bit aHash of a frame differs from its predecessor's in
    * more than `threshold` bits, and `scene_id` is the running cut count —
    * the segment label a frame-to-clip pipeline groups on. One window
    * keyed by video over per-video frame groups (bounded by frame count,
    * never cross-video), so the shuffle carries (doc_id, frame_no, two
    * longs) per frame and parallelism follows the video count.
    */
  def sceneDetect(frameHashes: DataFrame, threshold: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_no"))
    frameHashes
      .withColumn("__prev_hi", lag(col("ahash_hi"), 1).over(w))
      .withColumn("__prev_lo", lag(col("ahash_lo"), 1).over(w))
      .withColumn("hamming_prev",
        bit_count(col("ahash_hi").bitwiseXOR(col("__prev_hi"))) +
          bit_count(col("ahash_lo").bitwiseXOR(col("__prev_lo"))))
      .withColumn("is_boundary", coalesce(col("hamming_prev") > threshold, lit(false)))
      .withColumn("scene_id",
        sum(col("is_boundary").cast("long"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("doc_id"), col("frame_no"), col("hamming_prev"),
        col("is_boundary"), col("scene_id"))
  }

  private def wrapContainer(r: VideoRecord): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.wrap(r.payload) // big-endian by default
    val magic = new Array[Byte](4)
    bb.get(magic)
    require(new String(magic, "US-ASCII") == "GFV1",
      s"bad container magic for doc ${r.doc_id}")
    bb
  }
}
