package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch-shaped
  * decode/feature-extract/resize/frame-sample passes over them.
  *
  * The codec is REAL: payloads are PNG-encoded and PNG-decoded with
  * `javax.imageio` (pure JVM, no external libraries), pixel by pixel, on
  * the executors. The Spark-side plumbing is the arrow-batch shape:
  * partition-parallel `mapPartitions` over fixed-size batches, payload
  * bytes never on the driver, peak task memory bounded by the batch.
  * Feature extraction is embarrassingly parallel, so the only cluster
  * concern is input splittability (store media in Parquet binary columns
  * or many mid-size files, not one giant blob file).
  *
  * Oracle strategy: [[encodePngMediaTable]] builds images whose dimensions
  * and uniform fill value are pure functions of the source text's UTF-8
  * byte length, so an external SQL engine can predict exactly what a
  * CORRECT decode must return — the round trip proves real bytes went
  * through a real codec.
  */
object Multimodal {

  /** Canonical media-table schema: (media_id, payload binary, meta struct). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Build a media table from any (id, string) source — the payload is the
    * UTF-8 bytes (a deterministic fake "encoded image"); metadata derived
    * from the payload. Used by tests and fixtures; a real pipeline reads
    * binary files (`spark.read.format("binaryFile")`) instead.
    */
  def fakeMediaTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(BinaryType).as("payload"),
      struct(
        lit("fake/raw").as("format"),
        (length(col(textCol)) % 640 + 32).cast(IntegerType).as("width"),
        (length(col(textCol)) % 480 + 32).cast(IntegerType).as("height"),
        length(col(textCol).cast(BinaryType)).cast(LongType).as("n_bytes")).as("meta"))

  /** Encode one REAL PNG per row with `javax.imageio`: a TYPE_BYTE_GRAY
    * image whose width/height/fill are deterministic functions of the
    * source text's UTF-8 byte length `n` (width = n%64+16,
    * height = n%48+16; uniform gray = n%256, or with `gradient = true`
    * pixel(x,y) = (n+x+y)%256 — a non-uniform pattern that makes resample
    * GEOMETRY oracle-checkable, not just plumbing). `meta.n_bytes` records
    * the SOURCE byte length (the encoded PNG size is codec-internal).
    */
  def encodePngMediaTable(
      df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 64, gradient: Boolean = false): DataFrame =
    encodeImageMediaTable(df, idCol, textCol, batchSize, gradient,
      codec = "png", mime = "image/png")

  /** JPEG twin of [[encodePngMediaTable]] — the dominant web-crawl image
    * format (`javax.imageio` ships a JPEG reader/writer offline). Same
    * deterministic geometry and UNIFORM gray fill; no gradient option:
    * JPEG's quantized DCT round-trips a constant field exactly (the DC
    * coefficient is the field; empirically exact for all 256 gray values
    * under the JDK encoder, spec-gated), but a per-pixel gradient does
    * not survive lossy coding, so a gradient JPEG could never sit under a
    * pixel-predicting oracle. Dims/mean-gray remain pure functions of the
    * source byte length — the q34 differential contract.
    */
  def encodeJpegMediaTable(
      df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 64): DataFrame =
    encodeImageMediaTable(df, idCol, textCol, batchSize, gradient = false,
      codec = "jpg", mime = "image/jpeg")

  private def encodeImageMediaTable(
      df: DataFrame, idCol: String, textCol: String,
      batchSize: Int, gradient: Boolean,
      codec: String, mime: String): DataFrame = {
    val spark = df.sparkSession
    val src = df.select(col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(StringType).as("text"))
    val rdd = src.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          if (r.isNullAt(1)) Row(r.getLong(0), null, null)
          else {
            val n = r.getString(1)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
            val w = n % 64 + 16; val h = n % 48 + 16; val gray = n % 256
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0,
                  if (gradient) (n + x + y) % 256 else gray)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, codec, bos)
            Row(r.getLong(0), bos.toByteArray,
              Row(mime, w, h, n.toLong))
          }
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Decode, or null: `ImageIO.read` returns null when no reader claims the
    * bytes, and THROWS when a claimed image is corrupt mid-stream (e.g. a
    * truncated IDAT behind a valid PNG magic) — one rotted payload must
    * yield a null row, not fail the whole job.
    */
  private def decodeOrNull(bytes: Array[Byte]): java.awt.image.BufferedImage =
    try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    catch { case _: java.io.IOException | _: RuntimeException => null }

  /** `featureDim` evenly spaced band-0 samples (row-major), normalized to
    * [0,1]. Pixel ordinals stay Long until split into (x, y) — `w*h` can
    * exceed Int range for stitched/satellite media.
    */
  private def sampleFeatures(
      img: java.awt.image.BufferedImage, featureDim: Int): Array[Float] = {
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val total = w.toLong * h
    val out = new Array[Float](featureDim)
    var j = 0
    while (j < featureDim) {
      val p = j * total / featureDim
      out(j) = raster.getSample((p % w).toInt, (p / w).toInt, 0) / 255f
      j += 1
    }
    out
  }

  /** REAL image decode via `javax.imageio`, batch-shaped: appends the
    * decoded `width`/`height` and `mean_gray` (floor of the average of
    * band-0 samples over EVERY pixel — exact for uniform fills). Null or
    * undecodable payloads yield nulls. With `featureDim` set, also appends
    * `features` sampled from the SAME decoded raster — one decode pass for
    * both outputs (composing [[extractFeatures]] after this would decode
    * every payload twice).
    */
  def decodeImages(
      media: DataFrame, batchSize: Int = 64,
      featureDim: Option[Int] = None): DataFrame = {
    val spark = media.sparkSession
    val base = media.schema
      .add("width", IntegerType, nullable = true)
      .add("height", IntegerType, nullable = true)
      .add("mean_gray", LongType, nullable = true)
    val schema = featureDim.fold(base)(_ =>
      base.add("features", ArrayType(FloatType), nullable = true))
    val pIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img =
            if (r.isNullAt(pIdx)) null
            else decodeOrNull(r.getAs[Array[Byte]](pIdx))
          val extra: Seq[Any] =
            if (img == null) Seq(null, null, null) ++ featureDim.map(_ => null)
            else {
              val w = img.getWidth; val h = img.getHeight
              val raster = img.getRaster
              var sum = 0L; var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
                y += 1
              }
              // Seq[Any] explicitly: Seq(Int, Int, Long) would otherwise
              // widen every element to Long and break the INT fields
              Seq[Any](w, h, sum / (w.toLong * h)) ++
                featureDim.map(d => sampleFeatures(img, d))
            }
          Row.fromSeq(r.toSeq ++ extra)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Batched feature extraction: decodes the image (`javax.imageio`) and
    * samples `featureDim` evenly spaced pixels via [[sampleFeatures]].
    * Appends `features array<float>`; null/undecodable payloads get null
    * features. Needing dims/mean too? Use `decodeImages(featureDim=...)`
    * — it shares one decode pass.
    */
  def extractFeatures(media: DataFrame, featureDim: Int = 8, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val schema = media.schema.add("features", ArrayType(FloatType), nullable = true)
    val pIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped hook: a vectorized codec / GPU featurizer would take
        // the whole batch at once; ImageIO decodes per row.
        batch.map { r =>
          val feats: Array[Float] =
            if (r.isNullAt(pIdx)) null
            else {
              val img = decodeOrNull(r.getAs[Array[Byte]](pIdx))
              if (img == null) null else sampleFeatures(img, featureDim)
            }
          Row.fromSeq(r.toSeq :+ feats)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** "Frame sampling": split the payload into `frames` evenly spaced chunks
    * and fingerprint each — the plumbing shape of video frame extraction.
    * Pure SQL functions, no UDF.
    */
  def frameSample(media: DataFrame, frames: Int = 4): DataFrame = {
    val len = length(col("payload"))
    // multiply in LONG: len * f overflows Int for payloads past ~2GiB/frames
    def cut(f: Int) = floor(len.cast(LongType) * f / frames).cast(IntegerType)
    val frameCols = (0 until frames).map { f =>
      // chunk f covers byte range [f*len/frames, (f+1)*len/frames)
      xxhash64(col("payload").substr(cut(f) + 1, cut(f + 1) - cut(f)))
        .as(s"frame_$f")
    }
    media.select((col("media_id") +: frameCols).toIndexedSeq: _*)
      .select(col("media_id"),
        array((0 until frames).map(f => col(s"frame_$f")): _*).as("frame_hashes"))
  }

  /** REAL nearest-neighbor resize through the codec, batch-shaped: decode
    * each payload, downscale so the longer side is at most `maxSide`
    * (aspect preserved, [[planResize]]'s rule; images already small pass
    * through at original size), and RE-ENCODE as PNG — output rows have
    * the same media-table schema, so [[decodeImages]]/[[extractFeatures]]
    * compose downstream. Null/undecodable payloads yield null payload+meta
    * rows, not job failure.
    *
    * The resample mapping is EXACT integer arithmetic — source pixel
    * `(x*w div tw, y*h div th)` — implemented as an explicit raster loop
    * rather than AWT's opaque scalers precisely so an external oracle can
    * reproduce every output pixel (q122 predicts the resized mean over a
    * gradient image in SQL). Same scale posture as [[decodeImages]]:
    * batched `mapPartitions`, one decode+encode per row, nothing on the
    * driver.
    */
  def resizeImages(
      media: DataFrame, maxSide: Int, batchSize: Int = 64): DataFrame = {
    require(maxSide > 0, "maxSide must be positive")
    val spark = media.sparkSession
    val pIdx = media.schema.fieldIndex("payload")
    val idIdx = media.schema.fieldIndex("media_id")
    val rdd = media.rdd.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val img =
            if (r.isNullAt(pIdx)) null
            else decodeOrNull(r.getAs[Array[Byte]](pIdx))
          if (img == null) Row(r.getLong(idIdx), null, null)
          else {
            val w = img.getWidth; val h = img.getHeight
            val m = math.max(w, h)
            val (tw, th) =
              if (m <= maxSide) (w, h)
              else (math.max(1, math.round(w * maxSide.toDouble / m).toInt),
                math.max(1, math.round(h * maxSide.toDouble / m).toInt))
            val out = new java.awt.image.BufferedImage(
              tw, th, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val src = img.getRaster; val dst = out.getRaster
            var y = 0
            while (y < th) {
              val sy = (y.toLong * h / th).toInt
              var x = 0
              while (x < tw) {
                dst.setSample(x, y, 0, src.getSample((x.toLong * w / tw).toInt, sy, 0))
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Row(r.getLong(idIdx), bos.toByteArray,
              Row("image/png", tw, th, bos.size.toLong))
          }
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Encode one REAL WAV per row with `javax.sound.sampled` (pure JDK, the
    * audio twin of [[encodePngMediaTable]]): PCM_SIGNED 16-bit mono at
    * 8 kHz, sample count and values deterministic functions of the source
    * text's UTF-8 byte length `n` (`numSamples = n%1000 + 100`,
    * `sample(i) = ((n + i) % 65536) - 32768`, little-endian) — so an
    * external oracle can predict every decoded sample without parsing a
    * WAV. `meta.width` carries the sample count, `meta.height` the sample
    * rate (the media schema is deliberately modality-generic).
    */
  def encodeWavMediaTable(
      df: DataFrame, idCol: String, textCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val src = df.select(col(idCol).cast(LongType).as("media_id"),
      col(textCol).cast(StringType).as("text"))
    val rdd = src.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          if (r.isNullAt(1)) Row(r.getLong(0), null, null)
          else {
            val n = r.getString(1)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
            val num = n % 1000 + 100
            val pcm = new Array[Byte](num * 2)
            var i = 0
            while (i < num) {
              val s = ((n + i) % 65536) - 32768
              pcm(2 * i) = (s & 0xff).toByte        // little-endian int16
              pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
              i += 1
            }
            val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
            val ais = new javax.sound.sampled.AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, num.toLong)
            val bos = new java.io.ByteArrayOutputStream()
            javax.sound.sampled.AudioSystem.write(ais,
              javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
            Row(r.getLong(0), bos.toByteArray, Row("audio/wav", num, 8000, n.toLong))
          }
        }
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** REAL audio decode via `javax.sound.sampled`, batch-shaped: appends
    * `n_samples`, `sample_rate` (Hz, rounded), `duration_ms` (integer
    * floor) and `mean_amp` (integer-floor mean of |sample| over every
    * frame — band-0 for multi-channel audio). Null or unparseable payloads
    * yield null columns, not job failure — the [[decodeImages]] posture.
    * Only PCM_SIGNED 16-bit little-endian payloads are scanned (what
    * [[encodeWavMediaTable]] writes and most raw-speech corpora carry);
    * other encodings decode header-only (amplitude null).
    */
  def decodeAudio(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val schema = media.schema
      .add("n_samples", LongType, nullable = true)
      .add("sample_rate", IntegerType, nullable = true)
      .add("duration_ms", LongType, nullable = true)
      .add("mean_amp", LongType, nullable = true)
    val pIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val extra: Seq[Any] =
            if (r.isNullAt(pIdx)) Seq(null, null, null, null)
            else {
              try {
                val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                  new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](pIdx)))
                try {
                  val fmt = ais.getFormat
                  val frames = ais.getFrameLength
                  val rate = math.round(fmt.getSampleRate)
                  val durMs = frames * 1000L / rate
                  val amp: Any =
                    if (fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian &&
                      fmt.getEncoding ==
                        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
                      frames > 0) {
                      val bytes = ais.readAllBytes()
                      val ch = fmt.getChannels
                      var sum = 0L; var i = 0
                      while (i < frames) {
                        val off = i * 2 * ch // band 0 of frame i
                        val s = ((bytes(off + 1) << 8) | (bytes(off) & 0xff)).toShort
                        sum += math.abs(s.toLong)
                        i += 1
                      }
                      sum / frames
                    } else null
                  Seq[Any](frames, rate, durMs, amp)
                } finally ais.close()
              } catch {
                case _: javax.sound.sampled.UnsupportedAudioFileException |
                     _: java.io.IOException => Seq(null, null, null, null)
              }
            }
          Row.fromSeq(r.toSeq ++ extra)
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Metadata-only "resize" plan: computes target dimensions preserving
    * aspect ratio, without decoding — the catalog pass a media pipeline runs
    * before scheduling decode work.
    */
  def planResize(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width"); val h = col("meta.height")
    val scale = when(greatest(w, h) <= maxSide, lit(1.0))
      .otherwise(lit(maxSide).cast(DoubleType) / greatest(w, h))
    media.select(col("media_id"), w.as("width"), h.as("height"),
      round(w * scale).cast(IntegerType).as("target_width"),
      round(h * scale).cast(IntegerType).as("target_height"))
  }
}
