package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, and run batch-shaped
  * decode/feature-extract/resize/frame-sample passes over them.
  *
  * The Spark-side plumbing here is REAL and tested: schema contract,
  * partition-parallel batched iteration (`mapPartitions` over fixed-size
  * batches — the JVM analog of an arrow-batched pandas UDF), deterministic
  * output shapes. The actual codec step is a clearly marked STUB
  * ([[stubDecode]]) because no image/audio libraries exist in this
  * environment; swap `stubDecode` for a real decoder and nothing else
  * changes.
  *
  * Scale notes: payload bytes never hit the driver; batches bound peak
  * memory per task; feature extraction is embarrassingly parallel, so the
  * only cluster concern is input splittability (store media in Parquet
  * binary columns or many mid-size files, not one giant blob file).
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

  /** STUB decoder ??? — stands in for image/audio decode (no codec libs in
    * this container). Deterministic fake: derives `featureDim` floats from a
    * rolling hash of the payload bytes. Replace with a real decoder
    * (e.g. javax.imageio / ffmpeg bindings) without touching the plumbing.
    */
  def stubDecode(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    var h = 1125899906842597L // deterministic rolling hash
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var j = 0
    while (j < featureDim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(j) = ((h >>> 16).toInt.toFloat / Int.MaxValue.toFloat)
      j += 1
    }
    out
  }

  /** Batched feature extraction: partition-parallel, processing rows in
    * fixed-size batches (the arrow-batch shape). Appends
    * `features array<float>`.
    */
  def extractFeatures(media: DataFrame, featureDim: Int = 8, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val schema = media.schema.add("features", ArrayType(FloatType), nullable = true)
    val pIdx = media.schema.fieldIndex("payload")
    val rdd = media.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped hook: a real decoder would decode the whole batch at
        // once (vectorized codec / GPU inference); the stub maps per row.
        batch.map { r =>
          val feats =
            if (r.isNullAt(pIdx)) null
            else stubDecode(r.getAs[Array[Byte]](pIdx), featureDim)
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
