package graft.ext

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class MultimodalSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def media = Multimodal.fakeMediaTable(
    Seq((1L, "hello world"), (2L, "a longer piece of fake media payload"),
      (3L, "third")).toDF("id", "txt"), "id", "txt")

  test("media table has the canonical schema") {
    assert(media.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    assert(media.schema("payload").dataType.typeName == "binary")
    val m = media.where($"media_id" === 1L).select("meta.n_bytes").head()
    assert(m.getLong(0) == "hello world".getBytes("UTF-8").length)
  }

  private def pngMedia = Multimodal.encodePngMediaTable(
    Seq((1L, "hello world"), (2L, "a longer piece of fake media payload"),
      (3L, "third")).toDF("id", "txt"), "id", "txt")

  test("PNG round trip: decode recovers the encoded dims and fill exactly") {
    val out = Multimodal.decodeImages(pngMedia)
      .select("media_id", "width", "height", "mean_gray", "meta.n_bytes")
      .orderBy("media_id")
      .as[(Long, Int, Int, Long, Long)].collect()
    for ((_, w, h, gray, n) <- out) {
      assert(w == n % 64 + 16 && h == n % 48 + 16,
        "decoded dims must equal the deterministic encode formula")
      assert(gray == n % 256, "full-raster mean must equal the uniform fill")
    }
    // the payload is a genuine PNG (magic bytes), not the source text
    val payload = pngMedia.orderBy("media_id").select("payload")
      .head().getAs[Array[Byte]](0)
    assert(payload.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
  }

  test("JPEG round trip: uniform-gray DC survives the lossy codec for ALL 256 values") {
    // the q250 oracle predicts mean_gray from the source byte length —
    // valid only if the JDK JPEG codec round-trips a constant field
    // exactly for every gray value. 256 texts of lengths 0..255 sweep
    // every (gray, width, height) combination the formula can produce.
    val src = (0 until 256).map(i => (i.toLong, "a" * i)).toDF("id", "txt")
    val out = Multimodal.decodeImages(
        Multimodal.encodeJpegMediaTable(src, "id", "txt"))
      .select("media_id", "width", "height", "mean_gray", "meta.n_bytes")
      .orderBy("media_id")
      .as[(Long, Int, Int, Long, Long)].collect()
    assert(out.length == 256)
    for ((_, w, h, gray, n) <- out) {
      assert(w == n % 64 + 16 && h == n % 48 + 16)
      assert(gray == n % 256,
        s"lossy codec shifted the uniform fill: n=$n decoded mean $gray")
    }
    // the payload is a genuine JPEG (SOI marker), not the source text
    val payload = Multimodal.encodeJpegMediaTable(
        Seq((1L, "hello world")).toDF("id", "txt"), "id", "txt")
      .select("payload").head().getAs[Array[Byte]](0)
    assert(payload.take(2).toSeq == Seq(0xFF.toByte, 0xD8.toByte))
  }

  test("a CORRUPT jpeg (valid SOI, truncated body) yields nulls, not a failed job") {
    val good = Multimodal.encodeJpegMediaTable(
      Seq((1L, "hello world")).toDF("id", "txt"), "id", "txt")
    val bytes = good.select("payload").head().getAs[Array[Byte]](0)
    val rows = Seq(
      (1L, bytes),
      (2L, bytes.take(bytes.length / 2))) // SOI intact, entropy data cut
      .toDF("media_id", "payload")
      .withColumn("meta", org.apache.spark.sql.functions.lit(null)
        .cast("struct<format:string,width:int,height:int,n_bytes:bigint>"))
    val out = Multimodal.decodeImages(rows)
      .select("media_id", "width", "mean_gray").orderBy("media_id").collect()
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2), "intact jpeg decodes")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2), "corrupt jpeg -> nulls")
  }

  test("extractFeatures decodes and samples fixed-dim pixel features") {
    val f1 = Multimodal.extractFeatures(pngMedia, featureDim = 8, batchSize = 2)
      .select("media_id", "features").orderBy("media_id")
      .as[(Long, Seq[Float])].collect()
    assert(f1.forall(_._2.length == 8))
    // uniform-fill image: every sampled pixel equals gray/255
    val n = "hello world".getBytes("UTF-8").length
    assert(f1.head._2.forall(v => math.abs(v - (n % 256) / 255f) < 1e-6))
    val f2 = Multimodal.extractFeatures(pngMedia, featureDim = 8, batchSize = 64)
      .select("media_id", "features").orderBy("media_id")
      .as[(Long, Seq[Float])].collect()
    assert(f1.toSeq == f2.toSeq) // batch size must not change results
  }

  test("undecodable payloads yield null decode columns, not failures") {
    val out = Multimodal.decodeImages(media) // raw UTF-8 bytes, not an image
      .select("media_id", "width").orderBy("media_id").collect()
    assert(out.length == 3 && out.forall(_.isNullAt(1)))
  }

  test("a CORRUPT png (valid magic, truncated body) yields nulls, not a failed job") {
    // ImageIO.read THROWS on this shape (a reader claims the bytes, then
    // hits the truncation) — must surface as a null row
    val whole = pngMedia.where($"media_id" === 1L)
      .select("payload").head().getAs[Array[Byte]](0)
    val truncated = whole.take(whole.length / 2)
    val rows = Seq((1L, whole), (2L, truncated))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeImages(rows, featureDim = Some(4))
      .select("media_id", "width", "features").orderBy("media_id").collect()
    assert(!out(0).isNullAt(1) && !out(0).isNullAt(2), "intact png decodes")
    assert(out(1).isNullAt(1) && out(1).isNullAt(2), "corrupt png -> nulls")
    val feats = Multimodal.extractFeatures(rows, featureDim = 4)
      .select("media_id", "features").orderBy("media_id").collect()
    assert(!feats(0).isNullAt(1) && feats(1).isNullAt(1))
  }

  test("decodeImages(featureDim=...) matches the two-pass decode+extract output") {
    val onePass = Multimodal.decodeImages(pngMedia, featureDim = Some(8))
      .select("media_id", "width", "height", "mean_gray", "features")
      .orderBy("media_id").collect().toSeq
    val twoPass = Multimodal.extractFeatures(
        Multimodal.decodeImages(pngMedia), featureDim = 8)
      .select("media_id", "width", "height", "mean_gray", "features")
      .orderBy("media_id").collect().toSeq
    assert(onePass == twoPass)
  }

  test("resizeImages: exact NN geometry, pass-through under maxSide, null on corrupt") {
    // gradient image so resample geometry is observable, not just dims
    val grad = Multimodal.encodePngMediaTable(
      Seq((1L, "a longer piece of fake media payload")).toDF("id", "txt"),
      "id", "txt", gradient = true)
    val n = "a longer piece of fake media payload".getBytes("UTF-8").length
    val (w, h) = (n % 64 + 16, n % 48 + 16)
    val m = math.max(w, h)
    val (tw, th) = (math.round(w * 8.0 / m).toInt, math.round(h * 8.0 / m).toInt)
    val out = Multimodal.decodeImages(Multimodal.resizeImages(grad, maxSide = 8))
      .select("width", "height", "mean_gray").head()
    assert((out.getInt(0), out.getInt(1)) == ((tw, th)))
    // model the exact raster loop: NN source pixel (x*w div tw, y*h div th)
    val expectedSum = (for { y <- 0 until th; x <- 0 until tw }
      yield (n + (x * w / tw) + (y * h / th)) % 256).map(_.toLong).sum
    assert(out.getLong(2) == expectedSum / (tw * th))
    // small images pass through at original size
    val small = Multimodal.decodeImages(Multimodal.resizeImages(grad, maxSide = 100))
      .select("width", "height").head()
    assert((small.getInt(0), small.getInt(1)) == ((w, h)))
    // corrupt payloads resize to null rows, not job failure
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "payload")
    val nulls = Multimodal.resizeImages(bad, maxSide = 8).collect()
    assert(nulls.length == 1 && nulls.head.isNullAt(1) && nulls.head.isNullAt(2))
  }

  test("WAV round trip: decode recovers frames, rate, duration and exact mean amplitude") {
    val wav = Multimodal.encodeWavMediaTable(
      Seq((1L, "hello world")).toDF("id", "txt"), "id", "txt")
    // the payload is a genuine RIFF/WAVE container
    val payload = wav.select("payload").head().getAs[Array[Byte]](0)
    assert(new String(payload.take(4), "US-ASCII") == "RIFF")
    assert(new String(payload.slice(8, 12), "US-ASCII") == "WAVE")
    val n = "hello world".getBytes("UTF-8").length
    val num = n % 1000 + 100
    val out = Multimodal.decodeAudio(wav)
      .select("n_samples", "sample_rate", "duration_ms", "mean_amp").head()
    assert(out.getLong(0) == num && out.getInt(1) == 8000)
    assert(out.getLong(2) == num * 1000L / 8000)
    // model the sample formula independently
    val expected = (0 until num).map(i =>
      math.abs(((n + i) % 65536) - 32768).toLong).sum / num
    assert(out.getLong(3) == expected)
    // non-audio payloads decode to null columns, not failures
    val bad = Multimodal.decodeAudio(
      Seq((9L, Array[Byte](1, 2, 3, 4))).toDF("media_id", "payload")).head()
    assert(bad.isNullAt(2) && bad.isNullAt(5))
  }

  test("frameSample emits one hash per frame chunk") {
    val out = Multimodal.frameSample(media, frames = 4)
      .select("media_id", "frame_hashes").as[(Long, Seq[Long])].collect()
    assert(out.forall(_._2.length == 4))
  }

  test("frameSample chunk bounds compute in long (no int overflow in len*f)") {
    // With 3 frames over an 11-byte payload the cuts are 0,3,7,11; the long
    // cast must not change small-payload results.
    val out = Multimodal.frameSample(media, frames = 3)
      .where($"media_id" === 1L).head()
    assert(out.getSeq[Long](1).length == 3)
    // chunks of "hello world" (len 11): "hel", "lo w", "orld"
    import org.apache.spark.sql.functions.{col, xxhash64, lit}
    val expected = Seq("hel", "lo w", "orld").map { s =>
      spark.range(1).select(xxhash64(lit(s).cast("binary"))).head().getLong(0)
    }
    assert(out.getSeq[Long](1).toSeq == expected)
  }

  test("planResize preserves aspect ratio and caps the long side") {
    val out = Multimodal.planResize(media, maxSide = 16)
      .select("width", "height", "target_width", "target_height").collect()
    out.foreach { r =>
      val (w, h, tw, th) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(math.max(tw, th) <= 17) // rounding slack of 1
      val ar = w.toDouble / h
      val tar = tw.toDouble / th
      assert(math.abs(ar - tar) / ar < 0.15)
    }
  }
}
