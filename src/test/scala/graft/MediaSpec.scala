package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{MediaPipeline, MediaRecord}

/** SURVEY.md §2.8 #41 — MediaPipeline plumbing: schema, size-bounded
  * batching, per-partition stub decode. */
class MediaSpec extends SparkSpec {
  private val s = SparkSpec.spark
  import s.implicits._

  test("sniffFormat recognizes public magic numbers") {
    assert(MediaPipeline.sniffFormat(
      Array(0xff, 0xd8, 0xff, 0xe0).map(_.toByte)) == "jpeg")
    assert(MediaPipeline.sniffFormat(
      Array(0x89, 0x50, 0x4e, 0x47).map(_.toByte)) == "png")
    assert(MediaPipeline.sniffFormat(
      Array(0x00, 0x00, 0x00, 0x18, 0x66, 0x74, 0x79, 0x70)
        .map(_.toByte)) == "mp4")
    assert(MediaPipeline.sniffFormat("plain text".getBytes) == "unknown")
  }

  test("extractFeatures is deterministic and preserves every record") {
    val media = MediaPipeline.syntheticMedia(spark, sf)
    val n = media.count()
    val feats = MediaPipeline.extractFeatures(media)
    assert(feats.count() == n)
    val row = feats.filter(col("media_id") === 0).head()
    val again = MediaPipeline.extractFeatures(
      MediaPipeline.syntheticMedia(spark, sf))
      .filter(col("media_id") === 0).head()
    // stub decode is deterministic (field-wise: feature is an Array)
    assert(row.content_hash == again.content_hash)
    assert(row.width == again.width && row.height == again.height)
    assert(row.feature.toSeq == again.feature.toSeq)
    assert(row.feature.length == 8)
    assert(row.byte_len > 0)
  }

  test("small maxBatchBytes still processes all rows (batch boundary)") {
    val media = MediaPipeline.syntheticMedia(spark, sf)
    val feats = MediaPipeline.extractFeatures(media, maxBatchBytes = 100)
    assert(feats.count() == media.count())
  }

  test("decode stub produces bounded dims and unit-range features") {
    val (w, h, f) = MediaPipeline.decodeStub("hello media".getBytes)
    assert(w >= 64 && w < 64 + 1024)
    assert(h >= 64 && h < 64 + 1024)
    assert(f.forall(x => x >= -1.0f && x <= 1.0f))
  }

  test("decode reads real PNG/BMP pixels via javax.imageio") {
    // 20×10 PNG: left half black, right half white → the 2×4 luma grid
    // is exactly [0,0,1,1, 0,0,1,1]
    val img = new java.awt.image.BufferedImage(
      20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 20; y <- 0 until 10)
      img.setRGB(x, y, if (x < 10) 0x000000 else 0xffffff)
    def bytes(fmt: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, out)
      out.toByteArray
    }
    for (fmt <- Seq("png", "bmp")) {
      val payload = bytes(fmt)
      assert(MediaPipeline.sniffFormat(payload) == fmt)
      val (w, h, feat) = MediaPipeline.decode(payload)
      assert(w == 20 && h == 10, s"$fmt: $w x $h")
      assert(feat.toSeq == Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f),
        s"$fmt: ${feat.toSeq}")
    }
    // the same real decode runs distributed through extractFeatures
    val ds = Seq(MediaRecord(7L, "image", bytes("png"), "test")).toDS()
    val row = MediaPipeline.extractFeatures(ds).head()
    assert(row.width == 20 && row.height == 10 && row.format == "png")
    assert(row.feature.toSeq == Seq(0f, 0f, 1f, 1f, 0f, 0f, 1f, 1f))
    // a corrupt header with a PNG magic falls back to the stub, not a throw
    val corrupt = Array(0x89, 0x50, 0x4e, 0x47, 0x01, 0x02).map(_.toByte)
    val (cw, ch, cf) = MediaPipeline.decode(corrupt)
    assert((cw, ch, cf.toSeq) ==
      (MediaPipeline.decodeStub(corrupt)._1, MediaPipeline.decodeStub(corrupt)._2,
        MediaPipeline.decodeStub(corrupt)._3.toSeq))
  }

  test("nearDupPairs: byte-exact vs perceptual image dups classified") {
    def image(bright: Int, flipped: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 20; y <- 0 until 10) {
        val lit = if (flipped) x >= 10 else x < 10
        val v = if (lit) math.min(255, 200 + bright) else bright
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val a = image(0, flipped = false)
    val ds = Seq(
      MediaRecord(1L, "image", a, "t"),                      // original
      MediaRecord(2L, "image", a.clone(), "t"),              // exact copy
      MediaRecord(3L, "image", image(10, flipped = false), "t"), // brighter
      MediaRecord(4L, "image", image(0, flipped = true), "t"))   // opposite
      .toDS()
    val feats = MediaPipeline.extractFeatures(ds)
    for (lsh <- Seq(true, false)) {
      val pairs = MediaPipeline.nearDupPairs(feats, tau = 0.99, lsh = lsh)
        .select("id_a", "id_b", "kind")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      // 1-2 byte-identical; 1-3/2-3 perceptually near; 4 is the
      // mirrored image — cosine far below τ
      assert(pairs === Set((1L, 2L, "exact"), (1L, 3L, "near"),
        (2L, 3L, "near")), s"lsh=$lsh: $pairs")
    }
  }

  test("media Dataset round-trips its schema through parquet") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    MediaPipeline.syntheticMedia(spark, sf).write
      .mode("overwrite").parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media").as[MediaRecord]
    assert(back.count() == 500)
    assert(back.schema("payload").dataType.typeName == "binary")
  }

  test("sampleFrames explodes only videos into bounded frame rows") {
    val media = MediaPipeline.syntheticMedia(spark, sf)
    val frames = MediaPipeline.sampleFrames(media, everyNth = 2,
      maxFrames = 5)
    val perVideo = frames.groupBy("media_id").count().collect()
    assert(perVideo.nonEmpty)
    assert(perVideo.forall(_.getLong(1) <= 5))
    // only video rows produce frames
    val videoIds = media.filter(_.media_type == "video")
      .map(_.media_id).collect().toSet
    assert(frames.collect().forall(f => videoIds.contains(f.media_id)))
    // frame indexes respect the stride
    assert(frames.collect().forall(_.frame_index % 2 == 0))
    // deterministic: a second run produces the identical frame set
    val again = MediaPipeline.sampleFrames(media, everyNth = 2,
      maxFrames = 5).collect().map(f => (f.media_id, f.frame_index)).toSet
    assert(again ==
      frames.collect().map(f => (f.media_id, f.frame_index)).toSet)
  }

  test("resizeStub keeps the payload opaque and retargets dims") {
    val (p2, w, h) = MediaPipeline.resizeStub(Array[Byte](1, 2, 3), 224, 224)
    assert(p2.toSeq == Seq[Byte](1, 2, 3) && w == 224 && h == 224)
  }
}
