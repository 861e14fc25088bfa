package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash

/** Multimodal columns (SURVEY.md §2.8) — image/audio/video as opaque
  * `binary` payloads with typed metadata. The Spark-side plumbing
  * (schema, size-aware batching, per-partition feature extraction) is
  * real, and IMAGE decode is real for the formats the JDK ships codecs
  * for (PNG/BMP/GIF/JPEG via `javax.imageio` — [[MediaPipeline
  * .decode]]); audio/video and non-JDK image codecs are STUBBED with a
  * deterministic fake because this container ships no media libraries —
  * swap [[MediaPipeline.decodeStub]] for a real decoder binding in
  * prod.
  *
  * Scale notes: payloads stay opaque binary end-to-end (no driver
  * collect); feature extraction is `mapPartitions` so any native
  * decoder is initialized once per partition, not per row; batching by
  * cumulative byte size bounds executor memory for large media rows.
  */
final case class MediaRecord(
    media_id: Long,
    media_type: String, // image | audio | video
    payload: Array[Byte],
    source: String)

final case class FrameRecord(
    media_id: Long,
    frame_index: Int,
    frame_payload: Array[Byte],
    width: Int,
    height: Int)

final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    byte_len: Long,
    content_hash: Long,
    format: String,
    width: Int, // stub-decoded
    height: Int, // stub-decoded
    feature: Array[Float]) // stub embedding

object MediaPipeline {

  /** Magic-byte format sniff over the first payload bytes (public magic
    * numbers: JPEG FF D8, PNG 89 50, GIF 47 49, BMP 42 4D, RIFF/WAV
    * 52 49, MP4 ftyp at offset 4). */
  def sniffFormat(payload: Array[Byte]): String = {
    def at(i: Int): Int = if (i < payload.length) payload(i) & 0xff else -1
    if (at(0) == 0xff && at(1) == 0xd8) "jpeg"
    else if (at(0) == 0x89 && at(1) == 0x50) "png"
    else if (at(0) == 0x47 && at(1) == 0x49) "gif"
    else if (at(0) == 0x42 && at(1) == 0x4d) "bmp"
    else if (at(0) == 0x52 && at(1) == 0x49) "riff"
    else if (at(4) == 0x66 && at(5) == 0x74 && at(6) == 0x79 &&
      at(7) == 0x70) "mp4"
    else "unknown"
  }

  private def fnv(bytes: Array[Byte]): Long = {
    var h = TextHash.FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= TextHash.FnvPrime; i += 1
    }
    h
  }

  /** STUB decoder — deterministic fake standing in for codec calls the
    * JDK cannot make (??? boundary: JPEG2000, HEIC, audio, video).
    * Produces plausible dims + an 8-float "embedding" derived from the
    * payload hash so downstream operators (ANN, dedup) are exercised
    * end-to-end. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val h = fnv(payload)
    val width = 64 + (math.abs(h % 1024)).toInt
    val height = 64 + (math.abs((h >> 10) % 1024)).toInt
    val feat = Array.tabulate(8) { i =>
      (((h >> (i * 8)) & 0xff).toInt - 128) / 128.0f
    }
    (width, height, feat)
  }

  /** REAL decode for the formats the JDK ships codecs for (PNG, BMP,
    * GIF, and JPEG via `javax.imageio` — no external libraries): true
    * pixel dims plus an 8-float embedding = mean luminance of a 2×4
    * grid of image cells, each in [0, 1]. Unreadable payloads and
    * non-JDK formats fall back to [[decodeStub]] (a corrupt image must
    * not fail a 100 TB scan — it degrades to hash features). */
  def decode(payload: Array[Byte]): (Int, Int, Array[Float]) =
    sniffFormat(payload) match {
      case "png" | "bmp" | "gif" | "jpeg" =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          if (img == null) decodeStub(payload)
          else {
            val w = img.getWidth
            val h = img.getHeight
            val feat = new Array[Float](8)
            val (cellsX, cellsY) = (4, 2)
            var cy = 0
            while (cy < cellsY) {
              var cx = 0
              while (cx < cellsX) {
                val x0 = w * cx / cellsX; val x1 = math.max(w * (cx + 1) / cellsX, x0 + 1)
                val y0 = h * cy / cellsY; val y1 = math.max(h * (cy + 1) / cellsY, y0 + 1)
                var sum = 0.0; var n = 0
                var y = y0
                while (y < y1 && y < h) {
                  var x = x0
                  while (x < x1 && x < w) {
                    val rgb = img.getRGB(x, y)
                    // ITU-R BT.601 luma from the packed sRGB int
                    sum += 0.299 * ((rgb >> 16) & 0xff) +
                      0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                    n += 1; x += 1
                  }
                  y += 1
                }
                feat(cy * cellsX + cx) =
                  if (n == 0) 0f else (sum / n / 255.0).toFloat
                cx += 1
              }
              cy += 1
            }
            (w, h, feat)
          }
        } catch {
          // ImageIO codecs throw more than IOException on malformed
          // payloads (IllegalArgument, ArrayIndexOutOfBounds, …) — any
          // decode failure degrades to the hash stub, never a task kill
          case scala.util.control.NonFatal(_) => decodeStub(payload)
        }
      case _ => decodeStub(payload)
    }

  /** Per-partition feature extraction: one decoder init per partition,
    * rows processed in size-bounded batches (batch shape = what a real
    * vectorized decoder / Arrow batch would consume). */
  def extractFeatures(ds: Dataset[MediaRecord],
      maxBatchBytes: Long = 64L << 20): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // decoder init would happen HERE (once per partition)
      val batches = new Iterator[Seq[MediaRecord]] {
        def hasNext: Boolean = it.hasNext
        def next(): Seq[MediaRecord] = {
          val buf = scala.collection.mutable.ArrayBuffer.empty[MediaRecord]
          var bytes = 0L
          while (it.hasNext && (buf.isEmpty || bytes < maxBatchBytes)) {
            val r = it.next(); buf += r; bytes += r.payload.length
          }
          buf.toSeq
        }
      }
      batches.flatMap { batch =>
        batch.map { r =>
          val (w, h, feat) = decode(r.payload)
          MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong,
            fnv(r.payload), sniffFormat(r.payload), w, h, feat)
        }
      }
    }
  }

  /** STUB resize — the codec boundary a real binding would fill (???):
    * here the payload passes through and only the claimed dims change.
    * The Spark-side shape (opaque binary in/out, per-partition batch
    * processing via [[extractFeatures]]' pattern) is the real part. */
  def resizeStub(payload: Array[Byte], targetW: Int, targetH: Int)
      : (Array[Byte], Int, Int) = (payload, targetW, targetH)

  /** Frame sampling plumbing: each video row explodes into its
    * every-nth frames, capped at `maxFrames` — the row-explosion shape
    * a real extractor produces (bounded output per input row, so one
    * huge video cannot blow an executor). Non-video rows pass through
    * empty. Frame decode is stubbed with deterministic payload slices;
    * frame count derives from the payload hash. */
  def sampleFrames(ds: Dataset[MediaRecord], everyNth: Int = 2,
      maxFrames: Int = 16): Dataset[FrameRecord] = {
    import ds.sparkSession.implicits._
    ds.flatMap { r =>
      if (r.media_type != "video" || r.payload.isEmpty) Iterator.empty
      else {
        val (w, h, _) = decodeStub(r.payload)
        val nFrames = 1 + (math.abs(fnv(r.payload)) % 64).toInt
        (0 until nFrames by everyNth).iterator.take(maxFrames).map { i =>
          val start = (i * 7) % r.payload.length
          FrameRecord(r.media_id, i,
            r.payload.slice(start, math.min(start + 16, r.payload.length)),
            w, h)
        }
      }
    }
  }

  /** Media near-duplicate pairs (round-7): the image-dedup capability
    * of the multimodal family. Pairs come from the DECODED perceptual
    * features (the 2×4 luma grid for JDK formats, the deterministic
    * hash stub past the codec boundary), so re-encoded / slightly
    * brightened copies of one image pair up even when their bytes
    * differ; the `kind` column separates byte-exact dups (equal
    * content hash) from perceptual ones. Output:
    * (id_a, id_b, cosine, kind ∈ exact|near).
    *
    * Scale: features are one [[extractFeatures]] scan; pair
    * generation reuses the embedding-dedup family — banded
    * hyperplane LSH with id-only candidate shuffles
    * ([[graft.operators.Similarity.dedupEmbeddingLsh]]) by default,
    * or the exact all-pairs baseline (`lsh = false`) at verification
    * scale.
    *
    * STORAGE CONTRACT: the feature projection is LAZILY
    * localCheckpointed inside the result's plan — nothing is pinned
    * until the first action on the returned frame, and after consuming
    * it the caller must free the blocks with
    * [[graft.operators.Dedup.release]] on the result (as Bench/Verify
    * do for every checkpointing operator). */
  def nearDupPairs(feats: Dataset[MediaFeatures], tau: Double,
      lsh: Boolean = true, bands: Int = 8, bandBits: Int = 8)
      : DataFrame = {
    // bandBits defaults high for the LOW-dimensional feature space: 8
    // bits = 256 buckets/band keeps bucket populations (and the
    // quadratic candidate term) small where 4 bits would pool ~1/16
    // of the corpus per bucket; at τ ≥ 0.9 the 8-band OR still gives
    // ≈99% pair recall
    // checkpoint the (id, hash, feature) projection: it is tiny
    // (~40 bytes/record vs the raw media), and the LSH machinery
    // consumes it in four plan branches — re-decoding the media per
    // branch is the one recompute that does NOT beat caching here.
    // LAZY (eager = false) so merely BUILDING the frame pins nothing;
    // blocks materialize at the caller's first action and are theirs
    // to release (see scaladoc). In production this is the persisted
    // feature table.
    val df = feats.toDF()
      .select(col("media_id"), col("content_hash"), col("feature"))
      .localCheckpoint(false)
    val pairs =
      if (lsh) graft.operators.Similarity.dedupEmbeddingLsh(
        df, "media_id", "feature", tau, bands, bandBits, dims = 8,
        planeOffset = 5000)
      else graft.operators.Similarity.embeddingPairs(
        df, "media_id", "feature", tau)
    val hashes = df.select(col("media_id"), col("content_hash"))
    pairs
      .join(hashes.select(col("media_id").as("id_a"),
        col("content_hash").as("_ha")), "id_a")
      .join(hashes.select(col("media_id").as("id_b"),
        col("content_hash").as("_hb")), "id_b")
      .select(col("id_a"), col("id_b"), col("cosine"),
        when(col("_ha") === col("_hb"), "exact").otherwise("near")
          .as("kind"))
  }

  /** Synthesize a deterministic media table from `documents` (payload =
    * UTF-8 bytes prefixed with a magic number chosen by doc_id) — the
    * testdata has no binary column, so the oracle-checkable metadata
    * query (#40) builds its payloads the same way in both engines. */
  def syntheticMedia(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables(spark, dir, "documents").select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))
      .as[MediaRecord]
  }
}

/** #40 mm_metadata — typed metadata over opaque binary payloads, fully
  * oracle-expressible: byte length, md5 content hash, hex prefix, and
  * the magic-byte sniff as a CASE over the prefix. */
object MediaQueries {

  def mmMetadata(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(
        col("doc_id"),
        length(col("payload")).cast("long").as("byte_len"),
        md5(col("payload")).as("content_hash"),
        substring(hex(col("payload")), 1, 8).as("prefix_hex"))
      .withColumn("sniffed_format",
        when(col("prefix_hex").startsWith("FFD8"), "jpeg")
          .when(col("prefix_hex").startsWith("8950"), "png")
          .when(col("prefix_hex").startsWith("4749"), "gif")
          .otherwise("unknown"))

  /** media_near_dup (rows-only — features come from the decode
    * boundary, not SQL): [[MediaPipeline.nearDupPairs]] over the
    * synthetic media table. The synthetic payloads are not decodable
    * images, so features are the deterministic stub and the pairs it
    * finds are the byte-identical payload groups — the plumbing
    * (decode → features → LSH pairs → kind split) is the real path
    * exercised with real PNGs in MediaSpec. */
  def mediaNearDup(s: SparkSession, dir: String): DataFrame =
    MediaPipeline.nearDupPairs(
      MediaPipeline.extractFeatures(MediaPipeline.syntheticMedia(s, dir)),
      tau = 0.95)

  /** media_near_dup_seeded (round-18) — the HASH-GATED twin of
    * media_near_dup: the same real pipeline (syntheticMedia →
    * [[MediaPipeline.extractFeatures]] → [[MediaPipeline
    * .nearDupPairs]]), on a doc subset with the exact all-pairs leg
    * (`lsh = false`, the verification baseline). The synthetic
    * payloads are text bytes, so decode routes to the deterministic
    * FNV stub — features are `((h >> 8i) & 0xff − 128)/128` exact
    * dyadic rationals and the cosine is the engine-portable
    * double-dot the dedup_embedding oracle already replays; the
    * DuckDB oracle replays FNV-1a in HUGEINT mod-2⁶⁴ (the
    * text_fingerprint recipe) and the decision end to end. The
    * rows-only media_near_dup keeps the LSH scale path. */
  def mediaNearDupSeeded(s: SparkSession, dir: String): DataFrame =
    MediaPipeline.nearDupPairs(
      MediaPipeline.extractFeatures(
        MediaPipeline.syntheticMedia(s, dir)
          .filter(col("media_id") % 5 === 0)),
      tau = 0.8, lsh = false)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_near_dup" -> mediaNearDup,
    "media_near_dup_seeded" -> mediaNearDupSeeded,
    "mm_metadata" -> mmMetadata)

  val oracleSql: Map[String, String] = Map(
    // media_near_dup_seeded: FNV-1a over the payload bytes in HUGEINT
    // mod-2^64 (the text_fingerprint recipe; ASCII corpus so ord ==
    // byte), stub features as exact dyadic rationals, the same
    // left-fold double dot/cosine the dedup_embedding oracle uses.
    "media_near_dup_seeded" -> """
      WITH sel AS MATERIALIZED (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
      fh AS MATERIALIZED (
        SELECT doc_id,
          list_reduce(list_prepend(14695981039346656037::HUGEINT,
            list_transform(range(1, length(text) + 1),
              j -> CAST(ord(substr(text, j, 1)) AS HUGEINT))),
            (acc, b) -> (xor(acc, b) * 1099511628211::HUGEINT)
              % 18446744073709551616::HUGEINT) AS h
        FROM sel),
      fn AS MATERIALIZED (
        SELECT doc_id, h, e,
          list_reduce(list_transform(range(1, 9), i -> e[i] * e[i]),
            (x, y) -> x + y) AS nn
        FROM (
          SELECT doc_id, h,
            list_transform(range(0, 8), i ->
              (CAST((h // (2::HUGEINT ^ (i * 8))::HUGEINT) % 256
                AS DOUBLE) - CAST(128 AS DOUBLE)) / CAST(128 AS DOUBLE))
              AS e
          FROM fh))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        list_reduce(list_transform(range(1, 9), i -> a.e[i] * b.e[i]),
          (x, y) -> x + y) / (sqrt(a.nn) * sqrt(b.nn)) AS cosine,
        CASE WHEN a.h = b.h THEN 'exact' ELSE 'near' END AS kind
      FROM fn a JOIN fn b ON a.doc_id < b.doc_id
      WHERE list_reduce(list_transform(range(1, 9), i -> a.e[i] * b.e[i]),
          (x, y) -> x + y) / (sqrt(a.nn) * sqrt(b.nn))
        >= CAST('0.8' AS DOUBLE)""",
    "mm_metadata" -> """
      SELECT doc_id,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        md5(text) AS content_hash, -- VARCHAR md5 = md5 of the UTF-8 bytes
        substr(upper(hex(encode(text))), 1, 8) AS prefix_hex,
        CASE
          WHEN substr(upper(hex(encode(text))), 1, 4) = 'FFD8' THEN 'jpeg'
          WHEN substr(upper(hex(encode(text))), 1, 4) = '8950' THEN 'png'
          WHEN substr(upper(hex(encode(text))), 1, 4) = '4749' THEN 'gif'
          ELSE 'unknown'
        END AS sniffed_format
      FROM documents""")
}
