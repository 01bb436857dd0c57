package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * with typed metadata (SURVEY.md north star).
  *
  * The Spark-side plumbing is real and tested — schema, batch shape,
  * partition-parallel processing via typed `mapPartitions` (the Scala analog
  * of `mapInPandas` batch UDFs), metadata propagation, and modality
  * routing. The actual codecs are STUBBED with deterministic fakes (clearly
  * marked below): the container has no image/audio libraries, and the
  * pipeline semantics — batching, schema, partitioning — are what this
  * module owns. The decode boundary is the [[MediaCodec]] trait: every
  * pipeline function takes a codec parameter (defaulting to [[StubCodecs]],
  * the test instance), so a real environment swaps in a JNI/ffmpeg-backed
  * implementation without touching any pipeline code.
  *
  * Scale notes: media blobs never shuffle — every transform here is a
  * narrow per-partition map; only extracted features (small, fixed-width)
  * flow into joins/aggregations downstream. Partition sizing is by
  * maxPartitionBytes on read, so a 100 TB media lake maps to bounded-memory
  * tasks.
  */
object Media {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRec(
    media_id: Long,
    kind: String, // image | audio | video
    bytes: Array[Byte],
    width: Int, height: Int, // images/video; 0 otherwise
    sample_rate: Int, // audio; 0 otherwise
    duration_ms: Long) // audio/video; 0 otherwise

  /** A decoded/derived feature row (fixed-width — this is what shuffles). */
  case class MediaFeature(
    media_id: Long,
    kind: String,
    n_bytes: Long,
    checksum: String,
    feature: Array[Float])

  // ----------------------------------------------------------------- codecs

  /** The pluggable decode boundary: everything the pipeline needs from a
    * media decoder, and NOTHING else — pipeline code below depends only on
    * this trait, so a real environment swaps in a JNI/ffmpeg/turbojpeg
    * implementation without touching any Spark plumbing (schema, batching,
    * partitioning, modality routing all stay as-is). Serializable because
    * instances are captured in executor closures; implementations must be
    * pure in the payload bytes so runs stay reproducible. */
  trait MediaCodec extends Serializable {
    /** Decode an image payload into a fixed-width feature/pixel vector. */
    def decodeImage(bytes: Array[Byte]): Array[Float]
    /** Resample a decoded image from (w, h) to (tw, th). */
    def resize(px: Array[Float], w: Int, h: Int, tw: Int, th: Int): Array[Float]
    /** Decode audio + extract fixed-width features (e.g. MFCCs). */
    def audioFeatures(bytes: Array[Byte], sampleRate: Int): Array[Float]
    /** Sample (frame_index, frame_bytes) keyframes from a video payload. */
    def sampleFrames(bytes: Array[Byte], everyMs: Long, durationMs: Long): Seq[(Int, Array[Byte])]
  }

  /** STUB CODECS — the deterministic-fake [[MediaCodec]] instance (this
    * container has no codec libraries). Every function is pure in the
    * payload bytes so the pipeline is reproducible; a real deployment
    * passes its own MediaCodec to the pipeline functions instead. */
  object StubCodecs extends MediaCodec {
    /** ??? real impl: image decode (e.g. via javax.imageio / JNI turbojpeg).
      * Fake: 8 deterministic "pixels" folded from the byte stream. */
    def decodeImage(bytes: Array[Byte]): Array[Float] = {
      val acc = new Array[Float](8)
      var i = 0
      while (i < bytes.length) { acc(i % 8) += (bytes(i) & 0xff) / 255.0f; i += 1 }
      acc
    }

    /** ??? real impl: resample/resize. Fake: scale the fake pixels. */
    def resize(px: Array[Float], w: Int, h: Int, tw: Int, th: Int): Array[Float] = {
      val scale = if (w * h == 0) 1.0f else (tw.toFloat * th) / (w.toFloat * h)
      px.map(_ * scale)
    }

    /** ??? real impl: audio PCM decode + MFCC-ish features.
      * Fake: windowed byte means. */
    def audioFeatures(bytes: Array[Byte], sampleRate: Int): Array[Float] = {
      val n = 8
      val win = math.max(1, bytes.length / n)
      Array.tabulate(n) { i =>
        val s = bytes.slice(i * win, (i + 1) * win)
        if (s.isEmpty) 0f else s.map(b => (b & 0xff).toFloat).sum / (s.length * 255f)
      }
    }

    /** ??? real impl: keyframe extraction. Fake: every k-th byte window is a
      * "frame"; returns (frame_index, frame_bytes) pairs. */
    def sampleFrames(bytes: Array[Byte], everyMs: Long, durationMs: Long): Seq[(Int, Array[Byte])] = {
      val nFrames = math.max(1, (durationMs / math.max(1, everyMs)).toInt)
      val win = math.max(1, bytes.length / nFrames)
      (0 until math.min(nFrames, bytes.length)).map(i =>
        (i, bytes.slice(i * win, (i + 1) * win)))
    }
  }

  // -------------------------------------------------------------- pipeline

  /** Batched per-partition feature extraction — the mapInPandas analog:
    * one iterator pass per partition, no per-row task overhead, media bytes
    * stay partition-local. */
  def extractFeatures(media: Dataset[MediaRec],
      codec: MediaCodec = StubCodecs): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        digest.reset()
        val sum = digest.digest(r.bytes).map("%02x".format(_)).mkString
        val feat = r.kind match {
          case "image" => codec.decodeImage(r.bytes)
          case "audio" => codec.audioFeatures(r.bytes, r.sample_rate)
          case "video" =>
            codec.decodeImage(
              codec.sampleFrames(r.bytes, 1000, r.duration_ms)
                .headOption.map(_._2).getOrElse(Array.emptyByteArray))
          case _ => Array.emptyFloatArray
        }
        MediaFeature(r.media_id, r.kind, r.bytes.length.toLong, sum, feat)
      }
    }
  }

  /** Image-only resize pass (modality routing + metadata update; payload
    * untouched in the stub, dimensions rewritten). */
  def resizeImages(media: Dataset[MediaRec], tw: Int, th: Int): Dataset[MediaRec] = {
    import media.sparkSession.implicits._
    media.map { r =>
      if (r.kind == "image") r.copy(width = tw, height = th) else r
    }
  }

  /** Frame sampling: video rows explode into one row per sampled frame —
    * the generator shape of A11 applied to media. */
  def sampleVideoFrames(media: Dataset[MediaRec], everyMs: Long,
      codec: MediaCodec = StubCodecs): DataFrame = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      codec.sampleFrames(r.bytes, everyMs, r.duration_ms).map {
        case (idx, frame) => (r.media_id, idx, frame, r.width, r.height)
      }
    }.toDF("media_id", "frame_index", "frame_bytes", "width", "height")
  }

  /** Join extracted features back to a metadata table — fixed-width columns
    * only; the blob column is pruned before any shuffle. */
  def featureTable(media: Dataset[MediaRec],
      codec: MediaCodec = StubCodecs): DataFrame =
    extractFeatures(media, codec).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"), col("checksum"),
        col("feature"))

  // ------------------------------------------------------- byte-level dedup

  /** 64-bit SimHash over rolling byte 8-grams of the RAW payload — a
    * codec-free near-dup fingerprint (NOT a stub: it operates on real
    * bytes). Exact dedup (md5 checksum) only catches bit-identical copies;
    * this catches payloads whose byte-shingle distribution barely differs —
    * truncated tails, edited metadata tags, re-muxed containers. Pure
    * per-row JVM work; only the 8-byte fingerprint ever shuffles. */
  def byteSimhash(bytes: Array[Byte], shingle: Int = 8): Long = {
    if (bytes.length == 0) return 0L
    val counts = new Array[Int](64)
    val n = bytes.length
    var i = math.min(shingle, n) - 1
    while (i < n) {
      // hash of THIS window only (recomputed per window — a prefix
      // accumulator would let one flipped byte poison every later window
      // and destroy near-dup recall); multiply-add polynomial is enough
      // here (fingerprint, not cryptography).
      var g = 0L
      var k = math.max(0, i - shingle + 1)
      while (k <= i) { g = g * 1099511628211L + (bytes(k) & 0xff); k += 1 }
      // final mix: the low bits of a poly hash alone are byte-biased
      g ^= (g >>> 33); g *= 0xff51afd7ed558ccdL; g ^= (g >>> 33)
      var j = 0
      while (j < 64) {
        counts(j) += (if (((g >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counts(j) >= 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** Disjoint variable-width partition of the 64 fingerprint bits into
    * nBands contiguous bands: band b covers [b·64/nBands, (b+1)·64/nBands)
    * (integer math). Variable width matters: a uniform ceil(64/nBands)
    * width makes the last band's shift reach or exceed 64, which the JVM
    * shift wraps mod 64 — bands then duplicate instead of partitioning and
    * the pigeonhole recall guarantee silently breaks for
    * nBands ∈ {9, 12, 14, 15} (maxHamming 8, 11, 13, 14). */
  private[multimodal] def bandRanges(nBands: Int): Seq[(Int, Int)] =
    (0 until nBands).map(b => (b * 64 / nBands, (b + 1) * 64 / nBands))

  /** Near-duplicate pairs over a (media_id, fp) long-fingerprint frame:
    * band the 64 bits into maxHamming + 1 DISJOINT bands ([[bandRanges]]) —
    * h flipped bits can damage at most h bands, so every pair within the
    * threshold shares at least one exact band (pigeonhole; recall is TOTAL
    * for the requested maxHamming, which is why the band count derives from
    * it instead of being fixed) — then verify with the full popcount. */
  def nearDupFingerprints(fps: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 15,
      s"maxHamming must be in [0, 15], got $maxHamming")
    val fp = fps.localCheckpoint() // both self-join sides read the fps once
    val bandCols = bandRanges(maxHamming + 1).zipWithIndex.map {
      case ((start, end), b) =>
        val width = end - start
        val mask = if (width >= 64) -1L else (1L << width) - 1
        struct(lit(b).as("band"),
          shiftrightunsigned(col("fp"), start).bitwiseAND(lit(mask)).as("bh"))
    }
    val bands = fp.select(col("media_id"), col("fp"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("media_id"), col("fp"), col("bb.band"), col("bb.bh"))
    val a = bands.select(col("band"), col("bh"), col("media_id").as("m1"), col("fp").as("f1"))
    val b = bands.select(col("band").as("band2"), col("bh").as("bh2"),
      col("media_id").as("m2"), col("fp").as("f2"))
    a.join(b, col("band") === col("band2") && col("bh") === col("bh2") &&
        col("m1") < col("m2"))
      .select(col("m1"), col("m2"), bit_count(col("f1").bitwiseXOR(col("f2"))).as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }

  /** Near-duplicate media pairs by byte-SimHash fingerprint — same
    * bucket-join shape as the text SimHash path; the blob never shuffles,
    * only (media_id, fp). maxHamming is capped at 15: beyond that bands
    * shrink under 4 bits and the buckets stop discriminating (use embedding
    * ANN instead). */
  def nearDupMedia(media: Dataset[MediaRec], maxHamming: Int = 3): DataFrame = {
    import media.sparkSession.implicits._
    nearDupFingerprints(
      media.map(r => (r.media_id, byteSimhash(r.bytes))).toDF("media_id", "fp"),
      maxHamming)
  }
}
