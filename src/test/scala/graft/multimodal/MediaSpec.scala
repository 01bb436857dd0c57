package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Media.MediaRec

/** Multimodal plumbing tests: schema, batch-shaped partition processing,
  * modality routing, determinism, and blob-pruned feature output. */
class MediaSpec extends SparkSpec {

  private def mkBytes(seed: Int, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 251).toByte)

  private lazy val media = {
    import spark.implicits._
    Seq(
      MediaRec(1L, "image", mkBytes(1, 1024), 64, 48, 0, 0L),
      MediaRec(2L, "image", mkBytes(2, 2048), 128, 96, 0, 0L),
      MediaRec(3L, "audio", mkBytes(3, 4096), 0, 0, 16000, 3000L),
      MediaRec(4L, "video", mkBytes(4, 8192), 320, 240, 0, 5000L),
      MediaRec(5L, "other", Array.emptyByteArray, 0, 0, 0, 0L)
    ).toDS().repartition(2).cache()
  }

  test("extractFeatures: fixed-width rows, deterministic checksums per payload") {
    val feats = Media.extractFeatures(media).collect()
    assert(feats.length === 5)
    val img = feats.find(_.media_id == 1L).get
    assert(img.feature.length === 8)
    assert(img.n_bytes === 1024L)
    // determinism: re-running yields identical checksums and features
    val again = Media.extractFeatures(media).collect()
    assert(feats.map(f => (f.media_id, f.checksum)).toSet ===
      again.map(f => (f.media_id, f.checksum)).toSet)
  }

  test("modality routing: audio and image payloads use different extractors") {
    val feats = Media.extractFeatures(media)
    val byId = feats.collect().map(f => f.media_id -> f).toMap
    assert(!byId(1L).feature.sameElements(byId(3L).feature))
    assert(byId(5L).feature.isEmpty) // unknown modality → empty features
  }

  test("MediaCodec boundary: a custom codec swaps in without pipeline changes") {
    // a "real" decoder stand-in: constant-valued features, distinguishable
    // from StubCodecs output — proves the pipeline routes through the trait
    object FlatCodec extends Media.MediaCodec {
      def decodeImage(bytes: Array[Byte]): Array[Float] = Array.fill(4)(7f)
      def resize(px: Array[Float], w: Int, h: Int, tw: Int, th: Int): Array[Float] = px
      def audioFeatures(bytes: Array[Byte], sampleRate: Int): Array[Float] = Array.fill(4)(9f)
      def sampleFrames(bytes: Array[Byte], everyMs: Long, durationMs: Long): Seq[(Int, Array[Byte])] =
        Seq((0, bytes.take(1)))
    }
    val feats = Media.extractFeatures(media, FlatCodec).collect()
      .map(f => f.media_id -> f).toMap
    assert(feats(1L).feature.toSeq === Seq(7f, 7f, 7f, 7f))
    assert(feats(3L).feature.toSeq === Seq(9f, 9f, 9f, 9f))
    assert(feats(4L).feature.toSeq === Seq(7f, 7f, 7f, 7f)) // video → frame → image decode
    // checksums are codec-independent (raw payload property)
    val stub = Media.extractFeatures(media).collect().map(f => f.media_id -> f.checksum).toMap
    assert(feats.view.mapValues(_.checksum).toMap === stub)
    val frames = Media.sampleVideoFrames(media, 1000L, FlatCodec).collect()
    assert(frames.length === 1 && frames.head.getAs[Int]("frame_index") === 0)
  }

  test("resizeImages: only image rows change, payloads untouched") {
    val resized = Media.resizeImages(media, 32, 32).collect()
    val img = resized.find(_.media_id == 1L).get
    assert(img.width === 32 && img.height === 32)
    val aud = resized.find(_.media_id == 3L).get
    assert(aud.width === 0 && aud.sample_rate === 16000)
    assert(img.bytes.length === 1024)
  }

  test("sampleVideoFrames: one row per frame, generator shape") {
    val frames = Media.sampleVideoFrames(media, everyMs = 1000L)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("media_id") == 4L))
    val idx = rows.map(_.getAs[Int]("frame_index")).sorted
    assert(idx.toSeq === (0 until idx.length))
  }

  /** LCG byte stream — mkBytes' arithmetic progression is degenerate for
    * shingle tests (every seed yields the same window SET mod 251, so all
    * its fingerprints collide by construction). */
  private def mkRandBytes(seed: Long, n: Int): Array[Byte] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 56).toByte
    }
  }

  test("byte simhash near-dup: corrupted copy found, unrelated payloads not") {
    import spark.implicits._
    val base = mkRandBytes(7L, 4096)
    val corrupted = base.clone()
    corrupted(100) = (corrupted(100) ^ 0x5).toByte // a few flipped bytes
    corrupted(2000) = (corrupted(2000) ^ 0x3).toByte
    val corpus = Seq(
      MediaRec(10L, "image", base, 64, 48, 0, 0L),
      MediaRec(11L, "image", corrupted, 64, 48, 0, 0L),
      MediaRec(12L, "image", base.clone(), 64, 48, 0, 0L), // exact copy
      MediaRec(13L, "image", mkRandBytes(99L, 4096), 64, 48, 0, 0L), // unrelated
      MediaRec(14L, "audio", mkRandBytes(55L, 2048), 0, 0, 8000, 0L)) // unrelated
      .toDS()
    val pairs = Media.nearDupMedia(corpus, maxHamming = 3)
      .select("m1", "m2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // base, its corrupted variant and its exact copy all pair; nothing else
    assert(pairs === Set((10L, 11L), (10L, 12L), (11L, 12L)))
    // exact copy has hamming 0; fingerprint is a pure function of bytes
    assert(Media.byteSimhash(base) === Media.byteSimhash(base.clone()))
    assert(java.lang.Long.bitCount(
      Media.byteSimhash(base) ^ Media.byteSimhash(corrupted)) <= 3)
  }

  test("bandRanges: disjoint cover of all 64 bits for every legal band count") {
    (1 to 16).foreach { nBands =>
      val ranges = Media.bandRanges(nBands)
      assert(ranges.length === nBands)
      // contiguous, disjoint, covering [0, 64): each band starts where the
      // previous ended, first at 0, last at 64, every band non-empty
      assert(ranges.head._1 === 0)
      assert(ranges.last._2 === 64)
      ranges.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(e1 === s2)
        case _ =>
      }
      assert(ranges.forall { case (s, e) => e > s })
    }
  }

  test("near-dup recall holds at maxHamming=8 (the wrap-around band widths)") {
    // Adversarial pair: 8 flipped bits at positions 0,8,…,56 — one per band
    // of the OLD uniform-ceil-width scheme, where band 8's shift of 64
    // wrapped to 0 and duplicated band 0, leaving only 8 distinct bands all
    // damaged → pair missed despite hamming = maxHamming. The disjoint
    // 9-band partition leaves at least one band untouched (pigeonhole), so
    // the pair MUST be found.
    val f1 = 0x0123456789abcdefL
    val flips = (0 until 8).map(i => 1L << (8 * i)).reduce(_ | _)
    val f2 = f1 ^ flips
    assert(java.lang.Long.bitCount(f1 ^ f2) === 8)
    import spark.implicits._
    val fps = Seq((1L, f1), (2L, f2)).toDF("media_id", "fp")
    val pairs = Media.nearDupFingerprints(fps, maxHamming = 8)
      .select("m1", "m2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("featureTable: blob column pruned from the shuffle-facing output") {
    val ft = Media.featureTable(media)
    assert(!ft.columns.contains("bytes"))
    assert(ft.columns.toSet === Set("media_id", "kind", "n_bytes", "checksum", "feature"))
  }
}
