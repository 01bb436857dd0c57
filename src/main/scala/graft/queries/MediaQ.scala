package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.multimodal.Media

/** Oracle-checked query surface for the multimodal pipeline
  * (SURVEY.md §2B "multimodal columns").
  *
  * The media fixture is derived deterministically from the `documents`
  * table (payload = UTF-8 bytes of `text`, modality = doc_id % 3), so the
  * REAL pipeline — typed Dataset, per-partition batched extraction
  * ([[Media.extractFeatures]]'s mapPartitions, the mapInPandas analog),
  * MD5 checksumming, modality routing — runs end-to-end and DuckDB can
  * recompute the aggregate from the same parquet: the md5-of-md5s chain
  * is codec-independent (checksums hash the raw payload, not decoded
  * frames), which is exactly what makes the stub-codec pipeline
  * oracle-checkable.
  *
  * Scale notes: blobs never shuffle — extractFeatures is a narrow map and
  * only (kind, n_bytes, checksum, 8-float feature) rows reach the
  * aggregation. The ordered listagg-of-checksums is the oracle-parity
  * device for a 500-doc fixture; a 100 TB corpus manifest check would use
  * a commutative checksum (sum of 64-bit hashes) instead — same plan
  * shape, constant-size state.
  */
object MediaQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_media_features" -> ((s, dir) => {
      import s.implicits._
      val media = documents(s, dir)
        .filter($"text".isNotNull)
        .select($"doc_id", $"text").as[(Long, String)]
        .map { case (id, text) =>
          val kind = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          Media.MediaRec(id, kind, text.getBytes("UTF-8"),
            width = 64, height = 48, sample_rate = 16000, duration_ms = 4000L)
        }
      Media.extractFeatures(media).toDF()
        .groupBy($"kind")
        .agg(
          count(lit(1)).as("n_media"),
          sum($"n_bytes").as("total_bytes"),
          // per-kind manifest digest: md5 over the media_id-ordered
          // concatenation of per-payload md5s
          md5(encode(
            expr("listagg(checksum, '') WITHIN GROUP (ORDER BY media_id)"),
            "UTF-8")).as("checksum_agg"),
          // routing guard: every modality's stub codec emits an 8-wide
          // feature; a broken route (→ empty feature) would show up here
          sum(size($"feature")).as("n_feature_vals"))
        .orderBy($"kind")
    }),

    // Content-addressable media dedup: the binary-column analog of
    // q_dedup_exact — duplicate payloads are found by md5 checksum
    // equi-grouping (the per-partition digest from extractFeatures), never
    // by comparing blobs: payloads stay where they were read, only
    // (media_id, 32-char checksum) rows shuffle. Duplicates are planted
    // deterministically (docs < 50 re-ingested under media_id + 10000 —
    // the re-upload scenario); keeper = min media_id per digest group.
    "q_media_dedup" -> ((s, dir) => {
      import s.implicits._
      val base = documents(s, dir)
        .filter($"text".isNotNull)
        .select($"doc_id", $"text")
      val replayed = base.filter($"doc_id" < 50)
        .select(($"doc_id" + 10000L).as("doc_id"), $"text")
      val media = base.unionByName(replayed).as[(Long, String)]
        .map { case (id, text) =>
          val kind = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          Media.MediaRec(id, kind, text.getBytes("UTF-8"),
            width = 64, height = 48, sample_rate = 16000, duration_ms = 4000L)
        }
      Media.extractFeatures(media).toDF()
        .groupBy($"checksum")
        .agg(count(lit(1)).as("n_copies"),
          min($"media_id").as("keeper"),
          sum($"n_bytes").as("total_bytes"),
          max($"n_bytes").as("one_size"))
        .filter($"n_copies" > 1)
        // identical digests ⇒ identical payloads ⇒ reclaim = total − one
        // copy (pure integer arithmetic — no division to diverge on)
        .select($"checksum", $"n_copies", $"keeper",
          ($"total_bytes" - $"one_size").cast("long").as("reclaimable_bytes"))
        .orderBy($"checksum")
    }),

    // Frame sampling (A11's generator shape applied to media): video rows
    // explode into one row per sampled frame via Media.sampleVideoFrames
    // (stub codec: every k-th byte window is a "frame" — deterministic, so
    // DuckDB can recompute the identical slices). The fixture text is pure
    // ASCII at every SF (verified: octet_length(encode(text)) == len(text)
    // for all rows), so the oracle's char-based substring equals the
    // Spark side's byte slicing and md5(VARCHAR) equals md5(payload
    // bytes); the driver compare would flag any fixture drift. Scale
    // shape: a narrow flatMap — frames never shuffle; only the id, index,
    // width and digest columns reach the sort.
    "q_media_frames" -> ((s, dir) => {
      import s.implicits._
      val media = documents(s, dir)
        .filter($"text".isNotNull)
        .select($"doc_id", $"text").as[(Long, String)]
        .map { case (id, text) =>
          val kind = (id % 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          }
          Media.MediaRec(id, kind, text.getBytes("UTF-8"),
            width = 64, height = 48, sample_rate = 16000, duration_ms = 4000L)
        }
      Media.sampleVideoFrames(media, everyMs = 1000L)
        .select($"media_id", $"frame_index",
          length($"frame_bytes").as("n_frame_bytes"),
          md5($"frame_bytes").as("frame_md5"))
        .orderBy($"media_id", $"frame_index")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_media_features" ->
      """SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
                count(*) AS n_media,
                CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
                md5(string_agg(md5(text), '' ORDER BY doc_id)) AS checksum_agg,
                CAST(count(*) * 8 AS BIGINT) AS n_feature_vals
         FROM documents
         WHERE text IS NOT NULL
         GROUP BY 1
         ORDER BY kind""",

    "q_media_dedup" ->
      """WITH base AS (
           SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
         media AS (
           SELECT doc_id AS media_id, text FROM base
           UNION ALL
           SELECT doc_id + 10000 AS media_id, text FROM base WHERE doc_id < 50)
         SELECT md5(text) AS checksum,
                CAST(count(*) AS BIGINT) AS n_copies,
                min(media_id) AS keeper,
                CAST(sum(octet_length(encode(text))) -
                     max(octet_length(encode(text))) AS BIGINT) AS reclaimable_bytes
         FROM media
         GROUP BY 1
         HAVING count(*) > 1
         ORDER BY checksum""",

    // replicates the stub frame sampler: nFrames = max(1, 4000/1000) = 4,
    // win = max(1, len/4), frame i = bytes[i*win, (i+1)*win) for
    // i < min(4, len) — char substring == byte slice on the ASCII fixture
    "q_media_frames" ->
      """SELECT doc_id AS media_id, CAST(i AS INT) AS frame_index,
                CAST(len(fb) AS INT) AS n_frame_bytes,
                md5(fb) AS frame_md5
         FROM (
           SELECT doc_id, i,
                  substring(text, CAST(i * win + 1 AS INT), CAST(win AS INT)) AS fb
           FROM (
             SELECT doc_id, text, greatest(1, len(text) // 4) AS win,
                    unnest(range(0, least(4, len(text)))) AS i
             FROM documents
             WHERE doc_id % 3 = 2 AND text IS NOT NULL))
         ORDER BY media_id, frame_index"""
  )
}
