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
         ORDER BY kind"""
  )
}
