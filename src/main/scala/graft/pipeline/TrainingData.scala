package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** End-to-end training-data curation — the composition the individual
  * operators exist for (north star: dedup + quality + similarity +
  * multimodal + reproducible splits at 100 TB):
  *
  *   quality gate → MinHash-LSH near-dedup (keep lowest doc_id per dup
  *   cluster) → multimodal feature join → reproducible md5-bucket split.
  *
  * Every stage is a DataFrame transform: the pipeline is one Catalyst plan
  * per output, shuffles only at the LSH bucket join, the dedup anti-join,
  * the embedding join, and nothing else. No driver-side loops.
  */
object TrainingData {

  case class Config(
    minQuality: Double = 0.3, // uniq_ratio · (1 − stop_ratio) gate
    dedupJaccard: Double = 0.8, // near-dup threshold (token-set Jaccard)
    trainBucket: Int = 52429, // ~80% of 65536
    valBucket: Int = 58982) // next ~10%; rest = test

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in")

  /** Per-doc quality score (same algebra as q_text_quality). */
  def withQuality(docs: DataFrame): DataFrame = {
    val toks = split(col("text"), " ")
    docs.withColumn("quality",
      (size(array_distinct(toks)).cast("double") / size(toks)) *
        (lit(1.0) -
          size(array_intersect(toks, array(stopwords.map(lit): _*))).cast("double") /
            size(toks)))
  }

  /** Near-dup removal: for every verified duplicate pair keep the LOWER
    * doc_id (deterministic cluster representative); drop the rest via
    * anti-join. LSH banding bounds the candidate set — no all-pairs. */
  def dropNearDups(docs: DataFrame, threshold: Double): DataFrame = {
    val losers = Dedup.minhashNearDups(docs, threshold)
      .select(col("d2").as("doc_id")).distinct()
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Reproducible split assignment (same md5-bucket algebra as
    * q_sample_hash). */
  def withSplit(docs: DataFrame, cfg: Config): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
      .cast("int")
    docs.withColumn("bucket", bucket)
      .withColumn("split",
        when(col("bucket") < cfg.trainBucket, "train")
          .when(col("bucket") < cfg.valBucket, "val")
          .otherwise("test"))
  }

  /** Full curation: gate → dedup → feature join → split. */
  def curate(docs: DataFrame, embeddings: DataFrame,
      cfg: Config = Config()): DataFrame = {
    val gated = withQuality(docs).filter(col("quality") >= cfg.minQuality)
    val deduped = dropNearDups(gated, cfg.dedupJaccard)
    val joined = deduped.join(
      embeddings.select(col("vec_id").as("doc_id"), col("embedding"), col("label")),
      Seq("doc_id"), "left")
    withSplit(joined, cfg)
      .select("doc_id", "lang", "text", "quality", "embedding", "label",
        "bucket", "split")
  }
}
