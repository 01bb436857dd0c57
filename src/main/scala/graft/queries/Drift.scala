package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._

/** Distribution-drift detection between table snapshots (SURVEY.md §2B
  * LLM-data-pipeline extensions): the data-quality gate a continuously
  * ingested training corpus runs before each retraining cut — "did this
  * week's data shift against last week's?".
  *
  * Reference analog: none in code; the monitoring side of the reference's
  * ingestion loop (README's bronze freshness narrative) — *ext*.
  *
  * q_drift_psi computes the Population Stability Index between two
  * deterministic snapshots of orders (orderdate before / from 1998-01-01)
  * over a fixed-width 10-bucket histogram of o_totalprice:
  *
  *   PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)
  *
  * with Laplace smoothing (+0.5 per bucket) so empty buckets stay finite.
  * Engine parity uses the same discipline as q_search_bm25: bucket counts
  * are exact integers, each bucket's double-precision PSI term is floored
  * into 1e-8 units (floor(x·1e8 + 0.5) — identical IEEE expression both
  * engines), and the cross-bucket total is a BIGINT sum, immune to
  * addition order. Output: one row per bucket plus a bucket = -1 total
  * row.
  *
  * Scale shape: two map-side-partial hash aggregates over a 10-value
  * bucket key (a broadcast-sized result regardless of corpus size), one
  * broadcast of the two scalar totals, and a 10-row final join — the
  * entire comparison after the scans is constant-size. At 100 TB each
  * snapshot scan prunes to (o_orderdate, o_totalprice) columns only.
  */
object Drift {

  private val BucketWidth = 50000.0
  private val NBuckets = 10

  /** PSI over a pre-bucketed two-snapshot frame with columns
    * (bucket: int, is_old: boolean). Returns one row per bucket plus a
    * bucket = -1 total row: (bucket, n_old, n_new, psi_micro, psi) with
    * psi_micro in 1e-8 units (BIGINT — the order-independent sum carrier).
    * `smoothBuckets` is the bucket count the +0.5 Laplace smoothing
    * normalizes over (pass the histogram's configured bucket count, not
    * the observed distinct count, so empty buckets don't shift p/q). */
  def psi(bucketed: DataFrame, smoothBuckets: Int): DataFrame = {
    // the ONE corpus-sized operation: a (bucket) hash aggregate whose
    // map-side partial collapses each input partition to ≤ NBuckets rows
    val hist = bucketed.groupBy(col("bucket"))
      .agg(
        sum(when(col("is_old"), 1L).otherwise(0L)).as("n_old"),
        sum(when(!col("is_old"), 1L).otherwise(0L)).as("n_new"))
    // totals via an unpartitioned window — legal precisely because the
    // frame is histogram-sized (≤ NBuckets rows), so no corpus re-scan
    // and no second shuffle of the input
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val perBucket = hist
      .select(col("bucket"), col("n_old"), col("n_new"),
        ((col("n_old") + 0.5) / (sum(col("n_old")).over(all) + 0.5 * smoothBuckets)).as("p"),
        ((col("n_new") + 0.5) / (sum(col("n_new")).over(all) + 0.5 * smoothBuckets)).as("q"))
      .select(col("bucket"), col("n_old"), col("n_new"),
        floor(((col("p") - col("q")) * log(col("p") / col("q"))) * 1e8 + 0.5)
          .cast("long").as("psi_micro"))
    // total row WITHOUT a second plan branch: a union's total branch would
    // re-plan (and statically re-scan) the corpus aggregate, betting on
    // runtime exchange reuse — instead each of the ≤ NBuckets rows fans
    // out to (its bucket, -1) and one tiny re-aggregation yields the
    // per-bucket rows (singleton groups) AND the total in a single
    // pipeline: the corpus is scanned exactly once by construction
    perBucket
      .select(explode(array(col("bucket"), lit(-1))).as("out_bucket"),
        col("n_old"), col("n_new"), col("psi_micro"))
      .groupBy(col("out_bucket"))
      .agg(sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"),
        sum(col("psi_micro")).as("psi_micro"))
      .select(col("out_bucket").as("bucket"), col("n_old"), col("n_new"),
        col("psi_micro"), round(col("psi_micro") / 1e8, 8).as("psi"))
      .orderBy(col("bucket"))
  }

  /** Jensen–Shannon divergence over the same bucketed two-snapshot shape
    * as [[psi]] — the SYMMETRIC, always-finite ([0, ln 2]) drift measure
    * the monitoring literature prefers when either side can have empty
    * buckets (PSI's ln(p/q) needs smoothing to stay finite; JSD's
    * mixture midpoint m = (p+q)/2 never vanishes where either side
    * lives). Identical scale discipline: ONE corpus-sized hash
    * aggregate collapsing to ≤ NBuckets rows map-side, histogram-sized
    * windows for totals, the explode-to-(-1) total-row trick — corpus
    * scanned exactly once by construction. Micro-units are
    * floor(x·1e8 + 0.5) like psi_micro (8-decimal rounding absorbs
    * last-ULP ln differences across engines). */
  def jsd(bucketed: DataFrame, smoothBuckets: Int): DataFrame = {
    val hist = bucketed.groupBy(col("bucket"))
      .agg(
        sum(when(col("is_old"), 1L).otherwise(0L)).as("n_old"),
        sum(when(!col("is_old"), 1L).otherwise(0L)).as("n_new"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val perBucket = hist
      .select(col("bucket"), col("n_old"), col("n_new"),
        ((col("n_old") + 0.5) / (sum(col("n_old")).over(all) + 0.5 * smoothBuckets)).as("p"),
        ((col("n_new") + 0.5) / (sum(col("n_new")).over(all) + 0.5 * smoothBuckets)).as("q"))
      .select(col("bucket"), col("n_old"), col("n_new"),
        floor((lit(0.5) * col("p") * log(col("p") / ((col("p") + col("q")) / 2)) +
          lit(0.5) * col("q") * log(col("q") / ((col("p") + col("q")) / 2))) * 1e8 + 0.5)
          .cast("long").as("jsd_micro"))
    perBucket
      .select(explode(array(col("bucket"), lit(-1))).as("out_bucket"),
        col("n_old"), col("n_new"), col("jsd_micro"))
      .groupBy(col("out_bucket"))
      .agg(sum(col("n_old")).as("n_old"), sum(col("n_new")).as("n_new"),
        sum(col("jsd_micro")).as("jsd_micro"))
      .select(col("out_bucket").as("bucket"), col("n_old"), col("n_new"),
        col("jsd_micro"), round(col("jsd_micro") / 1e8, 8).as("jsd"))
      .orderBy(col("bucket"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic over a bucketed pair of
    * snapshots ((bucket: int, is_old: boolean)) — EXACT integer form: the
    * empirical-CDF gap at bucket b is |cumA/totA − cumB/totB|, compared
    * across buckets by cross-multiplication, so the maximum (and its
    * argmax bucket) is decided in BIGINT arithmetic with no float
    * comparison anywhere; the double `ks` value is derived once at
    * output. Returns ONE row: (at_bucket, d_num, tot_old, tot_new, ks)
    * where ks = d_num / (tot_old·tot_new).
    *
    * Scale shape: identical to [[psi]] — one map-side-partial hash agg on
    * the bucket key, then windows over the bucket-count-sized frame; the
    * cross-multiplied counts stay under 2⁶³ for corpora up to ~3·10⁹ rows
    * per snapshot (document larger corpora would switch to DECIMAL(38)). */
  def ks(bucketed: DataFrame): DataFrame = {
    val hist = bucketed.groupBy(col("bucket"))
      .agg(
        sum(when(col("is_old"), 1L).otherwise(0L)).as("n_old"),
        sum(when(!col("is_old"), 1L).otherwise(0L)).as("n_new"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val cdf = org.apache.spark.sql.expressions.Window
      .partitionBy().orderBy(col("bucket"))
      .rowsBetween(Long.MinValue, 0)
    hist
      .select(col("bucket"),
        sum(col("n_old")).over(cdf).as("cum_old"),
        sum(col("n_new")).over(cdf).as("cum_new"),
        sum(col("n_old")).over(all).as("tot_old"),
        sum(col("n_new")).over(all).as("tot_new"))
      .select(col("bucket").as("at_bucket"),
        abs(col("cum_old") * col("tot_new") - col("cum_new") * col("tot_old"))
          .as("d_num"),
        col("tot_old"), col("tot_new"))
      .orderBy(col("d_num").desc, col("at_bucket"))
      .limit(1)
      .select(col("at_bucket"), col("d_num"), col("tot_old"), col("tot_new"),
        round(col("d_num") / (col("tot_old") * col("tot_new")), 8).as("ks"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Welch's two-sample t-test on order value between the snapshot
    // halves — the parametric member of the drift family (PSI = binned
    // distribution, KS = CDF sup, t = mean shift): "did average order
    // value move, and is the move outside noise?". Engine parity via the
    // q_agg_corr discipline: ONE scalar hash aggregate of exact DECIMAL
    // sums (count/Σx/Σx² per side, conditional), then one shared double
    // formula for mean/variance/t/Welch-dof. One corpus scan, map-side
    // partials, single-row result.
    "q_drift_ttest" -> ((s, dir) => {
      import s.implicits._
      import graft.util.D.dec4
      val o = orders(s, dir).select($"o_totalprice".as("x"),
        ($"o_orderdate" < "1998-01-01").as("is_old"))
      o.agg(
          sum(when($"is_old", 1L).otherwise(0L)).as("n1"),
          sum(when(!$"is_old", 1L).otherwise(0L)).as("n2"),
          sum(when($"is_old", dec4($"x"))).as("s1"),
          sum(when(!$"is_old", dec4($"x"))).as("s2"),
          sum(when($"is_old", dec4($"x") * dec4($"x"))).as("q1"),
          sum(when(!$"is_old", dec4($"x") * dec4($"x"))).as("q2"))
        .select($"n1", $"n2",
          $"n1".cast("double").as("nd1"), $"n2".cast("double").as("nd2"),
          $"s1".cast("double").as("sd1"), $"s2".cast("double").as("sd2"),
          $"q1".cast("double").as("qd1"), $"q2".cast("double").as("qd2"))
        .select($"n1", $"n2",
          round($"sd1" / $"nd1", 4).as("mean_old"),
          round($"sd2" / $"nd2", 4).as("mean_new"),
          (($"qd1" - $"sd1" * $"sd1" / $"nd1") / ($"nd1" - 1.0) / $"nd1").as("se1"),
          (($"qd2" - $"sd2" * $"sd2" / $"nd2") / ($"nd2" - 1.0) / $"nd2").as("se2"),
          $"nd1", $"nd2", $"sd1", $"sd2")
        .select($"n1", $"n2", $"mean_old", $"mean_new",
          round(($"sd1" / $"nd1" - $"sd2" / $"nd2") / sqrt($"se1" + $"se2"), 4).as("t"),
          round(($"se1" + $"se2") * ($"se1" + $"se2") /
            ($"se1" * $"se1" / ($"nd1" - 1.0) + $"se2" * $"se2" / ($"nd2" - 1.0)), 4)
            .as("welch_dof"))
    }),

    // Chi-square independence test on the event_type × snapshot-half
    // contingency table — the CATEGORICAL drift member (PSI bins numerics,
    // KS sups a CDF, t tests a mean; chi-square tests a discrete
    // distribution). All table cells and margins are exact BIGINTs from
    // ONE (event_type, is_old) hash aggregate; the statistic is a shared
    // double formula over them: χ² = Σ (o − e)²/e with e = row·col/total.
    // Output: per-category contributions + a '_total' row with the
    // statistic and dof — the explode-to-total device from psi, single
    // corpus scan.
    "q_drift_chisq" -> ((s, dir) => {
      import s.implicits._
      val e = events(s, dir).select($"event_type",
        (Text.hashBucketExpr($"event_id") < 32768).as("is_old"))
      val cells = e.groupBy($"event_type")
        .agg(sum(when($"is_old", 1L).otherwise(0L)).as("n_old"),
          sum(when(!$"is_old", 1L).otherwise(0L)).as("n_new"))
      val all = org.apache.spark.sql.expressions.Window
        .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
      val contrib = cells
        .select($"event_type", $"n_old", $"n_new",
          sum($"n_old").over(all).cast("double").as("co"),
          sum($"n_new").over(all).cast("double").as("cn"))
        .select($"event_type", $"n_old", $"n_new",
          (($"n_old" + $"n_new").cast("double") * $"co" / ($"co" + $"cn")).as("eo"),
          (($"n_old" + $"n_new").cast("double") * $"cn" / ($"co" + $"cn")).as("en"))
        .select($"event_type", $"n_old", $"n_new",
          floor((($"n_old" - $"eo") * ($"n_old" - $"eo") / $"eo"
            + ($"n_new" - $"en") * ($"n_new" - $"en") / $"en") * 1e8 + 0.5)
            .cast("long").as("chisq_micro"))
      contrib
        .select(explode(array($"event_type", lit("_total"))).as("category"),
          $"n_old", $"n_new", $"chisq_micro")
        .groupBy($"category")
        .agg(sum($"n_old").as("n_old"), sum($"n_new").as("n_new"),
          sum($"chisq_micro").as("chisq_micro"))
        .select($"category", $"n_old", $"n_new", $"chisq_micro",
          round($"chisq_micro" / 1e8, 8).as("chisq"))
        .orderBy($"category")
    }),

    "q_drift_ks" -> ((s, dir) => {
      import s.implicits._
      // finer buckets than PSI (width 10 000 → 50 cells): KS is a sup over
      // the CDF, so resolution matters; still a broadcast-sized histogram
      ks(orders(s, dir).select(
        least(floor($"o_totalprice" / 10000.0), lit(49))
          .cast("int").as("bucket"),
        ($"o_orderdate" < "1998-01-01").as("is_old")))
    }),

    "q_drift_psi" -> ((s, dir) => {
      import s.implicits._
      psi(orders(s, dir).select(
        least(floor($"o_totalprice" / BucketWidth), lit(NBuckets - 1))
          .cast("int").as("bucket"),
        ($"o_orderdate" < "1998-01-01").as("is_old")), NBuckets)
    }),

    // Jensen–Shannon divergence over the same price-bucket snapshot
    // pair — the symmetric, always-finite drift measure beside PSI.
    "q_drift_jsd" -> ((s, dir) => {
      import s.implicits._
      jsd(orders(s, dir).select(
        least(floor($"o_totalprice" / BucketWidth), lit(NBuckets - 1))
          .cast("int").as("bucket"),
        ($"o_orderdate" < "1998-01-01").as("is_old")), NBuckets)
    }),

    // EMBEDDING-SPACE drift (round 18 — the multimodal member of the
    // family): a corpus drifts in embedding space first (encoder swap,
    // domain shift) and no tabular column sees it. Reference = the
    // 4dp per-dimension centroid of the OLD snapshot half (even
    // vec_id — the q_embed_centroid device, bit-identical across
    // engines); every vector's cosine-to-centroid is e4-floored and
    // bucketed into 10 fixed cells of 0.2 cosine width; the SAME psi
    // operator scores old vs new. Scale shape: one dim-sized centroid
    // agg, one narrow cosine pass (centroid broadcast by construction),
    // one histogram agg — constant-size after the scans.
    "q_drift_embedding" -> ((s, dir) =>
      embeddingDriftPsi(embeddings(s, dir)))
  )

  /** q_drift_embedding's core, factored for property tests: reference =
    * 4dp per-dimension centroid of the OLD half (even vec_id), every
    * vector's cosine-to-centroid e4-floored into 10 fixed 0.2-wide
    * cells, old vs new scored by [[psi]]. Identical halves give
    * identical buckets (PSI exactly 0 per bucket); an encoder swap or
    * domain shift moves the cosine mass and PSI catches it — the drift
    * member no tabular column can provide. */
  def embeddingDriftPsi(embs: DataFrame): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"))
    val cent = e.filter(col("vec_id") % 2 === 0)
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(round(avg(col("x")), 4).as("m"))
      .groupBy().agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(transform(col("pm"), _.getField("m")).as("cent"))
    def dotD(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    val v = col("embedding"); val c = col("cent")
    val e4 = when(dotD(v, v) === 0.0 || dotD(c, c) === 0.0, lit(-20000L))
      .otherwise(floor(dotD(v, c) / (sqrt(dotD(v, v)) * sqrt(dotD(c, c)))
        * 10000 + 0.5).cast("long"))
    val scored = e.crossJoin(broadcast(cent))
      .select(col("vec_id"), e4.as("e4"))
    psi(scored.select(
      least(expr("(e4 + 10000) div 2000"), lit((NBuckets - 1).toLong))
        .cast("int").as("bucket"),
      (col("vec_id") % 2 === 0).as("is_old")), NBuckets)
  }

  val oracle: Map[String, String] = Map(
    "q_drift_ttest" ->
      """WITH sums AS (
           SELECT CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                  CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n2,
                  CAST(sum(CASE WHEN is_old THEN CAST(x AS DECIMAL(18,4)) END) AS DOUBLE) AS sd1,
                  CAST(sum(CASE WHEN NOT is_old THEN CAST(x AS DECIMAL(18,4)) END) AS DOUBLE) AS sd2,
                  CAST(sum(CASE WHEN is_old THEN CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4)) END) AS DOUBLE) AS qd1,
                  CAST(sum(CASE WHEN NOT is_old THEN CAST(x AS DECIMAL(19,4)) * CAST(x AS DECIMAL(19,4)) END) AS DOUBLE) AS qd2
           FROM (SELECT o_totalprice AS x,
                        o_orderdate < DATE '1998-01-01' AS is_old
                 FROM orders)),
         d AS (
           SELECT n1, n2,
                  CAST(n1 AS DOUBLE) AS nd1, CAST(n2 AS DOUBLE) AS nd2,
                  sd1, sd2, qd1, qd2 FROM sums),
         se AS (
           SELECT n1, n2, nd1, nd2, sd1, sd2,
                  round(sd1 / nd1, 4) AS mean_old,
                  round(sd2 / nd2, 4) AS mean_new,
                  ((qd1 - sd1 * sd1 / nd1) / (nd1 - 1.0) / nd1) AS se1,
                  ((qd2 - sd2 * sd2 / nd2) / (nd2 - 1.0) / nd2) AS se2
           FROM d)
         SELECT n1, n2, mean_old, mean_new,
                round((sd1 / nd1 - sd2 / nd2) / sqrt(se1 + se2), 4) AS t,
                round((se1 + se2) * (se1 + se2)
                      / (se1 * se1 / (nd1 - 1.0) + se2 * se2 / (nd2 - 1.0)), 4)
                  AS welch_dof
         FROM se""",

    "q_drift_chisq" ->
      """WITH e AS (
           SELECT event_type,
                  CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS INT) < 32768 AS is_old
           FROM events),
         cells AS (
           SELECT event_type,
                  CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                  CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_new
           FROM e GROUP BY 1),
         contrib AS (
           SELECT event_type, n_old, n_new,
                  CAST(floor(((n_old - eo) * (n_old - eo) / eo
                              + (n_new - en) * (n_new - en) / en) * 1e8 + 0.5)
                       AS BIGINT) AS chisq_micro
           FROM (SELECT event_type, n_old, n_new,
                        (CAST(n_old + n_new AS DOUBLE) * co / (co + cn)) AS eo,
                        (CAST(n_old + n_new AS DOUBLE) * cn / (co + cn)) AS en
                 FROM (SELECT event_type, n_old, n_new,
                              CAST(sum(n_old) OVER () AS DOUBLE) AS co,
                              CAST(sum(n_new) OVER () AS DOUBLE) AS cn
                       FROM cells))),
         unioned AS (
           SELECT event_type AS category, n_old, n_new, chisq_micro FROM contrib
           UNION ALL
           SELECT '_total', CAST(sum(n_old) AS BIGINT), CAST(sum(n_new) AS BIGINT),
                  CAST(sum(chisq_micro) AS BIGINT) FROM contrib)
         SELECT category, n_old, n_new, chisq_micro,
                round(chisq_micro / 1e8, 8) AS chisq
         FROM unioned
         ORDER BY category""",

    "q_drift_ks" ->
      """WITH o AS (
           SELECT CAST(least(floor(o_totalprice / 10000.0), 49) AS INT) AS bucket,
                  o_orderdate < DATE '1998-01-01' AS is_old
           FROM orders),
         hist AS (
           SELECT bucket,
                  CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                  CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_new
           FROM o GROUP BY 1),
         cdf AS (
           SELECT bucket,
                  CAST(sum(n_old) OVER (ORDER BY bucket) AS BIGINT) AS cum_old,
                  CAST(sum(n_new) OVER (ORDER BY bucket) AS BIGINT) AS cum_new,
                  CAST(sum(n_old) OVER () AS BIGINT) AS tot_old,
                  CAST(sum(n_new) OVER () AS BIGINT) AS tot_new
           FROM hist)
         SELECT bucket AS at_bucket,
                abs(cum_old * tot_new - cum_new * tot_old) AS d_num,
                tot_old, tot_new,
                round(abs(cum_old * tot_new - cum_new * tot_old)
                      / (tot_old * tot_new), 8) AS ks
         FROM cdf
         ORDER BY d_num DESC, at_bucket
         LIMIT 1""",

    "q_drift_psi" ->
      s"""WITH o AS (
           SELECT CAST(least(floor(o_totalprice / $BucketWidth), ${NBuckets - 1}) AS INT) AS bucket,
                  o_orderdate < DATE '1998-01-01' AS is_old
           FROM orders),
         hist AS (
           SELECT bucket,
                  CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                  CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_new
           FROM o GROUP BY 1),
         totals AS (
           SELECT CAST(sum(n_old) AS BIGINT) AS tot_old,
                  CAST(sum(n_new) AS BIGINT) AS tot_new FROM hist),
         per AS (
           SELECT bucket, n_old, n_new,
                  CAST(floor(((p - q) * ln(p / q)) * 1e8 + 0.5) AS BIGINT) AS psi_micro
           FROM (SELECT bucket, n_old, n_new,
                        (n_old + 0.5) / (tot_old + 0.5 * $NBuckets) AS p,
                        (n_new + 0.5) / (tot_new + 0.5 * $NBuckets) AS q
                 FROM hist, totals)),
         unioned AS (
           SELECT * FROM per
           UNION ALL
           SELECT -1 AS bucket, CAST(sum(n_old) AS BIGINT), CAST(sum(n_new) AS BIGINT),
                  CAST(sum(psi_micro) AS BIGINT) FROM per)
         SELECT bucket, n_old, n_new, psi_micro,
                round(psi_micro / 1e8, 8) AS psi
         FROM unioned
         ORDER BY bucket""",

    "q_drift_jsd" ->
      s"""WITH o AS (
           SELECT CAST(least(floor(o_totalprice / $BucketWidth), ${NBuckets - 1}) AS INT) AS bucket,
                  o_orderdate < DATE '1998-01-01' AS is_old
           FROM orders),
         hist AS (
           SELECT bucket,
                  CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                  CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_new
           FROM o GROUP BY 1),
         totals AS (
           SELECT CAST(sum(n_old) AS BIGINT) AS tot_old,
                  CAST(sum(n_new) AS BIGINT) AS tot_new FROM hist),
         per AS (
           SELECT bucket, n_old, n_new,
                  CAST(floor((0.5 * p * ln(p / ((p + q) / 2))
                            + 0.5 * q * ln(q / ((p + q) / 2))) * 1e8 + 0.5) AS BIGINT) AS jsd_micro
           FROM (SELECT bucket, n_old, n_new,
                        (n_old + 0.5) / (tot_old + 0.5 * $NBuckets) AS p,
                        (n_new + 0.5) / (tot_new + 0.5 * $NBuckets) AS q
                 FROM hist, totals)),
         unioned AS (
           SELECT * FROM per
           UNION ALL
           SELECT -1 AS bucket, CAST(sum(n_old) AS BIGINT), CAST(sum(n_new) AS BIGINT),
                  CAST(sum(jsd_micro) AS BIGINT) FROM per)
         SELECT bucket, n_old, n_new, jsd_micro,
                round(jsd_micro / 1e8, 8) AS jsd
         FROM unioned
         ORDER BY bucket""",

    "q_drift_embedding" ->
      s"""WITH cent AS MATERIALIZED (
           SELECT list(m ORDER BY pos) AS cent FROM (
             SELECT pos, round(avg(CAST(x AS DOUBLE)), 4) AS m
             FROM (SELECT unnest(embedding) AS x,
                          unnest(range(len(embedding))) AS pos
                   FROM embeddings WHERE vec_id % 2 = 0)
             GROUP BY 1)),
         scored AS (
           SELECT e.vec_id,
                  CASE WHEN list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
                         OR list_sum(list_transform(c.cent, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) = 0
                       THEN -20000
                       ELSE CAST(floor(
                         list_sum(list_transform(list_zip(e.embedding, c.cent),
                           x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
                         / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                            * sqrt(list_sum(list_transform(c.cent, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
                         * 10000 + 0.5) AS BIGINT) END AS e4
           FROM embeddings e, cent c),
         o AS (
           SELECT CAST(least((e4 + 10000) // 2000, ${NBuckets - 1}) AS INT) AS bucket,
                  vec_id % 2 = 0 AS is_old
           FROM scored),
         hist AS (
           SELECT bucket,
                  CAST(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
                  CAST(sum(CASE WHEN NOT is_old THEN 1 ELSE 0 END) AS BIGINT) AS n_new
           FROM o GROUP BY 1),
         totals AS (
           SELECT CAST(sum(n_old) AS BIGINT) AS tot_old,
                  CAST(sum(n_new) AS BIGINT) AS tot_new FROM hist),
         per AS (
           SELECT bucket, n_old, n_new,
                  CAST(floor(((p - q) * ln(p / q)) * 1e8 + 0.5) AS BIGINT) AS psi_micro
           FROM (SELECT bucket, n_old, n_new,
                        (n_old + 0.5) / (tot_old + 0.5 * $NBuckets) AS p,
                        (n_new + 0.5) / (tot_new + 0.5 * $NBuckets) AS q
                 FROM hist, totals)),
         unioned AS (
           SELECT * FROM per
           UNION ALL
           SELECT -1 AS bucket, CAST(sum(n_old) AS BIGINT), CAST(sum(n_new) AS BIGINT),
                  CAST(sum(psi_micro) AS BIGINT) FROM per)
         SELECT bucket, n_old, n_new, psi_micro,
                round(psi_micro / 1e8, 8) AS psi
         FROM unioned
         ORDER BY bucket"""
  )
}
