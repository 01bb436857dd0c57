package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables._
import graft.util.D._

/** Scalar-function surface (SURVEY.md §2B "Scalar functions"):
  * string / regex / hex+hash / date / epoch / math / conditional / cast /
  * array / map / json / explode round-trip.
  *
  * Reference analogs: hex-string hash/address handling
  * (`/root/reference/src/streams/consumers/evm_consumer.rs:43-45,82-83`),
  * unix→timestamp conversion (`evm_consumer.rs:71`), coalesce defaults
  * (`evm_consumer.rs:46-48`), TEXT numerics + narrowing casts
  * (`/root/reference/migrations/0001_initial.sql:14-15,34-37`,
  * `evm_consumer.rs:66-70`), JSON messages (`evm_producer.rs:46`), and the
  * block→transactions explode (`evm_consumer.rs:124-126` — A11, the
  * reference's signature reshaping op, exercised here as nest∘explode = id).
  *
  * Scale notes: everything here is a narrow per-row projection — one codegen
  * stage fused with the scan, no shuffle except the deterministic output sort.
  * All functions are built-in Catalyst expressions (codegen'd); no UDFs.
  *
  * DuckDB parity notes (empirically probed, duckdb 1.0.0):
  * hex/to_hex both uppercase; md5/sha256 both lowercase; regexp_extract
  * no-match → '' on both; DuckDB extract(dow) is 0-based Sunday vs Spark
  * dayofweek 1-based → oracle adds 1; DuckDB epoch() is DOUBLE with
  * fraction vs Spark unix_timestamp LONG → oracle floors; DuckDB floor()
  * keeps DECIMAL → oracle casts BIGINT.
  */
object Funcs {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_funcs" -> ((s, dir) => {
      import s.implicits._
      part(s, dir)
        .select(
          $"p_partkey",
          upper($"p_name").as("up"),
          lower($"p_type").as("lo"),
          trim(concat(lit("  "), $"p_name", lit(" "))).as("trimmed"),
          substring($"p_name", 1, 5).as("sub5"),
          concat($"p_brand", lit("-"), $"p_type").as("brand_type"),
          length($"p_name").as("len"),
          regexp_replace($"p_name", lit(" "), lit("_")).as("snake"),
          lpad($"p_size".cast("string"), 4, "0").as("size4"),
          // array_join-serialized so the driver's pandas comparator can
          // sort/hash it (raw ARRAY columns are unhashable there); the
          // split() semantics stay in the query body.
          array_join(split($"p_name", " "), "|").as("toks"))
        .orderBy($"p_partkey")
    }),

    "q_regex_funcs" -> ((s, dir) => {
      import s.implicits._
      part(s, dir)
        .select(
          $"p_partkey",
          regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
          regexp_extract($"p_brand", "([0-9]+)", 1).as("brand_num"),
          regexp_replace($"p_name", "[aeiou]", "*").as("devowel"),
          $"p_name".rlike("^(small|large)").as("is_sized"))
        .orderBy($"p_partkey")
    }),

    "q_hex_hash_funcs" -> ((s, dir) => {
      import s.implicits._
      part(s, dir)
        .select(
          $"p_partkey",
          hex($"p_partkey").as("key_hex"),
          lower(hex($"p_name")).as("name_hex"),
          // unhex∘hex round trip back to the original string
          decode(unhex(hex($"p_name")), "UTF-8").as("name_rt"),
          md5($"p_name").as("name_md5"),
          sha2($"p_name", 256).as("name_sha256"))
        .orderBy($"p_partkey")
    }),

    "q_date_funcs" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofmonth($"o_orderdate").as("d"),
          date_trunc("month", $"o_orderdate").as("month_start"),
          datediff(lit("1998-01-01").cast("date"), $"o_orderdate").as("days_to_98"),
          date_add($"o_orderdate".cast("date"), 30).as("plus30"),
          dayofweek($"o_orderdate").as("dow"),
          last_day($"o_orderdate").as("eom"))
        .orderBy($"o_orderkey")
    }),

    "q_unix_ts" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .select(
          $"event_id",
          unix_timestamp($"ts").as("epoch_s"),
          // round trip: epoch seconds → timestamp (second precision)
          timestamp_seconds(unix_timestamp($"ts")).as("ts_rt"),
          (unix_timestamp($"ts") % 86400).as("sec_of_day"))
        .orderBy($"event_id")
    }),

    "q_math_funcs" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select(
          $"o_orderkey",
          round($"o_totalprice", 1).as("r1"),
          floor($"o_totalprice").as("fl"),
          ceil($"o_totalprice").as("ce"),
          abs($"o_totalprice" - 100000).as("dist"),
          r4(pow($"o_totalprice", 0.5)).as("pw"),
          r4(sqrt($"o_totalprice")).as("sq"),
          // pow(x, 0.5)/sqrt are correctly-rounded IEEE in both engines'
          // libms (portable under round); ln is NOT guaranteed to be, so
          // it follows the floor-quantized BIGINT convention. NOTE: the
          // quantization relocates, not removes, the sensitive boundary —
          // a last-ULP libm difference still flips the BIGINT when
          // ln(x)*1e4 lands adjacent to an integer, so portability is
          // probabilistic (no hit observed across sf0.001–0.1), not
          // guaranteed; kept for consistency with avg_nll_e4.
          floor(log($"o_totalprice") * 1e4).cast("long").as("lg_e4"),
          ($"o_orderkey" % 7).as("md"),
          signum($"o_totalprice" - 100000).cast("int").as("sg"))
        .orderBy($"o_orderkey")
    }),

    "q_conditional" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select(
          $"o_orderkey",
          when($"o_totalprice" > 200000, "big")
            .when($"o_totalprice" > 50000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("st"),
          greatest($"o_totalprice", lit(100000.0)).as("hi"),
          least($"o_totalprice", lit(100000.0)).as("lo"))
        .orderBy($"o_orderkey")
    }),

    "q_cast_types" -> ((s, dir) => {
      import s.implicits._
      orders(s, dir)
        .select(
          $"o_orderkey",
          $"o_orderkey".cast("string").as("key_s"),
          $"o_orderkey".cast("string").cast("long").as("key_rt"),
          $"o_orderkey".cast("double").as("key_d"),
          // upscale to DECIMAL(18,4) is exact (source has 2 decimals);
          // never downscale — DuckDB truncates where Spark rounds.
          r4($"o_totalprice".cast("decimal(18,4)")).as("price_dec"),
          // big-decimal string beyond int64, the U256-string policy probe
          lit("123456789012345678.7654").cast("decimal(38,4)").cast("double").as("big_dec"),
          $"o_orderdate".cast("date").as("od"),
          $"o_orderdate".cast("date").cast("string").as("od_s"),
          lit("2024-02-29 12:30:45").cast("timestamp").as("lit_ts"))
        .orderBy($"o_orderkey")
    }),

    "q_array_funcs" -> ((s, dir) => {
      import s.implicits._
      embeddings(s, dir)
        .select(
          $"vec_id",
          size($"embedding").as("dim"),
          element_at($"embedding", 3).as("e3"),
          // slice() stays under test, but floats serialize non-portably
          // (Spark "1.0E-4" vs DuckDB "0.0001"), so emit the sliced
          // elements as rounded double scalars instead of a raw array
          // (raw ARRAY output is unhashable in the driver's comparator).
          round(element_at(slice($"embedding", 1, 4), 1).cast("double"), 4).as("h1"),
          round(element_at(slice($"embedding", 1, 4), 4).cast("double"), 4).as("h4"),
          array_contains(transform($"embedding", x => x > 0.2f), lit(true)).as("has_big"),
          // sum of squares via higher-order aggregate, double math throughout
          round(aggregate(
            transform($"embedding", x => x.cast("double") * x.cast("double")),
            lit(0.0),
            (acc, x) => acc + x), 4).as("sum_sq"))
        .orderBy($"vec_id")
    }),

    // time-series gap-fill: date spine via sequence+explode, left join,
    // zero-fill — the standard resample pattern (no native ASOF/resample
    // operator needed).
    "q_timeseries_gapfill" -> ((s, dir) => {
      import s.implicits._
      val o = orders(s, dir)
      val bounds = o.agg(
        min($"o_orderdate".cast("date")).as("d0"),
        max($"o_orderdate".cast("date")).as("d1"))
      val spine = bounds.select(
        explode(sequence($"d0", $"d1", expr("INTERVAL 1 DAY"))).as("day"))
      val daily = o.groupBy($"o_orderdate".cast("date").as("day"))
        .agg(count(lit(1)).as("n_orders"))
      spine.join(daily, Seq("day"), "left")
        .select($"day", coalesce($"n_orders", lit(0L)).as("n_orders"))
        .orderBy($"day")
    }),

    // edit distance between part names within a bounded pair set.
    "q_str_distance" -> ((s, dir) => {
      import s.implicits._
      val p = part(s, dir).filter($"p_partkey" < 30)
      val a = p.select($"p_partkey".as("k1"), $"p_name".as("n1"))
      val b = p.select($"p_partkey".as("k2"), $"p_name".as("n2"))
      a.join(b, $"k1" < $"k2")
        .select($"k1", $"k2", levenshtein($"n1", $"n2").as("dist"))
        .orderBy($"k1", $"k2")
    }),

    // regex tokenization: extract-all word tokens (vs whitespace split).
    "q_regex_tokenize" -> ((s, dir) => {
      import s.implicits._
      documents(s, dir)
        .filter($"doc_id" < 100)
        .select(
          $"doc_id",
          // serialized via array_join for the driver comparator; the
          // regexp_extract_all list semantics stay in the body.
          array_join(regexp_extract_all($"text", lit("[a-z]+"), lit(0)), "|").as("words"),
          size(regexp_extract_all($"text", lit("[a-z]+"), lit(0))).as("n_words"),
          size(regexp_extract_all($"text", lit("[aeiou]{2,}"), lit(0))).as("n_vowel_runs"))
        .orderBy($"doc_id")
    }),

    "q_map_funcs" -> ((s, dir) => {
      import s.implicits._
      region(s, dir)
        .select($"r_regionkey",
          explode(map_from_arrays(
            array(lit("name"), lit("key")),
            array($"r_name", $"r_regionkey".cast("string")))).as(Seq("k", "v")))
        .orderBy($"r_regionkey", $"k")
    }),

    "q_json_extract" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .select(
          $"event_id",
          get_json_object($"props", "$.k").as("k_str"),
          get_json_object($"props", "$.k").cast("long").as("k_num"),
          get_json_object($"props", "$.missing").as("absent"))
        .orderBy($"event_id")
    }),

    // Spark 4 VariantType path: parse the JSON ONCE into the binary
    // variant encoding, then field-extract from the variant — the
    // modern replacement for per-path get_json_object re-parsing (each
    // get_json_object call re-parses the string; variant parses once and
    // navigates an indexed binary). Output is plain (long, string) so the
    // DuckDB oracle reads the same JSON with its own json functions.
    "q_json_variant" -> ((s, dir) => {
      import s.implicits._
      events(s, dir)
        .select($"event_id", parse_json($"props").as("v"))
        .select($"event_id",
          variant_get($"v", "$.k", "bigint").as("k_num"),
          variant_get($"v", "$.k", "string").as("k_str"),
          variant_get($"v", "$.missing", "string").as("absent"))
        .groupBy()
        .agg(count(lit(1)).as("n"),
          sum($"k_num").as("sum_k"),
          count($"absent").as("n_absent"),
          countDistinct($"k_str").as("nd_k"))
    }),

    // A11 as an algebraic law: nest lineitem per order, explode back — the
    // composition is the identity on (orderkey, linenumber, quantity).
    "q_explode_roundtrip" -> ((s, dir) => {
      import s.implicits._
      lineitem(s, dir)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_list(struct($"l_linenumber", $"l_quantity"))).as("lines"))
        .select($"l_orderkey", explode($"lines").as("ln"))
        .select($"l_orderkey",
          $"ln.l_linenumber".as("l_linenumber"),
          $"ln.l_quantity".as("l_quantity"))
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
                upper(p_name) AS up,
                lower(p_type) AS lo,
                trim(concat('  ', p_name, ' ')) AS trimmed,
                substring(p_name, 1, 5) AS sub5,
                concat(p_brand, '-', p_type) AS brand_type,
                CAST(length(p_name) AS INT) AS len,
                replace(p_name, ' ', '_') AS snake,
                lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
                array_to_string(string_split(p_name, ' '), '|') AS toks
         FROM part ORDER BY p_partkey""",

    "q_regex_funcs" ->
      """SELECT p_partkey,
                regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
                regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
                regexp_replace(p_name, '[aeiou]', '*', 'g') AS devowel,
                regexp_matches(p_name, '^(small|large)') AS is_sized
         FROM part ORDER BY p_partkey""",

    "q_hex_hash_funcs" ->
      """SELECT p_partkey,
                to_hex(p_partkey) AS key_hex,
                lower(hex(p_name)) AS name_hex,
                CAST(unhex(hex(p_name)) AS VARCHAR) AS name_rt,
                md5(p_name) AS name_md5,
                sha256(p_name) AS name_sha256
         FROM part ORDER BY p_partkey""",

    "q_date_funcs" ->
      """SELECT o_orderkey,
                CAST(year(o_orderdate) AS INT) AS y,
                CAST(month(o_orderdate) AS INT) AS m,
                CAST(day(o_orderdate) AS INT) AS d,
                CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
                CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
                CAST(o_orderdate AS DATE) + 30 AS plus30,
                CAST(extract(dow FROM o_orderdate) + 1 AS INT) AS dow,
                last_day(CAST(o_orderdate AS DATE)) AS eom
         FROM orders ORDER BY o_orderkey""",

    "q_unix_ts" ->
      """SELECT event_id,
                CAST(floor(extract(epoch FROM ts)) AS BIGINT) AS epoch_s,
                CAST(to_timestamp(CAST(floor(extract(epoch FROM ts)) AS BIGINT)) AS TIMESTAMP) AS ts_rt,
                CAST(floor(extract(epoch FROM ts)) AS BIGINT) % 86400 AS sec_of_day
         FROM events ORDER BY event_id""",

    "q_math_funcs" ->
      """SELECT o_orderkey,
                round(o_totalprice, 1) AS r1,
                CAST(floor(o_totalprice) AS BIGINT) AS fl,
                CAST(ceil(o_totalprice) AS BIGINT) AS ce,
                abs(o_totalprice - 100000) AS dist,
                round(CAST(pow(o_totalprice, 0.5) AS DOUBLE), 4) AS pw,
                round(CAST(sqrt(o_totalprice) AS DOUBLE), 4) AS sq,
                CAST(floor(ln(o_totalprice) * 1e4) AS BIGINT) AS lg_e4,
                o_orderkey % 7 AS md,
                CAST(sign(o_totalprice - 100000) AS INT) AS sg
         FROM orders ORDER BY o_orderkey""",

    "q_conditional" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice > 200000 THEN 'big'
                     WHEN o_totalprice > 50000 THEN 'mid'
                     ELSE 'small' END AS bucket,
                coalesce(nullif(o_orderstatus, 'O'), 'open') AS st,
                greatest(o_totalprice, 100000.0) AS hi,
                least(o_totalprice, 100000.0) AS lo
         FROM orders ORDER BY o_orderkey""",

    "q_cast_types" ->
      """SELECT o_orderkey,
                CAST(o_orderkey AS VARCHAR) AS key_s,
                CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_rt,
                CAST(o_orderkey AS DOUBLE) AS key_d,
                round(CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE), 4) AS price_dec,
                CAST(CAST('123456789012345678.7654' AS DECIMAL(38,4)) AS DOUBLE) AS big_dec,
                CAST(o_orderdate AS DATE) AS od,
                CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS od_s,
                TIMESTAMP '2024-02-29 12:30:45' AS lit_ts
         FROM orders ORDER BY o_orderkey""",

    "q_array_funcs" ->
      """SELECT vec_id,
                CAST(len(embedding) AS INT) AS dim,
                embedding[3] AS e3,
                round(CAST(embedding[1:4][1] AS DOUBLE), 4) AS h1,
                round(CAST(embedding[1:4][4] AS DOUBLE), 4) AS h4,
                list_contains(list_transform(embedding, x -> x > 0.2), true) AS has_big,
                round(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sum_sq
         FROM embeddings ORDER BY vec_id""",

    "q_timeseries_gapfill" ->
      """WITH bounds AS (
           SELECT min(CAST(o_orderdate AS DATE)) AS d0,
                  max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
         spine AS (
           SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds),
         daily AS (
           SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT CAST(s.day AS DATE) AS day, coalesce(d.n_orders, 0) AS n_orders
         FROM spine s LEFT JOIN daily d ON CAST(s.day AS DATE) = d.day
         ORDER BY day""",

    "q_str_distance" ->
      """SELECT a.p_partkey AS k1, b.p_partkey AS k2,
                CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
         FROM part a JOIN part b ON a.p_partkey < b.p_partkey
         WHERE a.p_partkey < 30 AND b.p_partkey < 30
         ORDER BY k1, k2""",

    "q_regex_tokenize" ->
      """SELECT doc_id,
                array_to_string(regexp_extract_all(text, '[a-z]+'), '|') AS words,
                CAST(len(regexp_extract_all(text, '[a-z]+')) AS INT) AS n_words,
                CAST(len(regexp_extract_all(text, '[aeiou]{2,}')) AS INT) AS n_vowel_runs
         FROM documents WHERE doc_id < 100
         ORDER BY doc_id""",

    "q_map_funcs" ->
      """SELECT r_regionkey, 'key' AS k, CAST(r_regionkey AS VARCHAR) AS v FROM region
         UNION ALL
         SELECT r_regionkey, 'name' AS k, r_name AS v FROM region
         ORDER BY r_regionkey, k""",

    "q_json_variant" ->
      """SELECT count(*) AS n,
                CAST(sum(CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
                count(nullif(regexp_extract(props, '"missing":\s*"?([^",}]+)', 1), '')) AS n_absent,
                count(DISTINCT regexp_extract(props, '"k":\s*(-?\d+)', 1)) AS nd_k
         FROM events""",

    "q_json_extract" ->
      """SELECT event_id,
                regexp_extract(props, '"k":\s*(-?\d+)', 1) AS k_str,
                CAST(nullif(regexp_extract(props, '"k":\s*(-?\d+)', 1), '') AS BIGINT) AS k_num,
                CAST(NULL AS VARCHAR) AS absent
         FROM events ORDER BY event_id""",

    "q_explode_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_quantity"""
  )
}
