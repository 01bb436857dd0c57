#!/usr/bin/env python3
"""Prototype the q_vocab_bpe DuckDB oracle: 10 chained merge rounds as CTEs.

Each round r (state w{r-1}: word, freq, unit list):
  f{r}:  positions exploded with next-unit lookahead
  pc{r}: adjacent-pair counts weighted by word freq
  best{r}: argmax pair (cnt desc, a, b), minCount 2 — empty => no-op round
  mt/st{r}: match positions, then greedy-leftmost starts (island + parity)
  w{r}:  rebuilt unit lists (merged unit at starts, consumed position dropped)
Tokenization reuses w10: every doc word IS in the vocab table, and per-word
merge evolution equals applyMerges(word).
"""
import sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
K = 10


def round_sql(r: int) -> str:
    p = r - 1
    return f"""
  e{r} AS (SELECT w, n, unnest(list_transform(units, (x, j) -> {{'u': x, 'j': j}})) AS s, units FROM w{p}),
  f{r} AS MATERIALIZED (SELECT w, n, s['u'] AS u, s['j'] AS j, units[s['j'] + 1] AS nxt FROM e{r}),
  pc{r} AS (SELECT u AS a, nxt AS b, sum(n) AS cnt FROM f{r} WHERE nxt IS NOT NULL GROUP BY u, nxt),
  best{r} AS (SELECT a, b FROM pc{r} WHERE cnt >= 2 ORDER BY cnt DESC, a, b LIMIT 1),
  mt{r} AS (SELECT f.w, f.j FROM f{r} f, best{r} b WHERE f.u = b.a AND f.nxt = b.b),
  st{r} AS MATERIALIZED (SELECT w, j FROM (
      SELECT w, j, (j - min(j) OVER (PARTITION BY w, g)) % 2 AS par
      FROM (SELECT w, j, j - row_number() OVER (PARTITION BY w ORDER BY j) AS g FROM mt{r})
    ) WHERE par = 0),
  w{r} AS MATERIALIZED (
    SELECT f.w AS w, f.n AS n,
           list(CASE WHEN st.j IS NOT NULL THEN f.u || f.nxt ELSE f.u END ORDER BY f.j) AS units
    FROM f{r} f
    LEFT JOIN st{r} st ON st.w = f.w AND st.j = f.j
    WHERE NOT EXISTS (SELECT 1 FROM st{r} s2 WHERE s2.w = f.w AND s2.j = f.j - 1)
    GROUP BY f.w, f.n
  )"""


def build_sql() -> str:
    rounds = ",".join(round_sql(r) for r in range(1, K + 1))
    return f"""WITH
  words AS MATERIALIZED (
    SELECT w, count(*) AS n FROM (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id < 100)
    WHERE w <> '' GROUP BY w),
  w0 AS (SELECT w, n, list_transform(range(1, len(w) + 1), j -> w[j]) AS units FROM words),{rounds},
  dw AS (
    SELECT doc_id, unnest(list_transform(
      list_filter(string_split(text, ' '), x -> x <> ''), (x, k) -> {{'w': x, 'k': k}})) AS s
    FROM documents WHERE doc_id < 100),
  tk AS (SELECT d.doc_id, d.s['k'] AS k, v.units AS units
         FROM dw d JOIN w{K} v ON v.w = d.s['w']),
  fl AS (SELECT doc_id, flatten(list(units ORDER BY k)) AS flat FROM tk GROUP BY doc_id)
SELECT doc_id, CAST(len(flat) AS INT) AS n_units, array_to_string(flat, '|') AS units_str
FROM fl ORDER BY doc_id"""


if __name__ == "__main__":
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    sql = build_sql()
    if "--print-sql" in sys.argv:
        print(sql)
        sys.exit(0)
    rows = con.sql(sql).fetchall()
    print(f"{len(rows)} rows")
    for r in rows[:3]:
        print(r[0], r[1], r[2][:120])
