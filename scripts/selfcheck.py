#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: selfcheck.py [sfDir] [verifyOutDir] [query ...]

Reads <outDir>/oracle_sql.json, runs each SQL in DuckDB against views over the
sf parquet tables, and compares with the Spark result parquet at
<outDir>/<name>/ — row count, column names (sorted), and exact values.
"""
import duckdb, json, sys, math

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []

def eq(x, y):
    if x is None and y is None:
        return True
    if isinstance(x, float) and isinstance(y, float):
        if math.isnan(x) and math.isnan(y):
            return True
        return x == y
    if isinstance(x, list) and isinstance(y, list):
        return len(x) == len(y) and all(eq(a, b) for a, b in zip(x, y))
    return x == y and type(x) == type(y)

for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        rel = con.sql(sql)
        expcols = [d[0] for d in rel.description]
        # rel.types (DuckDB logical types: HUGEINT vs BIGINT, ...) — the DBAPI
        # description collapses numeric widths to 'NUMBER' and misses the
        # driver's hash-level mismatches (e.g. sum() HUGEINT vs Spark BIGINT).
        exptypes = [str(t) for t in rel.types]
        exp = rel.fetchall()
        grel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        gotcols = [d[0] for d in grel.description]
        gottypes = [str(t) for t in grel.types]
        got = grel.fetchall()
        # Driver parity: its pandas sort_values canonicalization throws on
        # array/struct/map cells (unhashable ndarray — bit q_pipeline_curate
        # in r9, type-width bit q_media_features in r7). Any nested-typed
        # result column must fail HERE, before the driver sees it.
        nested = [(c, t) for c, t in zip(gotcols, gottypes)
                  if any(k in t for k in ('[]', 'STRUCT', 'MAP'))]
        if nested:
            fails.append((name, f'nested result columns (driver cannot sort): {nested}'))
            continue
        if sorted(expcols) != sorted(gotcols):
            fails.append((name, f'cols: got {sorted(gotcols)} want {sorted(expcols)}'))
            continue
        ei = sorted(range(len(expcols)), key=lambda i: expcols[i])
        gi = sorted(range(len(gotcols)), key=lambda i: gotcols[i])
        tmis = [(expcols[a], gottypes[b], exptypes[a])
                for a, b in zip(ei, gi) if gottypes[b] != exptypes[a]]
        if len(exp) != len(got):
            fails.append((name, f'rows: got {len(got)} want {len(exp)}'))
            continue
        bad = None
        for r, (e, g) in enumerate(zip(exp, got)):
            for a, b in zip(ei, gi):
                if not eq(g[b], e[a]):
                    bad = f'row {r} col {expcols[a]}: got {g[b]!r} want {e[a]!r}'
                    break
            if bad:
                break
        if bad:
            fails.append((name, bad))
        elif tmis:
            fails.append((name, f'TYPE mismatch (values equal): {tmis}'))
        else:
            print(f'OK   {name} ({len(got)} rows)')
    except Exception as ex:
        fails.append((name, f'error: {ex}'))

for n, m in fails:
    print(f'FAIL {n}: {m}')
n_checked = len([k for k in oracle if not only or k in only])
print(f'{n_checked - len(fails)}/{n_checked} pass')
sys.exit(1 if fails else 0)
