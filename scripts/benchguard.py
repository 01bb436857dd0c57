#!/usr/bin/env python3
"""Per-query bench regression guard.

Usage: scripts/benchguard.py <bench_output_file_or_-> [medians.json]

Reads graft.Bench's long JSON line (the one with the per-query map) and
compares every query's wall time against the recorded medians in
bench/medians.json. Fails (exit 1) when a query exceeds 4x its recorded
median AND the excess is more than 0.5s absolute (so sub-100ms queries
jittering to 300ms don't false-alarm), or when the total exceeds 2x the
recorded total median. This catches the next 13.5s-style single-query
outlier at build time instead of judge time.

Refresh the medians after an intentional perf change:
  for i in 1 2 3; do SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    scripts/run.sh graft.Bench 2>/dev/null | head -1 >> /tmp/bench.jsonl; done
  then recompute per-query medians into bench/medians.json.
"""
import json
import sys

src = sys.argv[1] if len(sys.argv) > 1 else '-'
medfile = sys.argv[2] if len(sys.argv) > 2 else 'bench/medians.json'

text = sys.stdin.read() if src == '-' else open(src).read()
bench = None
for line in text.splitlines():
    line = line.strip()
    if line.startswith('{') and '"queries"' in line:
        try:
            bench = json.loads(line)
            break
        except json.JSONDecodeError:
            continue  # tail-truncated capture of the long line — keep looking
if bench is None:
    sys.exit('no parseable bench JSON line with a "queries" map found '
             '(capture may have truncated the long line)')

medians = json.load(open(medfile))
total_median = medians.pop('_total', None)
if total_median is None:
    sys.exit(f'{medfile} has no _total entry — refresh medians')

# Environment normalization: sandbox allocations vary >2x in per-core
# speed (round-6 same-commit A/B: 41.0s vs 94.0s on an identical
# checkout), and separately fall into a page-fault-collapse mode (query
# totals 3.3x medians while ALU speed is unchanged). Bench emits two
# fixed workloads: "calib" (single-thread xorshift — clock speed),
# "calib_fault" (touch fresh mmap pages — the fault path Spark's
# task/GC churn exercises), and "calib_spark" (a fixed codegen +
# hash-agg + shuffle Spark job — the round-7 allocation ran queries 4x
# slower while the two micro-probes read 1.2x/1.8x; only a Spark-shaped
# probe feels scheduler/cgroup/bandwidth degradation). medians.json
# records each for the machine that produced the medians. Scale the
# gates UP by the WORSE ratio when this machine is slower, never down
# (a faster machine must not loosen the gate), and cap at 4x so a
# broken calibration can't mask a real regression.
env = 1.0
# calib_spark is probed before AND after the query loop (mid-run drift:
# round-7 watched the tail run 6-12x while early queries ran 2x) — gate
# against the WORSE of the two readings.
if bench.get('calib_spark_end') is not None and bench.get('calib_spark') is not None:
    bench['calib_spark'] = max(bench['calib_spark'], bench['calib_spark_end'])
for med_key, bench_key in (('_calib', 'calib'), ('_calib_fault', 'calib_fault'),
                           ('_calib_spark', 'calib_spark')):
    base = medians.pop(med_key, None)
    now = bench.get(bench_key)
    if base is None and now is not None:
        # the artifact measured this probe but the medians have no baseline
        # — the normalization for that failure mode is inert (an ADVICE
        # round-6 finding: fault-collapse runs false-failed the gate)
        print(f"WARN bench reports {bench_key}={now:.2f}s but {medfile} has no "
              f"{med_key} baseline — that environment term cannot scale the gate")
        continue
    if base and now:
        r = min(max(1.0, now / base), 4.0)
        if now / base > 4.0:
            print(f"WARN {bench_key} ratio {now / base:.2f}x saturates the 4.0 cap — "
                  f"calibration may be broken or the machine unusably degraded; "
                  f"gate failures below may be pure environment")
        if r > env:
            env = r
            if r > 1.1:
                print(f"ENV  this machine is {r:.2f}x slower than the medians' "
                      f"({bench_key} {now:.2f}s vs {base:.2f}s) — gates scaled")

# Top-level anomaly marking (round-15): Bench inlines every shipped value
# still >3x its stored median (with median + retry history) so the artifact
# is self-describing — surface them loudly here, as a WARN rather than a
# gate (the env-scaled 4x per-query gate below stays the failure authority).
for q, a in sorted(bench.get('anomalies', {}).items()):
    rh = (f" (first {a['first']:.2f}s, pre-retry {a['pre_retry']:.2f}s, "
          f"{a['retries']} retries)") if 'retries' in a else ''
    print(f"WARN anomaly {q}: {a['value']:.2f}s vs median {a['median']:.2f}s "
          f"({a['value'] / a['median']:.1f}x){rh}")

# A partial artifact (budget/timeout truncation — Bench marks it) has a
# meaningless total and legitimately missing tail queries: keep the
# per-query gates for what DID run, skip the total and missing-query gates.
partial = bool(bench.get('partial'))
if partial:
    print(f"WARN partial artifact ({len(bench['queries'])} queries) — "
          f"total and missing-query gates skipped")

fails = []
for q, t in sorted(bench['queries'].items()):
    m = medians.get(q)
    if m is None:
        print(f'NEW  {q}: {t:.2f}s (no recorded median — refresh medians.json)')
        continue
    if t > 4 * m * env and t - m * env > 0.5:
        fails.append(f'{q}: {t:.2f}s > 4x median {m:.2f}s (env-adjusted x{env:.2f})')
if not partial and bench['value'] > 2 * total_median * env:
    fails.append(f"total: {bench['value']:.1f}s > 2x median {total_median:.1f}s "
                 f"(env-adjusted x{env:.2f})")

# A query recorded in the medians but absent from this run means it was
# dropped from SparkEntry.queries (or renamed) — the per-query gate would
# silently stop guarding it, so fail loudly instead.
missing = sorted(set(medians) - set(bench['queries']))
if missing and not partial:
    fails.append(f"missing from bench output (dropped queries?): {', '.join(missing)}")

for f in fails:
    print('FAIL', f)
if not fails:
    print(f"OK   total {bench['value']:.1f}s (median {total_median:.1f}s), "
          f"{len(bench['queries'])} queries within 4x of medians")
sys.exit(1 if fails else 0)
