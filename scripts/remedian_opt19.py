#!/usr/bin/env python3
"""Optimization-round-19 medians re-base — the FIRST noop-sink basis.

Per-query median across the three clean back-to-back passes of the
final round-19 tree (bench/runs/opt19_pass_{1..3}.json). NOT comparable
to the r18 medians (bench/medians_r18_count_basis.json): the timed
action changed from count() to the noop sink this round (verdict r18
#4 — see OPTIMIZATION_r19.md §8 and bench/noop_audit.json for the
per-query count-vs-noop map); 76 queries were under-measured before.
"""
import json, statistics

passes = [json.load(open(f'bench/runs/opt19_pass_{i}.json'))
          for i in range(1, 4)]
queries = set()
for p in passes:
    queries |= set(p['queries'])
out = {}
for q in sorted(queries):
    samples = [p['queries'][q] for p in passes
               if q in p['queries'] and p['queries'][q] >= 0]
    assert samples, q
    out[q] = round(statistics.median(samples), 3)
out['_total'] = round(sum(v for k, v in out.items()
                          if not k.startswith('_')), 3)
out['_calib'] = round(statistics.median([p['calib'] for p in passes]), 3)
out['_calib_fault'] = round(
    statistics.median([p['calib_fault'] for p in passes]), 3)
out['_calib_spark'] = round(
    statistics.median([p['calib_spark'] for p in passes]), 3)
json.dump(out, open('bench/medians.json', 'w'), indent=1, sort_keys=True)
print('queries:', len(queries), '_total:', out['_total'],
      'calib_spark:', out['_calib_spark'])
