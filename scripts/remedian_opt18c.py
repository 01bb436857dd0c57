#!/usr/bin/env python3
"""Optimization-round-18 CONTINUATION medians re-base.

Per-query median across the three clean back-to-back passes of the
final tree after the continuation session's arms
(bench/runs/opt18c_pass_{1..3}.json). Same discipline as
remedian_opt18.py: every pass post-dates the last code change, so every
query uses every pass.
"""
import json, statistics

passes = [json.load(open(f'bench/runs/opt18c_pass_{i}.json'))
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
