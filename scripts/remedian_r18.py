#!/usr/bin/env python3
"""Round-18 medians re-base.

Per-query median across the round-18 full passes, honoring tree
changes mid-round (a pass only counts for a query if the query's code
was final in that pass):
  - q_graph_louvain / q_graph_louvain_multilevel: passes 3-5 only
    (phase-1 sharing landed after pass 2).
  - q_cluster_dbscan / q_tvf_dbscan: passes 4-5 only (pair-stage
    condition push landed after pass 3).
  - everything else: all five passes.
_total = sum of per-query medians; _calib* = median of pass calibs.
"""
import json, statistics, sys

passes = [json.load(open(f'bench/runs/r18_pass_{i}.json')) for i in range(1, 6)]
FINAL_FROM = {
    'q_graph_louvain': 2, 'q_graph_louvain_multilevel': 2,
    'q_cluster_dbscan': 3, 'q_tvf_dbscan': 3,
}
queries = set()
for p in passes:
    queries |= set(p['queries'])
out = {}
for q in sorted(queries):
    samples = [p['queries'][q] for i, p in enumerate(passes)
               if i >= FINAL_FROM.get(q, 0) and q in p['queries']
               and p['queries'][q] >= 0]
    assert samples, q
    out[q] = round(statistics.median(samples), 3)
out['_total'] = round(sum(v for k, v in out.items() if not k.startswith('_')), 3)
out['_calib'] = round(statistics.median([p['calib'] for p in passes]), 3)
out['_calib_fault'] = round(statistics.median([p['calib_fault'] for p in passes]), 3)
out['_calib_spark'] = round(statistics.median([p['calib_spark'] for p in passes]), 3)
json.dump(out, open('bench/medians.json', 'w'), indent=1, sort_keys=True)
print('queries:', len(queries), '_total:', out['_total'],
      'calib_spark:', out['_calib_spark'])
