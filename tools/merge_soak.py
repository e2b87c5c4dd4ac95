#!/usr/bin/env python3
"""Merge per-query Bench JSONs (one JVM per query) into one soak
artifact. Usage: merge_soak.py <outfile> <sf_dir_label> <in.json>...
Each input is a Bench SPARK_GRAFT_BENCH_OUT line for one query; the
merged artifact keeps per-query wall/shuffle/spill/error plus run
metadata so a failed probe names its cause (round-8 lesson: a 0-byte
artifact costs the next reader a full cycle)."""
import json
import sys

out, label = sys.argv[1], sys.argv[2]
queries, shuffle, spill, errors, failed = {}, {}, {}, {}, []
for path in sys.argv[3:]:
    with open(path) as f:
        d = json.load(f)
    queries.update(d.get("queries", {}))
    shuffle.update(d.get("shuffle_bytes", {}))
    spill.update(d.get("spill_bytes", {}))
    errors.update(d.get("errors", {}))
    failed += d.get("failed", [])
ok = {k: v for k, v in queries.items() if v >= 0}
merged = {
    "soak": "decade_probe_sf100",
    "sf": label,
    "protocol": "one JVM per query, SPARK_GRAFT_ONLY, watchdog 1500s, "
                "64g driver heap, 32 cpus, shuffle width 64, metrics on",
    "value": round(sum(ok.values()), 1),
    "unit": "sec",
    "n_pass": len(ok),
    "n_fail": len(failed),
    "failed": sorted(failed),
    "queries": queries,
    "shuffle_bytes": shuffle,
    "spill_bytes": spill,
    "errors": errors,
}
with open(out, "w") as f:
    json.dump(merged, f, indent=1)
print(json.dumps({k: merged[k] for k in ("n_pass", "n_fail", "failed")}))
