#!/usr/bin/env python3
"""Pin the grading denominator (r17 verdict item 3): per-query DuckDB
oracle MINIMA across every committed duckdb_sweep_r*.json.

The sweep's own windows swing +/-50-80% on this VM, so a single
round's pairing can flatter or punish a Spark/oracle ratio by window
luck alone. The cross-round minimum per query is window-proof: it only
ever goes down, and every ratio graded against it is conservative for
Spark. Refresh whenever a new sweep lands:

    python3 tools/oracle_minima.py            # writes oracle_minima.json
    python3 tools/oracle_minima.py --print    # stdout only
"""
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def minima():
    out = {}
    sweeps = sorted(glob.glob(os.path.join(REPO, "duckdb_sweep_r*.json")))
    if not sweeps:
        sys.exit("no duckdb_sweep_r*.json artifacts found")
    for path in sweeps:
        with open(path) as f:
            sweep = json.load(f)
        rnd = os.path.basename(path)
        for name, rec in sweep["queries"].items():
            sec = rec["sec_min"]
            cur = out.get(name)
            if cur is None or sec < cur["sec_min"]:
                out[name] = {"sec_min": sec, "sweep": rnd, "rows": rec["rows"]}
    return {"sweeps": [os.path.basename(p) for p in sweeps],
            "queries": dict(sorted(out.items()))}


if __name__ == "__main__":
    doc = minima()
    body = json.dumps(doc, indent=1, sort_keys=False)
    if "--print" in sys.argv:
        print(body)
    else:
        dest = os.path.join(REPO, "oracle_minima.json")
        with open(dest, "w") as f:
            f.write(body + "\n")
        print(f"wrote {dest}: {len(doc['queries'])} queries over "
              f"{len(doc['sweeps'])} sweeps")
