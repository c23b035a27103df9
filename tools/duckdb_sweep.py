#!/usr/bin/env python3
"""DuckDB baseline sweep: time each oracle SQL against the sf tables.

Usage: duckdb_sweep.py <sfDir> <oracle_sql.json> <out.json> [names-csv] [reps] [threads]

Runs every oracle (or the named subset) `reps` times on a `threads`-
thread DuckDB and records per-query wall seconds (all reps + min).
The committed artifact (duckdb_sweep_rN.json) is the auditable side
of every SURVEY §6 ratio claim: same SQL the correctness gate runs,
same parquet, thread count recorded. Pair it with a Spark bench
subset run in the same window — this VM's ambient swings (2-4×) and
DuckDB's own ±40% window swings make cross-window ratios unreliable.
"""
import sys, json, time
import duckdb

def main():
    sf_dir, oracle_file, out_file = sys.argv[1], sys.argv[2], sys.argv[3]
    names = set(sys.argv[4].split(",")) if len(sys.argv) > 4 and sys.argv[4] else None
    reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
    threads = int(sys.argv[6]) if len(sys.argv) > 6 else 32

    con = duckdb.connect()
    con.sql(f"SET threads={threads}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = json.load(open(oracle_file))
    out = {"sf_dir": sf_dir, "threads": threads, "reps": reps,
           "duckdb": duckdb.__version__, "queries": {}}
    for name in sorted(oracles):
        if names is not None and name not in names:
            continue
        sql = oracles[name]
        times = []
        rows = None
        for _ in range(reps):
            t0 = time.monotonic()
            rows = len(con.sql(sql).fetchall())
            times.append(round(time.monotonic() - t0, 4))
        out["queries"][name] = {"sec_min": min(times), "sec": times, "rows": rows}
        print(f"[duckdb-sweep] {name}: min={min(times):.3f}s reps={times} rows={rows}",
              flush=True)
    with open(out_file, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"[duckdb-sweep] wrote {len(out['queries'])} queries to {out_file}")

if __name__ == "__main__":
    main()
