#!/usr/bin/env python3
"""Empirical DuckDB baseline: time every oracle SQL (the same queries the
correctness gate hash-verifies) in DuckDB over an sf dir, and write the
per-query medians to BASELINE_DUCKDB.json for Bench to report a true
spark-vs-duckdb ratio.

The oracle set splits in two:
  - REAL queries (reference tables appear in the SQL): DuckDB executes the
    same relational work the Spark side does — a genuine single-node
    baseline (DuckDB IS the reference's execution engine).
  - CONSTANT oracles (golden values pinned from the reference's own test
    suite, e.g. `SELECT CAST(51793 AS BIGINT)`): timing them measures
    nothing; they are recorded but excluded from the comparable total.

Usage:
    python3 scripts/baseline.py /root/testdata/sf0.1 /tmp/verify_out [runs]
(needs <verify_out>/oracle_sql.json from `runMain graft.Verify`)
"""
import sys, json, os, time, statistics, re

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, outdir, runs=3):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))

    word = re.compile(r"[A-Za-z_]+")

    def is_real(sql):
        toks = set(word.findall(sql.lower()))
        return any(t in toks for t in TABLES)

    names = sorted(oracle)
    # untimed warmup sweep (OS page cache for the parquet files)
    for n in names:
        try:
            con.sql(oracle[n]).fetchall()
        except Exception as e:
            print(f"SKIP {n}: {str(e)[:120]}", file=sys.stderr)

    samples = {n: [] for n in names}
    for r in range(runs):          # interleaved rounds, like Bench
        for n in names:
            t0 = time.perf_counter()
            try:
                con.sql(oracle[n]).fetchall()
            except Exception:
                continue
            samples[n].append(time.perf_counter() - t0)

    queries, total_real, total_all = {}, 0.0, 0.0
    real = {n: is_real(oracle[n]) for n in names}
    for n in names:
        if not samples[n]:
            continue
        med = statistics.median(samples[n])
        queries[n] = round(med, 6)
        total_all += med
        if real[n]:
            total_real += med

    # Two comparison tiers:
    #  - comparable: the oracle touches real tables (timing is meaningful)
    #  - same_work: comparable MINUS ib gates — the ib gates' Spark side
    #    runs Iceberg write/maintenance workflows their SELECT-only
    #    oracles don't, so only the non-ib families are apples-to-apples
    same_work = sorted(n for n in queries if real[n] and not n.startswith("ib"))
    out = {
        "engine": "duckdb",
        "version": duckdb.__version__,
        "sf": os.path.basename(sfdir.rstrip("/")),
        "runs": runs,
        "stat": "median",
        "threads": con.sql("SELECT current_setting('threads')").fetchone()[0],
        "total_sec": round(total_all, 3),
        "comparable_total_sec": round(total_real, 3),
        "same_work_total_sec": round(sum(queries[n] for n in same_work), 3),
        "comparable_queries": sorted(n for n in queries if real[n]),
        "same_work_queries": same_work,
        "constant_oracles": sorted(n for n in queries if not real[n]),
        "queries": queries,
    }
    with open("BASELINE_DUCKDB.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps({k: out[k] for k in
                      ["sf", "total_sec", "comparable_total_sec", "threads"]}))
    slow = sorted(((v, k) for k, v in queries.items() if real[k]), reverse=True)[:10]
    for v, k in slow:
        print(f"  {k}: {v:.3f}s")


if __name__ == "__main__":
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    main(sys.argv[1], sys.argv[2], runs)
