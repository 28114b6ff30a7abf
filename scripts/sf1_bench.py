#!/usr/bin/env python3
"""sf1 stress tier (round 12): hash-verify and bench the heaviest oracles
one decade above the driver's sf0.1 bench tier, on locally generated data
(graft.GenSf1 — 10x key-shifted clones of sf0.1).

Pipeline (run from /root/repo):
  1. sbt "runMain graft.GenSf1 /root/testdata/sf0.1 testdata_sf1 10"
  2. sbt "runMain graft.Verify testdata_sf1 /tmp/verify_sf1 <SUBSET>"
  3. python3 scripts/check.py testdata_sf1 /tmp/verify_sf1   (hash gate)
  4. SPARK_GRAFT_SF_DIR=testdata_sf1 SPARK_GRAFT_BENCH_ONLY=<SUBSET> \
       sbt "runMain graft.Bench"                             (spark side)
  5. python3 scripts/sf1_bench.py testdata_sf1 /tmp/verify_sf1 \
       bench_result.json BENCH_sf1.json [sf0.1 bench json]

Step 5 (this script) times the same oracle SQL in DuckDB (median of 3),
joins the Spark timings, and writes BENCH_sf1.json with per-query ratios.
With a prior sf0.1 bench artifact it also reports each query's
ratio-vs-ratio degradation — the verdict's audit rule flags any query
whose spark/duckdb ratio degrades >2x from its sf0.1 ratio.
"""
import sys, json, os, re, statistics, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, verify_out, spark_bench, out, prev_bench=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{verify_out}/oracle_sql.json"))
    spark = json.load(open(spark_bench))
    names = sorted(set(oracle) & set(spark["queries"]))

    duck = {}
    reuse = os.environ.get("SF1_DUCK_LOG")  # cached timings from a prior run
    if reuse and os.path.exists(reuse):
        for line in open(reuse):
            m = re.match(r"\s*duckdb (\S+): ([0-9.]+)s", line)
            if m and m.group(1) in names:
                duck[m.group(1)] = float(m.group(2))
    for name in names:
        if name in duck:
            continue
        times = []
        for _ in range(3):
            t0 = time.time()
            con.sql(oracle[name]).fetchall()
            times.append(time.time() - t0)
        duck[name] = statistics.median(times)
        print(f"  duckdb {name}: {duck[name]:.3f}s")

    prev_ratio = {}
    if prev_bench:
        prev = json.load(open(prev_bench))
        # the driver's BENCH_r{N}.json wraps the bench line under "parsed"
        if "queries" not in prev and isinstance(prev.get("parsed"), dict):
            prev = prev["parsed"]
        # a driver artifact whose bench line failed to parse carries
        # parsed: null — skip the degradation compare rather than crash
        if isinstance(prev.get("queries"), dict):
            prev_base = json.load(open("BASELINE_DUCKDB.json"))
            for n in names:
                ps, pd = prev["queries"].get(n), prev_base["queries"].get(n)
                if ps and pd and ps > 0 and pd > 0:
                    prev_ratio[n] = ps / pd

    rows = {}
    flagged = []
    for n in names:
        s, d = spark["queries"][n], duck[n]
        ratio = s / d if d > 0 else None
        row = {"spark_sec": round(s, 3), "duckdb_sec": round(d, 3),
               "ratio": round(ratio, 3) if ratio else None}
        if n in prev_ratio and ratio:
            row["sf01_ratio"] = round(prev_ratio[n], 3)
            row["ratio_degradation"] = round(ratio / prev_ratio[n], 3)
            if ratio / prev_ratio[n] > 2.0:
                flagged.append(n)
        rows[n] = row

    total_s = sum(spark["queries"][n] for n in names)
    total_d = sum(duck[n] for n in names)
    artifact = {
        "metric": "sf1_stress",
        "sf": sfdir,
        "queries": rows,
        "spark_total_sec": round(total_s, 3),
        "duckdb_total_sec": round(total_d, 3),
        "vs_duckdb": round(total_s / total_d, 3) if total_d else None,
        "spark_runs": spark.get("runs"),
        "ratio_degraded_over_2x": flagged,
    }
    json.dump(artifact, open(out, "w"), indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "queries"}))
    if flagged:
        print(f"AUDIT NEEDED: ratio degraded >2x vs sf0.1 for {flagged}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4],
         sys.argv[5] if len(sys.argv) > 5 else None)
