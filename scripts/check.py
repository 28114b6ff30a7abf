#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL over the same sf dir. Usage:
    python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out [json_out]
With json_out, also writes a machine-readable correctness artifact
(per-query rows/match/err) — used for the sf1 tier's CORRECTNESS_sf1.json.
"""
import sys, json, glob, os, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    if isinstance(v, list): return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)

def rows_canon(names, rows):
    # sort columns by name, then sort rows
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out

def main(sfdir, outdir, json_out=None):
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):  # multi-file tables (sf1 tier) glob the dir
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{outdir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        def rec(ok, rows=0, err=None):
            results[name] = {"rows": rows, "match": ok, "err": err}
        if not files:
            print(f"FAIL {name}: no spark result parquet"); n_fail += 1
            rec(False, err="no spark result parquet"); continue
        tb = pq.read_table(pdir)
        s_names = list(tb.column_names)
        s_rows = [tuple(r) for r in zip(*[tb.column(c).to_pylist() for c in s_names])] if s_names else []
        try:
            res = con.sql(sql)
            d_names, d_rows = list(res.columns), res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); n_fail += 1
            rec(False, err=f"oracle error: {str(e)[:200]}"); continue
        if sorted(s_names) != sorted(d_names):
            print(f"FAIL {name}: columns spark={sorted(s_names)} duckdb={sorted(d_names)}"); n_fail += 1
            rec(False, err="column mismatch"); continue
        sc, dc = rows_canon(s_names, s_rows), rows_canon(d_names, d_rows)
        if len(sc) != len(dc):
            print(f"FAIL {name}: rowcount spark={len(sc)} duckdb={len(dc)}"); n_fail += 1
            rec(False, rows=len(sc), err=f"rowcount spark={len(sc)} duckdb={len(dc)}"); continue
        if sc != dc:
            bad = [i for i,(a,b) in enumerate(zip(sc,dc)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at sorted rows {bad}")
            for i in bad:
                print(f"   spark : {sc[i]}")
                print(f"   duckdb: {dc[i]}")
            n_fail += 1; rec(False, rows=len(sc), err="value mismatch"); continue
        print(f"PASS {name} ({len(sc)} rows)"); n_pass += 1; rec(True, rows=len(sc))
    print(f"== {n_pass} pass / {n_fail} fail")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf": sfdir, "total": n_pass + n_fail, "pass": n_pass,
                       "fail": n_fail, "queries": results}, f, indent=1)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
