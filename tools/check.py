#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py /tmp/verify_sf0.001 /root/testdata/sf0.001

For each <out>/<query>/ parquet dir with an entry in oracle_sql.json:
run the oracle SQL in DuckDB over the testdata tables, sort columns by
name, sort rows, and compare cell-by-cell (exact; floats byte-compare
with a fallback report of max abs diff).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

def main(outdir, sfdir):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            sres = con.execute(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            scols = [d[0] for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        oc, orr = canon(orows, ocols)
        sc, srr = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_bad += 1
            continue
        if len(orr) != len(srr):
            print(f"FAIL {name}: rowcount oracle={len(orr)} spark={len(srr)}")
            n_bad += 1
            continue
        maxdiff = 0.0
        exact = True
        for a, b in zip(orr, srr):
            if a != b:
                exact = False
                for x, y in zip(a, b):
                    if x != y:
                        if isinstance(x, float) and isinstance(y, float) and not (math.isnan(x) or math.isnan(y)):
                            maxdiff = max(maxdiff, abs(x - y))
                        else:
                            maxdiff = float("inf")
        if exact:
            print(f"OK   {name} ({len(srr)} rows)")
            n_ok += 1
        else:
            print(f"FAIL {name}: values differ, max float diff={maxdiff}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
