#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare against the Spark result
parquet written by graft.Verify (columns sorted by name, rows sorted,
exact value compare with NaN==NaN)."""
import duckdb, json, math, sys, glob, os

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        sdf = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        print(f"FAIL {name}: columns spark={scols} oracle={ocols}"); fails += 1; continue
    sdf = sdf[scols].sort_values(scols).reset_index(drop=True)
    odf = odf[ocols].sort_values(ocols).reset_index(drop=True)
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}"); fails += 1; continue
    bad = None
    for c in scols:
        sv, ov = sdf[c].tolist(), odf[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            af = isinstance(a, float); bf = isinstance(b, float)
            if af and bf and math.isnan(a) and math.isnan(b):
                continue
            if a is None and b is None:
                continue
            if af and bf:
                if a == b:
                    continue
                bad = (c, i, a, b); break
            if str(a) != str(b):
                bad = (c, i, a, b); break
        if bad: break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: value mismatch col={c} row={i} spark={a!r} oracle={b!r}")
        fails += 1
    else:
        print(f"PASS {name}: {len(sdf)} rows")
print(f"{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
