#!/usr/bin/env python3
"""Local pre-check mirroring the driver's correctness gate: run Verify's
parquet outputs against the DuckDB oracle SQL and compare values.
Usage: python3 tools/check.py <sfDir> <outDir>"""
import sys, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"MISSING {name}"); fail += 1; continue
    got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    try:
        exp = con.sql(sql).fetchdf()
    except Exception as e:
        print(f"ORACLE-ERR {name}: {e}"); fail += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"SCHEMA {name}: got {gc} exp {ec}"); fail += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[gc].sort_values(gc).reset_index(drop=True)
    if len(g) != len(e):
        print(f"ROWS {name}: got {len(g)} exp {len(e)}"); fail += 1; continue
    import pandas as pd
    ok = True
    for c in gc:
        a, b = g[c], e[c]
        # The driver's compare is an exact hash over stringified values, so an
        # int64-vs-float64 dtype split (e.g. DuckDB sum(INT) -> HUGEINT ->
        # pandas float64) fails it even when every value is equal. Flag it.
        if a.dtype.kind != b.dtype.kind and {a.dtype.kind, b.dtype.kind} <= {'i', 'u', 'f'} \
                and 'f' in {a.dtype.kind, b.dtype.kind}:
            print(f"DTYPE {name}.{c}: spark {a.dtype} vs oracle {b.dtype} (hash-compare hazard)")
            ok = False; break
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                import numpy as np
                bad = ~(np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True))
            else:
                bad = ~((a == b) | (a.isna() & b.isna()))
        except Exception as ex:
            print(f"CMP-ERR {name}.{c}: {ex}"); ok = False; break
        if bad.any():
            import numpy as np
            i = int(np.argmax(np.asarray(bad)))
            print(f"VALUE {name}.{c}: row {i} got {a[i]!r} exp {b[i]!r} ({int(bad.sum())} diffs)")
            ok = False; break
    if ok:
        print(f"OK {name} ({len(g)} rows)")
    else:
        fail += 1
print(f"{'PASS' if fail==0 else 'FAIL'} ({len(oracle)-fail}/{len(oracle)})")
sys.exit(1 if fail else 0)
