"""Dev tool: sweep every oracle-backed query against DuckDB at sf0.01 and time it (usage: python tools/oracle_sweep.py)."""
import time, sys, numpy as np, pandas as pd, duckdb, ray
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as E
SF = "/root/testdata/sf0.01"
qs = E.queries(); oq = E.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        res = fn(SF)
        if not isinstance(res, pd.DataFrame):
            res = res.to_pandas()
        dt = time.time() - t0
        if name in oq:
            ora = con.execute(oq[name]).df()
            a, b = norm(res), norm(ora)
            ok = len(a) == len(b) and list(a.columns) == list(b.columns)
            if ok:
                for c in a.columns:
                    av, bv = a[c], b[c]
                    if av.dtype.kind == "f" or bv.dtype.kind == "f":
                        if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True):
                            ok = False; break
                    else:
                        if not (av.reset_index(drop=True).eq(bv.reset_index(drop=True)) | (av.isna() & bv.isna())).all():
                            ok = False; break
            status = "ORACLE-OK" if ok else "ORACLE-FAIL"
            if not ok: fails.append(name)
        else:
            status = f"rows-only ({len(res)})"
            if len(res) == 0 and name != "media_features": fails.append(name)
        print(f"{name:32s} {status:14s} {dt:5.1f}s")
    except Exception as e:
        fails.append(name)
        print(f"{name:32s} ERROR {type(e).__name__}: {str(e)[:120]}")
print("FAILS:", fails)
ray.shutdown()
