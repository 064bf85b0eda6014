"""Dev tool: replicate the driver's per-query oracle compare at sf0.01 (usage: python tools/oracle_check.py [query ...])."""
import sys, numpy as np, pandas as pd, duckdb, ray
ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import __ray_entry__ as E

SF = "/root/testdata/sf0.01"
names = sys.argv[1:] or ["hapax_by_source", "vocab_filter", "asof_events_orders"]
qs = E.queries(); oq = E.oracle_sql()
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
def norm(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)
for name in names:
    res = qs[name](SF)
    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    ora = con.execute(oq[name]).df()
    a, b = norm(res), norm(ora)
    ok_rows = len(a) == len(b)
    ok_schema = list(a.columns) == list(b.columns)
    ok = ok_rows and ok_schema
    if ok:
        for c in a.columns:
            if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                if not np.allclose(a[c].astype(float), b[c].astype(float), equal_nan=True):
                    ok = False; print(name, "float mismatch", c); break
            elif a[c].tolist() != b[c].tolist():
                ok = False; print(name, "mismatch col", c); break
    print(name, "rows", len(a), len(b), "OK" if ok else "FAIL")
ray.shutdown()
