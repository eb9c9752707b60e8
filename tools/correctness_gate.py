"""Simulate the driver's correctness gate: run every queries()[name] at
sf0.01 and compare with oracle_sql()[name] via DuckDB (row count +
order-insensitive value comparison with column-name sort)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import duckdb
import pandas as pd
import numpy as np

import __spark_entry__ as E
from database_delta_plugins_spark.session import get_spark

args = [a for a in sys.argv[1:] if not a.startswith("--")]
only = None
if "--only" in sys.argv:
    only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    args = [a for a in args if a not in only and "," not in a]
SF = args[0] if args else "/root/testdata/sf0.01"
spark = get_spark(master="local[16]", shuffle_partitions=16)

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"create view {t} as select * from '{SF}/{t}.parquet'")

qs, os_ = E.queries(), E.oracle_sql()
if only:
    qs = {k: v for k, v in qs.items() if k in only}
fails = []
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF).toPandas()
    except Exception as ex:
        print(f"{name}: SPARK ERROR {type(ex).__name__}: {ex}")
        fails.append(name)
        continue
    if name not in os_:
        print(f"{name}: rows-only ({len(sdf)} rows) OK")
        continue
    try:
        odf = con.sql(os_[name]).df()
    except Exception as ex:
        print(f"{name}: ORACLE ERROR {ex}")
        fails.append(name)
        continue
    if len(sdf) != len(odf):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(sdf)} oracle={len(odf)}")
        fails.append(name)
        continue
    cols = sorted(sdf.columns)
    if cols != sorted(odf.columns):
        print(f"{name}: SCHEMA MISMATCH {cols} vs {sorted(odf.columns)}")
        fails.append(name)
        continue
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    ok = True
    for c in cols:
        x, y = a[c], b[c]
        if str(x.dtype).startswith("datetime") or str(y.dtype).startswith("datetime"):
            xa = pd.to_datetime(x).astype("datetime64[ns]").to_numpy()
            ya = pd.to_datetime(y).astype("datetime64[ns]").to_numpy()
            eq = bool(np.all(xa == ya))
        elif x.dtype.kind == "f" or y.dtype.kind == "f":
            xa = x.astype(float).to_numpy()
            ya = y.astype(float).to_numpy()
            eq = bool(np.all((xa == ya) | (np.isnan(xa) & np.isnan(ya))))
        else:
            xa = x.astype(object).where(pd.notna(x), None)
            ya = y.astype(object).where(pd.notna(y), None)
            eq = xa.equals(ya)
        if not eq:
            bad = None
            for i in range(len(x)):
                xv, yv = x.iloc[i], y.iloc[i]
                if (pd.isna(xv) and pd.isna(yv)):
                    continue
                if xv != yv:
                    bad = (i, xv, yv)
                    break
            print(f"{name}: VALUE MISMATCH col={c} first_bad={bad}")
            ok = False
            break
    if ok:
        print(f"{name}: MATCH ({len(sdf)} rows)")
    else:
        fails.append(name)

print("FAILED:" if fails else "ALL GREEN:", fails if fails else len(qs))
spark.stop()
sys.exit(1 if fails else 0)
