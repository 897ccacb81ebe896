#!/usr/bin/env python3
"""Pandas-faithful replica of the driver's t2 hash stage.

The driver loads the Spark result parquet and the DuckDB oracle result into
pandas, sorts columns by name, sorts rows, and hashes rendered values — so a
Spark DECIMAL (pandas object/Decimal) vs a DuckDB DECIMAL (float64) mismatch
fails the hash even when the values are numerically equal. This tool
reproduces that sensitivity: it compares pandas dtypes AND rendered values.

Usage: python3 tools/check_pandas.py <sfDir> <outDir> [query ...]
"""
import sys, json, glob, datetime
import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except TypeError as e:
        return None, f"sort crash: {e}"
    return df.reset_index(drop=True), None


def dclass(dt) -> str:
    """dtype class — the driver's schema/hash stage is lenient across integer
    widths and date-vs-timestamp, strict across int/float/decimal-object."""
    if pd.api.types.is_bool_dtype(dt):
        return "bool"
    if pd.api.types.is_integer_dtype(dt):
        return "int"
    if pd.api.types.is_float_dtype(dt):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dt):
        return "datetime"
    return "object"


def cell(v):
    if v is None:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        return pd.Timestamp(v).isoformat()  # date vs midnight-ts: tolerated
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))  # float32 promotes exactly; Decimal stays object
    return repr(v)


def render(df: pd.DataFrame):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)]


def obj_class(df: pd.DataFrame, c: str) -> str:
    """classify object columns by first non-null value (date → datetime)"""
    s = df[c].dropna()
    if len(s) == 0:
        return "object"
    v = s.iloc[0]
    if isinstance(v, (datetime.date, datetime.datetime)):
        return "datetime"
    return "object"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(files[0])
        except Exception as e:
            print(f"FAIL {name}: spark parquet read: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: cols spark={sorted(got.columns)} oracle={sorted(want.columns)}")
            n_fail += 1
            continue
        g, gerr = canon(got)
        w, werr = canon(want)
        if gerr or werr:
            print(f"FAIL {name}: {gerr or werr}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(w)}")
            n_fail += 1
            continue
        def cls(df, c):
            k = dclass(df[c].dtype)
            return obj_class(df, c) if k == "object" else k
        dt_bad = [(c, str(g[c].dtype), str(w[c].dtype)) for c in g.columns
                  if cls(g, c) != cls(w, c)]
        rg, rw = render(g), render(w)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(rg, rw)) if a != b]
        if bad or dt_bad:
            msg = []
            if dt_bad:
                msg.append(f"dtypes {dt_bad}")
            if bad:
                i, a, b = bad[0]
                msg.append(f"{len(bad)}/{len(rg)} rows differ; first at {i}: spark={a} oracle={b}")
            print(f"FAIL {name}: " + " | ".join(msg))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(rg)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
