"""Local driver-simulator: run every queries() entry against its oracle_sql()
via DuckDB at a given sf_dir and compare row count + order-insensitive
values.  Mirrors what the grading driver does (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

import ray


def to_pandas(result):
    if hasattr(result, "to_pandas"):
        try:
            return result.to_pandas()
        except TypeError:
            pass
    if isinstance(result, pd.DataFrame):
        return result
    raise TypeError(type(result))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(int)
        elif np.issubdtype(df[c].dtype, np.unsignedinteger) or np.issubdtype(
            df[c].dtype, np.signedinteger
        ):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None):
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    sqls = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            df = to_pandas(res)
        except Exception as ex:
            print(f"{name:24s} ERROR running query: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"{name:24s} rows-only: {len(df)} rows, cols {list(df.columns)}")
            continue
        try:
            odf = con.execute(sqls[name]).fetchdf()
        except Exception as ex:
            print(f"{name:24s} ERROR in oracle SQL: {ex}")
            failures += 1
            continue
        a, b = normalize(df), normalize(odf)
        if len(a) != len(b):
            print(f"{name:24s} ROWS MISMATCH ray={len(a)} oracle={len(b)}")
            failures += 1
            continue
        if list(a.columns) != list(b.columns):
            print(f"{name:24s} SCHEMA MISMATCH {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if not a.equals(b):
            neq = (a != b).any(axis=1)
            print(f"{name:24s} VALUE MISMATCH in {neq.sum()}/{len(a)} rows")
            print("  ray:", a[neq].head(3).to_dict("records"))
            print("  sql:", b[neq].head(3).to_dict("records"))
            failures += 1
            continue
        print(f"{name:24s} OK ({len(a)} rows)")
    if not only:
        # smoke entry()
        ds = e.entry()
        n = ds.count() if hasattr(ds, "count") else len(ds)
        print(f"entry(): {n} rows")
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    rest = []
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
        elif a == "--only":
            if i + 1 >= len(args):
                raise SystemExit("--only requires a comma-separated query list")
            only = set(args[i + 1].split(","))
            i += 1
        else:
            rest.append(a)
        i += 1
    sf = rest[0] if rest else "/root/testdata/sf0.01"
    raise SystemExit(1 if main(sf, only) else 0)
