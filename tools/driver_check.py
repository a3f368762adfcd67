"""Local replica of the driver's correctness gate at sf0.01.

Runs each ``queries()`` entry against its ``oracle_sql()`` on the sf0.01
testdata exactly the way the driver does: sort columns by name, compare
row count, schema (column names), and a canonical value hash computed
over the sorted rows.  Usage::

    python tools/driver_check.py [query ...]      # default: all
    python tools/driver_check.py --late           # only the 11 r02-missing
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

LATE = [
    "docs_bigram_freq", "docs_dup_passages", "docs_tfidf_top",
    "docs_stopword_filtered", "docs_stratified_sample", "q_events_lag",
    "ann_topk", "ann_knn_join", "embedding_near_dups", "media_features",
    "media_frame_sample",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _to_df(x) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    if isinstance(x, ray.data.Dataset):
        return x.to_pandas()
    raise TypeError(type(x))


def _dtype_kind(dtype) -> str:
    """Coarse dtype class used to detect engine-vs-oracle divergences that a
    stricter driver canonicalization (e.g. str(310.0) != str(310)) would turn
    into hash reds even when values are numerically equal.  DuckDB's
    SUM(BIGINT) returns HUGEINT which pandas converts to float64 — any oracle
    whose output column comes back float while the engine emits int is a
    latent driver red (r3's q_events_cumsum)."""
    if np.issubdtype(dtype, np.bool_):
        return "bool"
    if np.issubdtype(dtype, np.integer):
        return "int"
    if np.issubdtype(dtype, np.floating):
        return "float"
    if str(dtype).startswith("datetime"):
        return "datetime"
    return "object"


def _dtype_map(df: pd.DataFrame) -> dict:
    return {c: _dtype_kind(df[c].dtype) for c in sorted(df.columns)}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == bool:
            df[c] = df[c].astype(int)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6g").encode()
    ).hexdigest()


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)

    import __ray_entry__ as entry_mod

    queries = entry_mod.queries()
    sqls = entry_mod.oracle_sql()

    args = sys.argv[1:]
    if "--json" in args:  # drop the flag's value from positional names
        ji = args.index("--json")
        if ji + 1 >= len(args) or args[ji + 1].startswith("-"):
            sys.exit("--json requires an output path argument")
        args = args[:ji] + args[ji + 2:]
    names = [a for a in args if not a.startswith("-")]
    if "--late" in sys.argv:
        names = LATE
    if not names:
        names = [n for n in queries if n in sqls]

    con = _duck()
    results = {}
    for name in names:
        try:
            got_raw = _to_df(queries[name](SF))
            exp_raw = con.execute(sqls[name]).df()
            got_k, exp_k = _dtype_map(got_raw), _dtype_map(exp_raw)
            got, exp = _normalize(got_raw), _normalize(exp_raw)
            res = {
                "rows_match": len(got) == len(exp),
                "schema_match": list(got.columns) == list(exp.columns),
                "hash_match": False,
                "dtype_match": got_k == exp_k,
                "rows": len(got),
                "oracle_rows": len(exp),
                "err": None,
            }
            if not res["dtype_match"]:
                res["dtype_diff"] = {
                    c: f"{got_k.get(c)}!={exp_k.get(c)}"
                    for c in set(got_k) | set(exp_k)
                    if got_k.get(c) != exp_k.get(c)
                }
            if res["rows_match"] and res["schema_match"]:
                res["hash_match"] = _value_hash(got) == _value_hash(exp)
                if not res["hash_match"]:
                    # diagnose (NOT forgive — the driver has no such fallback)
                    try:
                        pd.testing.assert_frame_equal(
                            got, exp, check_dtype=False, atol=1e-9
                        )
                        res["note"] = "equal_at_1e-9_but_hash_differs"
                    except AssertionError as e:
                        res["diff"] = str(e).splitlines()[-3:]
            else:
                res["got_cols"] = list(got.columns)
                res["exp_cols"] = list(exp.columns)
        except Exception as e:  # noqa: BLE001
            res = {"rows_match": False, "schema_match": False,
                   "hash_match": False, "dtype_match": False,
                   "err": f"{type(e).__name__}: {e}"}
        results[name] = res
        ok = (res["rows_match"] and res["schema_match"] and res["hash_match"]
              and res.get("dtype_match", True))
        print(f"{'PASS' if ok else 'FAIL'} {name}: {json.dumps(res, default=str)[:400]}")

    bad = [n for n, r in results.items()
           if not (r["rows_match"] and r["schema_match"] and r["hash_match"]
                   and r.get("dtype_match", True))]
    print(f"\n{len(results) - len(bad)}/{len(results)} green; failing: {bad}")
    if "--json" in sys.argv:  # committed audit artifact (VERDICT r03 item 7)
        import datetime
        import platform

        out_path = sys.argv[sys.argv.index("--json") + 1]
        rows_only = sorted(n for n in queries if n not in sqls)
        with open(out_path, "w") as f:
            json.dump({
                "generated_utc": datetime.datetime.now(
                    datetime.timezone.utc).isoformat(timespec="seconds"),
                "sf_dir": SF,
                "python": platform.python_version(),
                "duckdb": duckdb.__version__,
                "n_queries_registered": len(queries),
                "n_checked": len(results),
                "n_green": len(results) - len(bad),
                "failing": bad,
                "rows_only_queries": rows_only,
                "results": results,
            }, f, indent=1, default=str)
        print(f"wrote {out_path}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
