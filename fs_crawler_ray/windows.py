"""Temporal / windowed operators the reference lacks, built as Ray Data
compositions (brief: "custom operators" — as-of join, windowed
aggregate, sessionization, per-group top-k).

Every operator here is ONE hash shuffle by its key followed by a
vectorized per-group kernel (`groupby(key).map_groups` over pandas
groups — numpy searchsorted / cumsum, no per-row Python). Partitioning
assumption, stated once for all of them: a single key's rows must fit
in one worker's heap. Keys are user/customer-grained (millions of
small groups at deployment scale), the same assumption the crawl makes
for hot lineages; a pathologically hot key gets the same remedy
(salt + re-merge) as the crawl's salted repartition.

These have no reference analog (the reference has no windows/as-of —
SURVEY.md §2.5 "no windows, no as-of/range joins"); they are part of
the beyond-reference training-data/ETL surface and are each strictly
oracled against DuckDB window/ASOF SQL in ``__ray_entry__``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def sessionize(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    gap: pd.Timedelta,
    value_col: str | None = None,
    order_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Gap-based sessionization: within each ``key``, a new session
    starts when the time since the previous row exceeds ``gap``
    (strictly). Emits one row per session:
    ``(key, session_id, n_events, start_ts, end_ts[, sum_value])``
    with ``session_id`` numbered 1.. in time order per key.
    """
    order_cols = order_cols or [ts_col]

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, kind="stable")
        ts = df[ts_col].to_numpy()
        new_sess = np.ones(len(df), dtype=np.int64)
        if len(df) > 1:
            new_sess[1:] = (np.diff(ts) > gap.to_timedelta64()).astype(np.int64)
        sess = np.cumsum(new_sess)
        # per-session reduction via boundary indices (no second groupby)
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], len(df)]
        out = {
            key: df[key].to_numpy()[starts],
            "session_id": sess[starts],
            "n_events": ends - starts,
            "start_ts": ts[starts],
            "end_ts": ts[ends - 1],
        }
        if value_col is not None:
            csum = np.r_[0.0, np.cumsum(df[value_col].to_numpy(dtype=np.float64))]
            out["sum_value"] = csum[ends] - csum[starts]
        return pd.DataFrame(out)

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
    right_suffix: str = "_r",
) -> ray.data.Dataset:
    """As-of join: each left row is paired with the right row of the
    same ``key`` having the greatest ``ts_col`` <= the left row's
    (inner semantics — left rows with no prior right row are dropped).
    Matches DuckDB ``ASOF JOIN r ON l.key = r.key AND l.ts >= r.ts``.

    Shape: both sides are tagged and unioned so the key shuffle
    co-locates them, then a per-key searchsorted picks matches —
    one all-to-all, no broadcast of either side.
    """
    l_sel = left.select_columns(list(dict.fromkeys([key, ts_col, *left_cols])))
    r_sel = right.select_columns(list(dict.fromkeys([key, ts_col, *right_cols])))
    # the union below NaN-fills each side's missing columns, upcasting
    # ints to float64 — record which columns are integral so per_key can
    # restore exact dtypes (inner semantics: outputs are never null)
    import pyarrow.types as pat

    def _is_int(t) -> bool:
        if isinstance(t, pa.DataType):
            return pat.is_integer(t)
        return getattr(np.dtype(t), "kind", "") in ("i", "u")

    int_cols = {
        n
        for ds_ in (l_sel, r_sel)
        for n, t in zip(ds_.schema().names, ds_.schema().types)
        if _is_int(t)
    }

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = np.int8(side)
            return df

        return fn

    both = l_sel.map_batches(tag(0), batch_format="pandas").union(
        r_sel.map_batches(tag(1), batch_format="pandas")
    )
    out_right = [f"{c}{right_suffix}" if c in set(left_cols) | {ts_col} else c for c in right_cols]
    out_right_ts = f"{ts_col}{right_suffix}"

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1].sort_values(ts_col, kind="stable")
        if len(l) == 0 or len(r) == 0:
            cols = [key, ts_col, *left_cols, out_right_ts, *out_right]
            return pd.DataFrame({c: [] for c in dict.fromkeys(cols)})
        r_ts = r[ts_col].to_numpy()
        idx = np.searchsorted(r_ts, l[ts_col].to_numpy(), side="right") - 1
        hit = idx >= 0
        l = l[hit]
        matched = r.iloc[idx[hit]]
        def col(series, name):
            v = series.to_numpy()
            return v.astype(np.int64) if name in int_cols and v.dtype.kind == "f" else v

        out = {key: col(l[key], key), ts_col: l[ts_col].to_numpy()}
        for c in left_cols:
            out[c] = col(l[c], c)
        out[out_right_ts] = matched[ts_col].to_numpy()
        for c, oc in zip(right_cols, out_right):
            out[oc] = col(matched[c], c)
        return pd.DataFrame(out)

    return both.groupby(key).map_groups(per_key, batch_format="pandas")


def rolling_time_window(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    window: pd.Timedelta,
    value_col: str,
    count_name: str = "n_window",
    sum_name: str = "sum_window",
) -> ray.data.Dataset:
    """Sliding time-window aggregate: for every row, the count and sum
    of ``value_col`` over same-key rows with ``ts`` in
    ``[ts - window, ts]`` (both ends inclusive, ties included — the
    SQL ``RANGE BETWEEN window PRECEDING AND CURRENT ROW`` frame).
    Vectorized per key: two searchsorteds against the sorted ts array
    plus a prefix-sum, O(n log n) per group.
    """

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(ts_col, kind="stable")
        ts = df[ts_col].to_numpy()
        lo = np.searchsorted(ts, ts - window.to_timedelta64(), side="left")
        hi = np.searchsorted(ts, ts, side="right")
        csum = np.r_[0.0, np.cumsum(df[value_col].to_numpy(dtype=np.float64))]
        df = df.copy()
        df[count_name] = (hi - lo).astype(np.int64)
        df[sum_name] = csum[hi] - csum[lo]
        return df

    return ds.groupby(key).map_groups(per_key, batch_format="pandas")


def topk_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    descending: list[bool],
    k: int,
    rank_name: str = "rank",
) -> ray.data.Dataset:
    """Per-group top-k (window ``row_number() <= k``): within each
    group, rows ranked by ``order_cols`` (deterministic — callers must
    include a tiebreak column), keep the first ``k``. Pre-prunes each
    map_batches block to its local top-k per group before the shuffle,
    so the exchanged volume is O(groups × k) per block, not the table.
    """
    ascending = [not d for d in descending]

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, ascending=ascending, kind="stable")
        return df.groupby(group_col, sort=False).head(k)

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, ascending=ascending, kind="stable").head(k)
        df = df.copy()
        df[rank_name] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    pruned = ds.map_batches(local_prune, batch_format="pandas")
    return pruned.groupby(group_col).map_groups(per_group, batch_format="pandas")
