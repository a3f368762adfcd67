"""Temporal / windowed operators the reference lacks, built as Ray Data
compositions (brief: "custom operators" — as-of join, windowed
aggregate, sessionization, per-group top-k).

Shape shared by all of them: ONE hash shuffle into key-hash BUCKETS
(``relops._add_bucket`` — all rows of a key land in one bucket, many
keys per bucket) followed by a per-bucket kernel that is vectorized
ACROSS keys (numpy sort/searchsorted/cumsum over the whole bucket —
no per-key Python call, unlike a naive ``groupby(key).map_groups``
which at deployment scale would make one Python call per user).
Partitioning assumption, stated once: a bucket must fit in one
worker's heap — tune ``num_buckets`` to the data; a pathologically hot
key gets the same remedy (salt + re-merge) as the crawl's salted
repartition of hot lineages.

The timeline kernels (rolling window, as-of) linearize (key, ts) into
one sortable int64 axis via per-key offsets; when ``n_keys × span``
would overflow int64 they fall back to a per-key-segment numpy loop
(same results, still no pandas-groupby overhead).

These have no reference analog (SURVEY.md §2.5: "no windows, no
as-of/range joins"); they are part of the beyond-reference
training-data/ETL surface and are each strictly oracled against DuckDB
window/ASOF SQL in ``__ray_entry__``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.relops import _BUCKET_COL, _add_bucket


def _bucketed(ds: ray.data.Dataset, key: str, num_buckets: int, fn) -> ray.data.Dataset:
    return _add_bucket(ds, [key], num_buckets).groupby(
        _BUCKET_COL, num_partitions=num_buckets
    ).map_groups(
        lambda g: fn(g.drop(columns=[_BUCKET_COL])), batch_format="pandas"
    )


def sessionize(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    gap: pd.Timedelta,
    value_col: str | None = None,
    order_cols: list[str] | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Gap-based sessionization: within each ``key``, a new session
    starts when the time since the previous row exceeds ``gap``
    (strictly). Emits one row per session:
    ``(key, session_id, n_events, start_ts, end_ts[, sum_value])``
    with ``session_id`` numbered 1.. in time order per key.
    """
    order_cols = order_cols or [ts_col]
    gap64 = gap.to_timedelta64()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_cols], kind="stable")
        k = df[key].to_numpy()
        ts = df[ts_col].to_numpy()
        n = len(df)
        key_change = np.ones(n, dtype=bool)
        key_change[1:] = k[1:] != k[:-1]
        new_sess = key_change.copy()
        if n > 1:
            new_sess[1:] |= (ts[1:] - ts[:-1]) > gap64
        gsid = np.cumsum(new_sess)  # global segment id, 1-based
        # per-key session id = gsid − gsid at the key's first session + 1
        key_base = np.maximum.accumulate(np.where(key_change, gsid, 0))
        starts = np.flatnonzero(new_sess)
        ends = np.r_[starts[1:], n]
        out = {
            key: k[starts],
            "session_id": (gsid - key_base + 1)[starts],
            "n_events": ends - starts,
            "start_ts": ts[starts],
            "end_ts": ts[ends - 1],
        }
        if value_col is not None:
            csum = np.r_[0.0, np.cumsum(df[value_col].to_numpy(dtype=np.float64))]
            out["sum_value"] = csum[ends] - csum[starts]
        return pd.DataFrame(out)

    return _bucketed(ds, key, num_buckets, per_bucket)


def _ts_us(values: np.ndarray) -> np.ndarray:
    return values.astype("datetime64[us]").astype(np.int64)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    ts_col: str,
    left_cols: list[str],
    right_cols: list[str],
    right_suffix: str = "_r",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """As-of join: each left row is paired with the right row of the
    same ``key`` having the greatest ``ts_col`` <= the left row's
    (inner semantics — left rows with no prior right row are dropped).
    Matches DuckDB ``ASOF JOIN r ON l.key = r.key AND l.ts >= r.ts``.

    Both sides are tagged and unioned so the ONE key-bucket shuffle
    co-locates them — no broadcast of either side. Within a bucket the
    match is a single searchsorted over a (key, ts)-linearized axis
    across all keys at once.
    """
    l_sel = left.select_columns(list(dict.fromkeys([key, ts_col, *left_cols])))
    r_sel = right.select_columns(list(dict.fromkeys([key, ts_col, *right_cols])))
    # the union below NaN-fills each side's missing columns, upcasting
    # ints to float64 — record which columns are integral so the kernel
    # can restore exact dtypes (inner semantics: outputs are never null)
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
    empty_cols = list(dict.fromkeys([key, ts_col, *left_cols, out_right_ts, *out_right]))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # split BEFORE sorting: a bucket fed by only one side lacks the
        # other side's columns entirely (Ray doesn't NaN-fill a group
        # whose blocks all came from one union branch)
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({c: [] for c in empty_cols})
        r = r.sort_values([key, ts_col], kind="stable")
        l_keys, r_keys = l[key].to_numpy(), r[key].to_numpy()
        l_ts, r_ts = _ts_us(l[ts_col].to_numpy()), _ts_us(r[ts_col].to_numpy())
        uk = np.unique(np.concatenate([l_keys, r_keys]))
        t0 = min(l_ts.min(), r_ts.min())
        span = int(max(l_ts.max(), r_ts.max())) - int(t0) + 1
        if len(uk) * span < 2**62:
            # linearized axis: rank(key) · span + (ts − t0)
            l_adj = np.searchsorted(uk, l_keys) * span + (l_ts - t0)
            r_adj = np.searchsorted(uk, r_keys) * span + (r_ts - t0)
            idx = np.searchsorted(r_adj, l_adj, side="right") - 1
            hit = idx >= 0
            hit[hit] &= r_keys[idx[hit]] == l_keys[hit]
        else:  # per-key-segment fallback (numpy slices, no pandas groupby)
            idx = np.full(len(l), -1, dtype=np.int64)
            order = np.argsort(l_keys, kind="stable")
            seg_l = np.searchsorted(l_keys[order], uk)
            seg_r0 = np.searchsorted(r_keys, uk, side="left")
            seg_r1 = np.searchsorted(r_keys, uk, side="right")
            bounds_l = np.r_[seg_l, len(l)]
            for s in range(len(uk)):
                li = order[bounds_l[s]:bounds_l[s + 1]]
                r0, r1 = seg_r0[s], seg_r1[s]
                if len(li) == 0 or r0 == r1:
                    continue
                idx[li] = r0 + np.searchsorted(r_ts[r0:r1], l_ts[li], side="right") - 1
                idx[li[idx[li] < r0]] = -1
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

    return _add_bucket(both, [key], num_buckets).groupby(
        _BUCKET_COL, num_partitions=num_buckets
    ).map_groups(
        lambda g: per_bucket(g.drop(columns=[_BUCKET_COL])), batch_format="pandas"
    )


def rolling_time_window(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    window: pd.Timedelta,
    value_col: str,
    count_name: str = "n_window",
    sum_name: str = "sum_window",
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Sliding time-window aggregate: for every row, the count and sum
    of ``value_col`` over same-key rows with ``ts`` in
    ``[ts - window, ts]`` (both ends inclusive, ties included — the
    SQL ``RANGE BETWEEN window PRECEDING AND CURRENT ROW`` frame).
    Per bucket: one sort by (key, ts), two searchsorteds over the
    (key, ts)-linearized axis, one prefix sum — O(n log n), all keys
    at once.
    """
    win_us = int(window.to_timedelta64().astype("timedelta64[us]").astype(np.int64))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col], kind="stable")
        n = len(df)
        k = df[key].to_numpy()
        t_us = _ts_us(df[ts_col].to_numpy())
        key_change = np.ones(n, dtype=bool)
        key_change[1:] = k[1:] != k[:-1]
        rank = np.cumsum(key_change) - 1
        t0 = int(t_us.min())
        span = int(t_us.max()) - t0 + win_us + 1
        csum = np.r_[0.0, np.cumsum(df[value_col].to_numpy(dtype=np.float64))]
        if int(rank[-1] + 1) * span < 2**62:
            adj = rank * span + (t_us - t0)
            lo = np.searchsorted(adj, adj - win_us, side="left")
            hi = np.searchsorted(adj, adj, side="right")
        else:  # per-key-segment fallback
            lo = np.empty(n, dtype=np.int64)
            hi = np.empty(n, dtype=np.int64)
            seg = np.r_[np.flatnonzero(key_change), n]
            for s in range(len(seg) - 1):
                a, b = seg[s], seg[s + 1]
                lo[a:b] = a + np.searchsorted(t_us[a:b], t_us[a:b] - win_us, side="left")
                hi[a:b] = a + np.searchsorted(t_us[a:b], t_us[a:b], side="right")
        df = df.copy()
        df[count_name] = (hi - lo).astype(np.int64)
        df[sum_name] = csum[hi] - csum[lo]
        return df

    return _bucketed(ds, key, num_buckets, per_bucket)


def range_join(
    left: ray.data.Dataset,
    intervals: ray.data.Dataset,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    left_cols: list[str],
    interval_cols: list[str],
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Range (interval-containment) join: each left row pairs with the
    same-key interval where ``start <= ts <= end`` (inner semantics —
    rows in no interval are dropped). Matches the SQL inequality join
    ``ON l.key = r.key AND l.ts BETWEEN r.start AND r.end``.

    Assumes intervals are NON-OVERLAPPING per key (sessions, shifts,
    validity windows) so the containing interval is unique — found with
    one searchsorted over the (key, start)-linearized axis. Both sides
    ride the one key-bucket shuffle, same as :func:`asof_join`.
    """
    l_sel = left.select_columns(list(dict.fromkeys([key, ts_col, *left_cols])))
    r_sel = intervals.select_columns(
        list(dict.fromkeys([key, start_col, end_col, *interval_cols]))
    )
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
    out_cols = list(dict.fromkeys([key, ts_col, *left_cols, start_col, end_col, *interval_cols]))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # split BEFORE sorting (one-sided buckets lack the other side's
        # columns — see asof_join.per_bucket)
        l = df[df["__side"] == 0]
        r = df[df["__side"] == 1]
        if len(l) == 0 or len(r) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        r = r.sort_values([key, start_col], kind="stable")
        l_keys, r_keys = l[key].to_numpy(), r[key].to_numpy()
        l_ts = _ts_us(l[ts_col].to_numpy())
        r_start = _ts_us(r[start_col].to_numpy())
        r_end = _ts_us(r[end_col].to_numpy())
        uk = np.unique(np.concatenate([l_keys, r_keys]))
        t0 = min(int(l_ts.min()), int(r_start.min()))
        span = max(int(l_ts.max()), int(r_start.max())) - t0 + 1
        if len(uk) * span < 2**62:
            l_adj = np.searchsorted(uk, l_keys) * span + (l_ts - t0)
            r_adj = np.searchsorted(uk, r_keys) * span + (r_start - t0)
            idx = np.searchsorted(r_adj, l_adj, side="right") - 1
            hit = idx >= 0
            hit[hit] &= (r_keys[idx[hit]] == l_keys[hit]) & (r_end[idx[hit]] >= l_ts[hit])
        else:  # per-key-segment fallback
            idx = np.full(len(l), -1, dtype=np.int64)
            order = np.argsort(l_keys, kind="stable")
            bounds_l = np.r_[np.searchsorted(l_keys[order], uk), len(l)]
            seg_r0 = np.searchsorted(r_keys, uk, side="left")
            seg_r1 = np.searchsorted(r_keys, uk, side="right")
            for s in range(len(uk)):
                li = order[bounds_l[s]:bounds_l[s + 1]]
                r0, r1 = seg_r0[s], seg_r1[s]
                if len(li) == 0 or r0 == r1:
                    continue
                cand = r0 + np.searchsorted(r_start[r0:r1], l_ts[li], side="right") - 1
                ok = (cand >= r0) & (r_end[np.clip(cand, r0, r1 - 1)] >= l_ts[li])
                idx[li[ok]] = cand[ok]
            hit = idx >= 0
        l = l[hit]
        matched = r.iloc[idx[hit]]

        def col(series, name):
            v = series.to_numpy()
            return v.astype(np.int64) if name in int_cols and v.dtype.kind == "f" else v

        out = {key: col(l[key], key), ts_col: l[ts_col].to_numpy()}
        for c in left_cols:
            out[c] = col(l[c], c)
        out[start_col] = matched[start_col].to_numpy()
        out[end_col] = matched[end_col].to_numpy()
        for c in interval_cols:
            out[c] = col(matched[c], c)
        return pd.DataFrame(out)

    return _add_bucket(both, [key], num_buckets).groupby(
        _BUCKET_COL, num_partitions=num_buckets
    ).map_groups(
        lambda g: per_bucket(g.drop(columns=[_BUCKET_COL])), batch_format="pandas"
    )


def topk_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    descending: list[bool],
    k: int,
    rank_name: str = "rank",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Per-group top-k (window ``row_number() <= k``): within each
    group, rows ranked by ``order_cols`` (deterministic — callers must
    include a tiebreak column), keep the first ``k``. Pre-prunes each
    map_batches block to its local top-k per group before the shuffle,
    so the exchanged volume is O(groups × k) per block, not the table;
    the final rank pass is one vectorized kernel per bucket of groups.
    """
    ascending = [not d for d in descending]

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_cols, ascending=ascending, kind="stable")
        return df.groupby(group_col, sort=False).head(k)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, *order_cols],
                            ascending=[True, *ascending], kind="stable")
        g = df[group_col].to_numpy()
        n = len(df)
        key_change = np.ones(n, dtype=bool)
        key_change[1:] = g[1:] != g[:-1]
        # rank within group = position − position of group's first row
        pos = np.arange(n, dtype=np.int64)
        base = np.maximum.accumulate(np.where(key_change, pos, 0))
        rank = pos - base + 1
        df = df[rank <= k].copy()
        df[rank_name] = rank[rank <= k]
        return df

    pruned = ds.map_batches(local_prune, batch_format="pandas")
    return _bucketed(pruned, group_col, num_buckets, per_bucket)


def group_quantiles(
    ds: ray.data.Dataset,
    group_col: str,
    value_col: str,
    qs: dict[str, float],
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Exact per-group discrete quantiles (``quantile_disc`` semantics:
    the smallest 1-based rank ``i`` with ``i/n >= q``, i.e. element
    ``ceil(q*n) - 1`` of the group's sorted values). One hash shuffle
    into key buckets, then a kernel vectorized ACROSS keys: one sort of
    the whole bucket by ``(key, value)``, group offsets from the key
    change-points, and a single fancy-index gather per requested
    quantile. Emits one row per group: ``(group_col, *qs.keys())``.

    Exact (not sketched) — the partitioning assumption is the module-wide
    one: a bucket of groups must fit in a worker's heap. For groups too
    large for that, pre-aggregate into a fixed-width histogram per batch
    first; this operator targets the grouped-analytics case.
    """

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, value_col], kind="stable")
        g = df[group_col].to_numpy()
        v = df[value_col].to_numpy()
        n = len(df)
        change = np.ones(n, dtype=bool)
        change[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, n))
        out = {group_col: g[starts]}
        for name, q in qs.items():
            # ceil(q*n) with a tolerance so exact multiples (q*n integral
            # in decimal) are not bumped up by float error
            idx = np.ceil(q * counts - 1e-9).astype(np.int64) - 1
            out[name] = v[starts + np.clip(idx, 0, counts - 1)]
        return pd.DataFrame(out)

    return _bucketed(ds, group_col, num_buckets, per_bucket)


def lag_deltas(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    carry_cols: list[str] | None = None,
    first_value: int = -1,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Per-key LAG delta (``ts − lag(ts) OVER (PARTITION BY key ORDER BY
    ts, *order_cols)``): the inter-event-gap feature every behavioral /
    session pipeline computes. Emits one row per input row:
    ``(key, *carry_cols, delta_us)`` with the gap in integer
    microseconds and ``first_value`` (default −1) for each key's first
    event — integers only, so the DuckDB window oracle matches
    bit-for-bit.

    Same shape as the other window kernels: one hash shuffle into key
    buckets, then a kernel vectorized ACROSS keys (one bucket-wide sort,
    one diff, one key-change mask — no per-key Python).
    """
    order_cols = order_cols or []
    carry_cols = carry_cols or []

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, ts_col, *order_cols], kind="stable")
        k = df[key].to_numpy()
        ts = _ts_us(df[ts_col].to_numpy())
        n = len(df)
        delta = np.full(n, np.int64(first_value), dtype=np.int64)
        if n > 1:
            same = k[1:] == k[:-1]
            delta[1:][same] = (ts[1:] - ts[:-1])[same]
        out = {key: k}
        for c in carry_cols:
            out[c] = df[c].to_numpy()
        out["delta_us"] = delta
        return pd.DataFrame(out)

    return _bucketed(ds, key, num_buckets, per_bucket)
