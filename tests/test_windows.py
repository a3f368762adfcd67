"""Unit tests for the temporal/windowed operators (windows.py):
sessionize, asof_join, rolling_time_window, topk_per_group — the
custom operators the reference lacks (SURVEY.md §2.5 notes the
reference has no windows/as-of), each also strictly oracled against
DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import ray.data

from fs_crawler_ray.windows import (
    asof_join,
    range_join,
    rolling_time_window,
    sessionize,
    topk_per_group,
)

T0 = pd.Timestamp("2024-01-01 00:00:00")


def _ts(*minutes):
    return [T0 + pd.Timedelta(minutes=m) for m in minutes]


def test_sessionize_gap_boundaries():
    # gaps: 10 (same), 30 (same: NOT strictly greater), 31 (new), then
    # a second user with a single event
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "event_id": [10, 11, 12, 13, 20],
            "ts": _ts(0, 10, 40, 71, 5),
            "value": [1.0, 2.0, 3.0, 4.0, 9.0],
        }
    )
    out = (
        sessionize(
            ray.data.from_pandas(df), key="user_id", ts_col="ts",
            gap=pd.Timedelta(minutes=30), value_col="value",
            order_cols=["ts", "event_id"],
        )
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_id"].tolist() == [1, 2, 1]
    # 30-min gap exactly stays in-session (strictly-greater rule)
    assert out["n_events"].tolist() == [3, 1, 1]
    assert out["sum_value"].tolist() == [6.0, 4.0, 9.0]
    assert out.loc[0, "start_ts"] == T0 and out.loc[0, "end_ts"] == T0 + pd.Timedelta(minutes=40)


def test_asof_join_matches_most_recent_at_or_before():
    left = pd.DataFrame(
        {"user_id": [1, 1, 1, 2], "ts": _ts(5, 20, 100, 1), "event_id": [1, 2, 3, 4]}
    )
    right = pd.DataFrame(
        {"user_id": [1, 1, 2], "ts": _ts(5, 30, 50), "value": [10.0, 20.0, 30.0]}
    )
    out = (
        asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            key="user_id", ts_col="ts", left_cols=["event_id"], right_cols=["value"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # event 1: equal ts matches (at-or-before inclusive); event 2: only
    # the t=5 click precedes; event 3: latest prior is t=30; event 4:
    # user 2 has no click at-or-before t=1 -> dropped (inner)
    assert out["event_id"].tolist() == [1, 2, 3]
    assert out["value"].tolist() == [10.0, 10.0, 20.0]
    assert out["ts_r"].tolist() == _ts(5, 5, 30)


def test_asof_join_empty_side_groups():
    left = pd.DataFrame({"user_id": [7], "ts": _ts(1), "event_id": [1]})
    right = pd.DataFrame({"user_id": [8], "ts": _ts(0), "value": [1.0]})
    out = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        key="user_id", ts_col="ts", left_cols=["event_id"], right_cols=["value"],
    ).to_pandas()
    assert len(out) == 0


def test_rolling_time_window_inclusive_bounds():
    # window=60min: row at t=60 includes t=0 (boundary inclusive);
    # row at t=121 excludes t=60 (121-60=61 > 60)
    df = pd.DataFrame(
        {"user_id": [1, 1, 1], "event_id": [1, 2, 3], "ts": _ts(0, 60, 121),
         "value": [1.0, 2.0, 4.0]}
    )
    out = (
        rolling_time_window(
            ray.data.from_pandas(df), key="user_id", ts_col="ts",
            window=pd.Timedelta(hours=1), value_col="value",
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["n_window"].tolist() == [1, 2, 1]
    assert out["sum_window"].tolist() == [1.0, 3.0, 4.0]


def test_range_join_containment_bounds():
    left = pd.DataFrame(
        {"user_id": [1, 1, 1, 1, 2], "ts": _ts(0, 10, 20, 30, 5),
         "event_id": [1, 2, 3, 4, 5]}
    )
    # user 1: intervals [0,10] and [20,25]; user 2 has no interval
    intervals = pd.DataFrame(
        {"user_id": [1, 1], "start_ts": _ts(0, 20), "end_ts": _ts(10, 25),
         "session_id": np.array([1, 2], dtype=np.int64)}
    )
    out = (
        range_join(
            ray.data.from_pandas(left), ray.data.from_pandas(intervals),
            key="user_id", ts_col="ts", start_col="start_ts", end_col="end_ts",
            left_cols=["event_id"], interval_cols=["session_id"],
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # t=0 (start bound) and t=10 (end bound) inclusive; t=30 outside;
    # user 2 dropped (no interval)
    assert out["event_id"].tolist() == [1, 2, 3]
    assert out["session_id"].tolist() == [1, 1, 2]
    assert out["session_id"].dtype == np.int64


def test_range_join_exact_above_float53():
    """The linearized axis (key_code·span + ts) must stay int64: the
    union schema null-fills ts on interval rows, and converting the
    null-bearing column before subsetting degrades to float64, which
    rounds above 2^53 and matches points to the wrong 1µs-adjacent
    interval. 100 keys × a ~2^50 span pushes the axis to ~2^57."""
    rng = np.random.RandomState(7)
    SPAN = 1 << 50
    keys, starts, ends, sids = [], [], [], []
    l_keys, l_ts = [], []
    sid = 0
    for k in range(100):
        s = np.sort(rng.randint(0, SPAN - 1000, size=3).astype(np.int64))
        s = s + np.arange(3, dtype=np.int64) * 200  # enforce separation
        for st_ in s:
            keys.append(k); starts.append(int(st_)); ends.append(int(st_) + 100)
            sids.append(sid); sid += 1
            # probe: exact start, exact end, 1µs past the end (miss)
            l_keys += [k, k, k]
            l_ts += [int(st_), int(st_) + 100, int(st_) + 101]
    left = pd.DataFrame({"k": np.array(l_keys, np.int64),
                         "ts": np.array(l_ts, np.int64),
                         "event_id": np.arange(len(l_ts), dtype=np.int64)})
    ivals = pd.DataFrame({"k": np.array(keys, np.int64),
                          "start": np.array(starts, np.int64),
                          "end": np.array(ends, np.int64),
                          "sid": np.array(sids, np.int64)})
    out = range_join(
        ray.data.from_pandas(left), ray.data.from_pandas(ivals),
        key="k", ts_col="ts", start_col="start", end_col="end",
        left_cols=["event_id"], interval_cols=["sid"], num_buckets=1,
    ).to_pandas().sort_values("event_id").reset_index(drop=True)
    # brute-force expectation
    exp = left.merge(ivals, on="k")
    exp = exp[(exp["ts"] >= exp["start"]) & (exp["ts"] <= exp["end"])]
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert out["event_id"].tolist() == exp["event_id"].tolist()
    assert out["sid"].tolist() == exp["sid"].tolist()


def test_topk_per_group_ranks_and_block_prune():
    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "seg": rng.choice(["a", "b"], 400),
            "key": np.arange(400, dtype=np.int64),
            "score": rng.rand(400).round(6),
        }
    )
    # many blocks so the block-local prune path is exercised
    ds = ray.data.from_pandas(df).repartition(8)
    out = (
        topk_per_group(ds, group_col="seg", order_cols=["score", "key"],
                       descending=[True, False], k=5)
        .to_pandas()
        .sort_values(["seg", "rank"])
        .reset_index(drop=True)
    )
    exp = (
        df.sort_values(["score", "key"], ascending=[False, True])
        .groupby("seg", sort=False)
        .head(5)
        .sort_values(["seg", "score"], ascending=[True, False])
        .reset_index(drop=True)
    )
    assert out["key"].tolist() == exp["key"].tolist()
    assert out.groupby("seg")["rank"].apply(list).tolist() == [[1, 2, 3, 4, 5]] * 2


def test_windows_match_duckdb_on_random_events():
    """Property-style cross-check of all three temporal operators
    against DuckDB window/ASOF SQL on a random events table."""
    import duckdb

    rng = np.random.RandomState(11)
    n = 600
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 12, n).astype(np.int64),
            "ts": T0 + pd.to_timedelta(rng.randint(0, 6 * 24 * 3600, n), unit="s"),
            "kind": rng.choice(["p", "c"], n),
            "value": rng.rand(n).round(3),
        }
    ).sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("ev", ev)
    ds = ray.data.from_pandas(ev)

    sess = (
        sessionize(ds, key="user_id", ts_col="ts", gap=pd.Timedelta(hours=2),
                   value_col="value", order_cols=["ts", "event_id"])
        .to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )
    sess_sql = con.execute(
        """
        WITH o AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w > INTERVAL 2 HOUR
                        THEN 1 ELSE 0 END AS ns
            FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT user_id, ts, value,
                   SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
            FROM o
        )
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
               MIN(ts) AS start_ts, MAX(ts) AS end_ts, ROUND(SUM(value), 3) AS sum_value
        FROM s GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchdf()
    sess["sum_value"] = sess["sum_value"].round(3)
    pd.testing.assert_frame_equal(
        sess[["user_id", "session_id", "n_events", "start_ts", "end_ts", "sum_value"]],
        sess_sql, check_dtype=False,
    )

    roll = (
        rolling_time_window(ds, key="user_id", ts_col="ts",
                            window=pd.Timedelta(hours=3), value_col="value")
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    roll_sql = con.execute(
        """
        SELECT event_id, COUNT(*) OVER w AS n_window, ROUND(SUM(value) OVER w, 3) AS sum_window
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts
                             RANGE BETWEEN INTERVAL 3 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY event_id
        """
    ).fetchdf()
    assert roll["n_window"].tolist() == roll_sql["n_window"].tolist()
    assert np.allclose(roll["sum_window"].round(3), roll_sql["sum_window"], atol=1e-9)

    aj = (
        asof_join(
            ds.filter(lambda r: r["kind"] == "p"), ds.filter(lambda r: r["kind"] == "c"),
            key="user_id", ts_col="ts", left_cols=["event_id"], right_cols=["value"],
        )
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    aj_sql = con.execute(
        """
        SELECT l.event_id, r.ts AS ts_r, r.value
        FROM (SELECT * FROM ev WHERE kind = 'p') l
        ASOF JOIN (SELECT * FROM ev WHERE kind = 'c') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY l.event_id
        """
    ).fetchdf()
    assert aj["event_id"].tolist() == aj_sql["event_id"].tolist()
    assert aj["ts_r"].tolist() == aj_sql["ts_r"].tolist()
    assert np.allclose(aj["value"], aj_sql["value"])


def test_lag_deltas_per_key():
    from fs_crawler_ray.windows import lag_deltas

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "event_id": [10, 11, 12, 20, 21],
        "ts": _ts(0, 5, 5, 3, 60),   # tie at minute 5 broken by event_id
    })
    out = (lag_deltas(ray.data.from_pandas(df), key="user_id", ts_col="ts",
                      order_cols=["event_id"], carry_cols=["event_id"])
           .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True))
    us = 60_000_000
    assert out["delta_us"].tolist() == [-1, 5 * us, 0, -1, 57 * us]


def test_running_total_per_key():
    from fs_crawler_ray.windows import running_total

    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2],
        "event_id": [10, 11, 12, 20, 21],
        "ts": _ts(0, 5, 9, 3, 60),
        "value": [1.25, 2.005, 0.01, 10.0, 0.0],
    })
    out = (running_total(ray.data.from_pandas(df), key="user_id", ts_col="ts",
                         value_col="value", order_cols=["event_id"],
                         carry_cols=["event_id"])
           .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True))
    # cents via floor(v*100 + 0.5): 125, 201 (double(2.005)*100 =
    # 200.50000000000003 — the same double math DuckDB's FLOOR sees), 1
    assert out["cum_cents"].tolist() == [125, 326, 327, 1000, 1000]


def test_funnel_strict_ordering():
    from fs_crawler_ray.windows import funnel

    # u1 completes all 3 in order; u2's purchase precedes the click
    # (depth stalls at 2); u3 has click-at-the-same-ts-as-view (NOT
    # strictly after -> depth 1); u4 never views (depth 0)
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 2, 3, 3, 4],
        "event_type": ["view", "click", "purchase",
                       "purchase", "view", "click",
                       "view", "click", "click"],
        "ts": _ts(0, 1, 2, 0, 1, 2, 5, 5, 9),
    })
    out = (funnel(ray.data.from_pandas(df), key="user_id", ts_col="ts",
                  type_col="event_type", stages=["view", "click", "purchase"])
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == [1, 2, 3, 4]
    assert out["funnel_depth"].tolist() == [3, 2, 1, 0]


def test_funnel_reuses_later_stage_rows():
    from fs_crawler_ray.windows import funnel

    # the FIRST qualifying row per stage is the cursor: u1's first
    # click after the view is at t=3, so the purchase at t=4 counts
    # even though an earlier purchase (t=2) does not
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1],
        "event_type": ["view", "purchase", "click", "purchase"],
        "ts": _ts(0, 2, 3, 4),
    })
    out = (funnel(ray.data.from_pandas(df), key="user_id", ts_col="ts",
                  type_col="event_type", stages=["view", "click", "purchase"])
           .to_pandas())
    assert out["funnel_depth"].tolist() == [3]


def test_ntile_exact_sql_semantics():
    from fs_crawler_ray.windows import ntile

    # u1: 6 rows into 4 tiles -> sizes 2,2,1,1; u2: 2 rows (< tiles)
    # -> each row its own tile 1,2
    df = pd.DataFrame({
        "user_id": [1] * 6 + [2] * 2,
        "event_id": list(range(6)) + [10, 11],
        "ts": _ts(0, 1, 2, 3, 4, 5, 0, 1),
    })
    out = (ntile(ray.data.from_pandas(df), key="user_id",
                 order_cols=["ts", "event_id"], n_tiles=4)
           .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True))
    assert out["tile"].tolist() == [1, 1, 2, 2, 3, 4, 1, 2]


def test_moving_sum_rows_frame_clips_at_key_start():
    from fs_crawler_ray.windows import moving_sum

    # u1 cents: 100,200,300,400 -> w3: 100,300,600,900
    # u2 single row must NOT see u1's tail: w3 = 500
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "event_id": [1, 2, 3, 4, 5],
        "ts": _ts(0, 1, 2, 3, 0),
        "value": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = (moving_sum(ray.data.from_pandas(df), key="user_id", ts_col="ts",
                      value_col="value", preceding=2,
                      order_cols=["event_id"], carry_cols=["event_id"],
                      out_name="w3_cents")
           .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True))
    assert out["w3_cents"].tolist() == [100, 300, 600, 900, 500]


def test_moving_sum_matches_pandas_rolling():
    from fs_crawler_ray.windows import moving_sum

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, 500),
        "event_id": np.arange(500),
        "ts": [T0 + pd.Timedelta(seconds=int(s)) for s in rng.integers(0, 10_000, 500)],
        "value": np.round(rng.uniform(0, 100, 500), 2),
    })
    out = (moving_sum(ray.data.from_pandas(df), key="user_id", ts_col="ts",
                      value_col="value", preceding=2,
                      order_cols=["event_id"], carry_cols=["event_id"],
                      out_name="w3_cents")
           .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True))
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["cents"] = np.floor(ref["value"].to_numpy() * 100 + 0.5).astype("int64")
    ref["w3"] = (ref.groupby("user_id")["cents"]
                 .rolling(3, min_periods=1).sum().reset_index(level=0, drop=True))
    ref = ref.sort_values(["user_id", "event_id"])
    assert out["w3_cents"].tolist() == ref["w3"].astype("int64").tolist()


def test_mode_per_key_tie_breaks_on_smaller_category():
    from fs_crawler_ray.windows import mode_per_key

    # u1: click x2, view x2 (tie -> "click" wins lexicographically)
    # u2: purchase x3 beats view x1
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 2, 2, 2],
        "event_type": ["view", "click", "view", "click",
                       "purchase", "purchase", "view", "purchase"],
    })
    out = (mode_per_key(ray.data.from_pandas(df), key="user_id",
                        cat_col="event_type", out_name="top_type")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out["top_type"].tolist() == ["click", "purchase"]
    assert out["cnt"].tolist() == [2, 3]


def test_rank_per_key_ties_share_rank_with_gaps():
    from fs_crawler_ray.windows import rank_per_key

    # u1 values desc: 500, 300, 300, 100 -> ranks 1, 2, 2, 4
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "event_id": [1, 2, 3, 4, 5],
        "value_cents": [300, 500, 300, 100, 7],
    })
    out = (rank_per_key(ray.data.from_pandas(df), key="user_id",
                        value_col="value_cents", carry_cols=["event_id"])
           .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True))
    assert out["rnk"].tolist() == [2, 1, 2, 4, 1]


def test_rank_per_key_matches_pandas_rank():
    from fs_crawler_ray.windows import rank_per_key

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 15, 400),
        "event_id": np.arange(400),
        "value_cents": rng.integers(0, 30, 400),  # dense -> many ties
    })
    out = (rank_per_key(ray.data.from_pandas(df), key="user_id",
                        value_col="value_cents", carry_cols=["event_id"])
           .to_pandas().sort_values(["user_id", "event_id"]).reset_index(drop=True))
    ref = df.sort_values(["user_id", "event_id"]).copy()
    ref["rnk"] = ref.groupby("user_id")["value_cents"].rank(
        method="min", ascending=False).astype("int64")
    assert out["rnk"].tolist() == ref["rnk"].tolist()


def test_ordered_paths_joins_in_ts_then_tiebreak_order():
    from fs_crawler_ray.windows import ordered_paths

    ts = pd.to_datetime([10, 30, 20, 20, 5], unit="s")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2],
        "ts": ts,
        "event_id": [4, 2, 3, 1, 9],  # equal-ts rows break on event_id
        "event_type": ["view", "buy", "cart", "add", "solo"],
    })
    out = (ordered_paths(ray.data.from_pandas(df), key="user_id",
                         ts_col="ts", val_col="event_type",
                         tiebreak="event_id")
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    assert out["path"].tolist() == ["view>add>cart>buy", "solo"]
