import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.relops import (
    broadcast_semi_join,
    dedup_keep_first,
    distinct,
    lookup_join,
    semi_anti_join,
)


def _ds(df):
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_dedup_keep_first_deterministic():
    rng = np.random.RandomState(0)
    n = 5000
    df = pd.DataFrame({
        "k": rng.randint(0, 300, n),          # hot keys included
        "o1": rng.randint(0, 10, n),
        "o2": np.arange(n),
        "v": rng.rand(n),
    })
    out = dedup_keep_first(_ds(df), ["k"], ["o1", "o2"], num_buckets=8).to_pandas()
    exp = df.sort_values(["o1", "o2"]).drop_duplicates("k", keep="first")
    got = out.sort_values("k").reset_index(drop=True)
    exp = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)


def test_distinct_representative_is_min_row():
    df = pd.DataFrame({"k": [1, 1, 2, 2, 2], "p": [5, 3, 9, 1, 4]})
    out = distinct(_ds(df), ["k"], num_buckets=4).to_pandas().sort_values("k")
    assert out["p"].tolist() == [3, 1]  # smallest full row per key


def test_semi_anti_join_broadcast():
    left = _ds(pd.DataFrame({"a": [1, 2, 3, 4, 5]}))
    right = _ds(pd.DataFrame({"b": [2, 4]}))
    semi = semi_anti_join(left, right, "a", "b", anti=False).to_pandas()
    anti = semi_anti_join(left, right, "a", "b", anti=True).to_pandas()
    assert sorted(semi["a"]) == [2, 4]
    assert sorted(anti["a"]) == [1, 3, 5]


def test_semi_anti_join_empty_right():
    left = _ds(pd.DataFrame({"a": [1, 2]}))
    right = _ds(pd.DataFrame({"b": pd.Series(dtype=np.int64)}))
    assert semi_anti_join(left, right, "a", "b", anti=True).count() == 2
    assert semi_anti_join(left, right, "a", "b", anti=False).count() == 0


def test_lookup_join_inner_and_left():
    left = _ds(pd.DataFrame({"a": [1, 2, 3], "x": ["p", "q", "r"]}))
    right = _ds(pd.DataFrame({"b": [1, 3], "y": ["Y1", "Y3"]}))
    inner = lookup_join(left, right, "a", "b", how="inner").to_pandas().sort_values("a")
    assert inner["y"].tolist() == ["Y1", "Y3"]
    left_j = lookup_join(left, right, "a", "b", how="left").to_pandas().sort_values("a")
    assert left_j["y"].fillna("-").tolist() == ["Y1", "-", "Y3"]


def test_broadcast_semi_join_strings():
    left = _ds(pd.DataFrame({"id": ["A", "B", "C"]}))
    out = broadcast_semi_join(left, ["B", "C"], "id").to_pandas()
    assert sorted(out["id"]) == ["B", "C"]


def test_distinct_range_boundaries_balanced_and_exact(tmp_path):
    """Dense sequential ids (all sharing a '00..' prefix) must spread
    across range buckets when sampled boundaries are supplied — the
    prefix fallback degenerates to one bucket — and distinct stays
    exact and range-clustered."""
    import pyarrow.parquet as pq

    from fs_crawler_ray.ids import indices_to_pids, range_bucket_of
    from fs_crawler_ray.sources.doc_table import corpus_range_boundaries

    ids = indices_to_pids(np.arange(20_000))
    corpus = pa.table({"doc_id": pa.array(np.sort(ids))})
    path = str(tmp_path / "docs.parquet")
    pq.write_table(corpus, path, row_group_size=1000)

    bounds = corpus_range_boundaries(path, "doc_id", 8)
    assert 1 <= len(bounds) <= 7
    buckets = range_bucket_of(ids, 8, boundaries=bounds)
    counts = np.bincount(buckets)
    assert (counts > 0).sum() >= 4, counts            # spread, not serialized
    assert counts.max() <= 2 * counts[counts > 0].min()  # roughly balanced
    # fallback (no boundaries) degenerates for this id population
    assert (np.bincount(range_bucket_of(ids, 8)) > 0).sum() == 1

    rng = np.random.RandomState(1)
    mentions = rng.choice(ids, 60_000)                # duplicated candidates
    df = pd.DataFrame({"cand_id": mentions, "priority": np.int64(1)})
    out = distinct(_ds(df), ["cand_id"], 8, range_bucket=True,
                   range_boundaries=bounds).to_pandas()
    assert sorted(out["cand_id"]) == sorted(set(mentions))


def test_full_outer_daily_balance_zero_fills(tmp_path):
    """Days present on only one side must survive the full_outer join
    with the other side's count zero-filled."""
    import pyarrow.parquet as pq

    from fs_crawler_ray.pipelines.relational import q_events_daily_type_balance

    t = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(
            [pd.Timestamp(d) for d in
             ["2024-01-01 01:00", "2024-01-01 02:00",   # purchases only
              "2024-01-02 03:00",                        # error only
              "2024-01-03 04:00", "2024-01-03 05:00"]],  # one of each
            pa.timestamp("us")),
        "user_id": pa.array([1] * 5, pa.int64()),
        "event_type": pa.array(
            ["purchase", "purchase", "error", "purchase", "error"]),
        "value": pa.array([1.0] * 5),
        "props": pa.array(['{"k": 1}'] * 5),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = q_events_daily_type_balance(str(tmp_path))
    assert out["day"].dt.day.tolist() == [1, 2, 3]
    assert out["n_purchases"].tolist() == [2, 0, 1]
    assert out["n_errors"].tolist() == [0, 1, 1]


def test_hash_join_all_types_survive_one_sided_partitions():
    """Three keys over 8 buckets guarantees one-sided shuffle
    partitions — the case where Ray's Dataset.join aggregator raises
    KeyError on a zero-column empty side (ray 2.49 join.py:118)."""
    from fs_crawler_ray.relops import hash_join

    left = _ds(pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]}))
    right = _ds(pd.DataFrame({"rk": [2, 3, 4], "rv": [200, 300, 400]}))

    def run(how):
        out = hash_join(left, right, on=["k"], right_on=["rk"], how=how,
                        num_buckets=8).to_pandas().sort_values("k")
        return out.reset_index(drop=True)

    inner = run("inner")
    assert inner["k"].tolist() == [2, 3]
    assert inner["rv"].tolist() == [200, 300]

    lo = run("left_outer")
    assert lo["k"].tolist() == [1, 2, 3]
    assert lo["rv"].fillna(-1).tolist() == [-1, 200, 300]

    ro = run("right_outer")
    assert sorted(ro["k"].tolist()) == [2, 3, 4]       # coalesced key
    assert ro.set_index("k")["rv"].to_dict() == {2: 200, 3: 300, 4: 400}

    fo = run("full_outer")
    assert sorted(fo["k"].tolist()) == [1, 2, 3, 4]
    assert fo.set_index("k")["lv"].fillna(-1).to_dict() == {1: 10, 2: 20, 3: 30, 4: -1}


def test_hash_join_rejects_overlapping_payload_columns():
    from fs_crawler_ray.relops import hash_join

    left = _ds(pd.DataFrame({"k": [1], "v": [1]}))
    right = _ds(pd.DataFrame({"k": [1], "v": [2]}))
    import pytest
    with pytest.raises(ValueError, match="disjoint"):
        hash_join(left, right, on=["k"], how="inner")


def test_hash_join_null_keys_follow_sql_semantics():
    """NULL keys never match (SQL three-valued equality) but outer
    joins still keep the null-key rows with a null other side."""
    from fs_crawler_ray.relops import hash_join

    left = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, None, 3], pa.int64()), "lv": [10, 20, 30]}))
    right = ray.data.from_arrow(pa.table(
        {"k": pa.array([1, None], pa.int64()), "rv": [100, 200]}))

    inner = hash_join(left, right, on=["k"], how="inner", num_buckets=4).to_pandas()
    assert inner.to_dict("records") == [{"k": 1, "lv": 10, "rv": 100}]

    fo = hash_join(left, right, on=["k"], how="full_outer", num_buckets=4).to_pandas()
    assert len(fo) == 4  # 1-match + left null + left 3 + right null
    assert fo["lv"].notna().sum() == 3 and fo["rv"].notna().sum() == 2


def test_hash_join_semi_anti():
    from fs_crawler_ray.relops import hash_join

    left = _ds(pd.DataFrame({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]}))
    right = _ds(pd.DataFrame({"rk": [2, 4, 9], "junk": ["a", "b", "c"]}))

    semi = hash_join(left, right, on=["k"], right_on=["rk"], how="left_semi",
                     num_buckets=8).to_pandas().sort_values("k")
    assert semi["k"].tolist() == [2, 4]
    assert list(semi.columns) == ["k", "lv"]  # right payload dropped

    anti = hash_join(left, right, on=["k"], right_on=["rk"], how="left_anti",
                     num_buckets=8).to_pandas().sort_values("k")
    assert anti["k"].tolist() == [1, 3]


def test_hash_join_rejects_right_payload_named_like_left_key():
    from fs_crawler_ray.relops import hash_join

    left = _ds(pd.DataFrame({"k": [1], "x": [1]}))
    right = _ds(pd.DataFrame({"rk": [1], "k": [9]}))  # payload shadows left key
    import pytest
    with pytest.raises(ValueError, match="disjoint"):
        hash_join(left, right, on=["k"], right_on=["rk"], how="inner")


def test_hash_join_rejects_wrong_schema_hint():
    from fs_crawler_ray.relops import hash_join

    left = _ds(pd.DataFrame({"k": [1], "lv": [1]}))
    right = _ds(pd.DataFrame({"rk": [1], "rv": [2]}))
    import pytest
    bad = pa.schema([("rk", pa.int64()), ("rv_typo", pa.int64())])
    with pytest.raises(Exception, match="not in the declared schema"):
        hash_join(left, right, on=["k"], right_on=["rk"], how="inner",
                  right_schema=bad).to_pandas()


def test_semi_anti_join_distributed_fallback_matches_broadcast(monkeypatch):
    """BROADCAST_LIMIT=0 forces semi_anti_join's bucketed hash_join
    fallback (the >2M-key scale path) — it must agree exactly with the
    broadcast path, for semi AND anti, including a one-sided bucket
    (keys the left never has)."""
    import fs_crawler_ray.relops as relops

    left = ray.data.from_pandas(pd.DataFrame(
        {"a": [f"k{i}" for i in range(40)], "v": list(range(40))}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"b": [f"k{i}" for i in range(0, 60, 3)]}))  # some keys not in left
    want_semi = sorted(
        relops.semi_anti_join(left, right, "a", "b").to_pandas()["a"])
    want_anti = sorted(
        relops.semi_anti_join(left, right, "a", "b", anti=True).to_pandas()["a"])
    monkeypatch.setattr(relops, "BROADCAST_LIMIT", 0)
    got_semi = sorted(
        relops.semi_anti_join(left, right, "a", "b").to_pandas()["a"])
    got_anti = sorted(
        relops.semi_anti_join(left, right, "a", "b", anti=True).to_pandas()["a"])
    assert got_semi == want_semi and len(want_semi) == 14
    assert got_anti == want_anti and len(want_anti) == 26
