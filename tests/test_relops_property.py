"""Property tests: relops.hash_join vs the pandas merge oracle.

The bucketed hash_join is the engine's scale-path join (it backs
semi/anti fallbacks, resolve, vocab, daily-balance, retention…), so it
gets an adversarial oracle: random small frames — string AND int keys,
skew, missing keys, empty sides, pandas- and arrow-backed inputs — must
match ``pd.merge`` row-multisets for every join type.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fs_crawler_ray.relops import hash_join

KEYS = ["a", "b", "c", "d", "e", "f"]


def _frame(keys, vals, col, key_dtype=object):
    # explicit dtypes: an EMPTY pandas frame defaults every column to
    # float64, which is an input ambiguity (hash_join rightly refuses
    # double-vs-string key conflicts), not a join property
    return pd.DataFrame({"k": pd.Series(list(keys), dtype=key_dtype),
                         col: pd.Series(list(vals), dtype="int64")})


def _canon(df: pd.DataFrame, cols) -> list[tuple]:
    out = []
    for row in df[cols].itertuples(index=False):
        out.append(tuple(None if (isinstance(v, float) and np.isnan(v))
                         or v is pd.NA or v is None else v for v in row))
    return sorted(out, key=repr)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    lk=st.lists(st.sampled_from(KEYS), min_size=0, max_size=12),
    rk=st.lists(st.sampled_from(KEYS), min_size=0, max_size=12),
    how=st.sampled_from(["inner", "left_outer", "full_outer"]),
    buckets=st.sampled_from([1, 3, 16]),
)
def test_hash_join_matches_pandas_merge(lk, rk, how, buckets):
    ldf = _frame(lk, range(len(lk)), "x")
    rdf = _frame(rk, range(100, 100 + len(rk)), "y")
    pd_how = {"inner": "inner", "left_outer": "left", "full_outer": "outer"}[how]
    want = ldf.merge(rdf, on="k", how=pd_how)
    got = hash_join(
        ray.data.from_pandas(ldf), ray.data.from_pandas(rdf),
        on=["k"], how=how, num_buckets=buckets,
    ).to_pandas()
    if len(got) == 0 and len(want) == 0:
        return  # an all-empty Ray result loses its schema — nothing to compare
    assert _canon(got, ["k", "x", "y"]) == _canon(want, ["k", "x", "y"]), (
        lk, rk, how, buckets)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    lk=st.lists(st.integers(min_value=-3, max_value=3), min_size=0, max_size=10),
    rk=st.lists(st.integers(min_value=-3, max_value=3), min_size=0, max_size=10),
    anti=st.booleans(),
)
def test_hash_join_semi_anti_matches_pandas(lk, rk, anti):
    ldf = _frame(lk, range(len(lk)), "x", key_dtype="int64")
    rdf = pd.DataFrame({"k": pd.Series(list(rk), dtype="int64")})
    mask = ldf["k"].isin(set(rk))
    want = ldf[~mask] if anti else ldf[mask]
    got = hash_join(
        ray.data.from_pandas(ldf), ray.data.from_pandas(rdf),
        on=["k"], how="left_anti" if anti else "left_semi", num_buckets=4,
    ).to_pandas()
    if len(got) == 0 and len(want) == 0:
        return
    assert _canon(got, ["k", "x"]) == _canon(want, ["k", "x"]), (lk, rk, anti)



@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(0, 5), st.integers(0, 99)),
        min_size=1, max_size=30),
    buckets=st.sampled_from([1, 4, 16]),
)
def test_dedup_keep_first_matches_pandas(rows, buckets):
    """dedup_keep_first == pandas sort_values + drop_duplicates(keep=first)
    for any key skew and bucket count (the crawl's D1/D3 semantics)."""
    from fs_crawler_ray.relops import dedup_keep_first

    df = pd.DataFrame(rows, columns=["k", "o", "v"])
    want = df.sort_values(["o", "v"], kind="stable").drop_duplicates(
        subset=["k"], keep="first")
    got = dedup_keep_first(
        ray.data.from_pandas(df), ["k"], ["o", "v"], num_buckets=buckets
    ).to_pandas()
    assert _canon(got, ["k", "o", "v"]) == _canon(want, ["k", "o", "v"]), rows


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(KEYS), st.integers(-50, 50)),
        min_size=1, max_size=30),
    buckets=st.sampled_from([1, 4, 16]),
)
def test_bucketed_agg_matches_pandas_groupby(rows, buckets):
    from fs_crawler_ray.relops import bucketed_agg

    df = pd.DataFrame(rows, columns=["k", "v"])
    want = df.groupby("k", as_index=False).agg(
        s=("v", "sum"), mn=("v", "min"), mx=("v", "max"), n=("v", "count"))
    got = bucketed_agg(
        ray.data.from_pandas(df), ["k"],
        [("v", "sum", "s"), ("v", "min", "mn"), ("v", "max", "mx"),
         ("v", "count", "n")],
        num_buckets=buckets,
    ).to_pandas()
    assert _canon(got, ["k", "s", "mn", "mx", "n"]) == _canon(
        want, ["k", "s", "mn", "mx", "n"]), rows


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(st.tuples(st.sampled_from(KEYS), st.integers(0, 3)),
                  min_size=0, max_size=25),
)
def test_distinct_matches_pandas(rows):
    from fs_crawler_ray.relops import distinct

    df = pd.DataFrame(rows, columns=["k", "g"])
    if df.empty:
        df = pd.DataFrame({"k": pd.Series(dtype=object),
                           "g": pd.Series(dtype="int64")})
    want = df.drop_duplicates()
    got = distinct(ray.data.from_pandas(df), ["k", "g"], 8).to_pandas()
    if len(got) == 0 and len(want) == 0:
        return
    assert _canon(got, ["k", "g"]) == _canon(want, ["k", "g"]), rows

if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-x", "-q"]))
