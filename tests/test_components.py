"""Unit tests for distributed connected components (hash-min label
propagation over Ray Data) and the fuzzy-dedup clustering built on it
(components.py), plus the deterministic hash sampler and the per-group
exact-quantile kernel added alongside them."""

import numpy as np
import pandas as pd
import ray.data

from fs_crawler_ray.components import (
    connected_components,
    near_dup_survivors,
)


def _cc(pairs):
    ds = ray.data.from_pandas(pd.DataFrame(pairs, columns=["doc_a", "doc_b"]))
    out = connected_components(ds).to_pandas().sort_values("v").reset_index(drop=True)
    return {int(r.v): int(r.component) for r in out.itertuples()}


def test_cc_two_components_and_chain():
    # chain 1-2-3-4 (diameter 3: needs multiple propagation rounds)
    # plus disjoint pair (10, 11)
    got = _cc([(2, 1), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_triangle_merges_with_bridge():
    got = _cc([(5, 6), (6, 7), (5, 7), (7, 100), (100, 42)])
    assert set(got.values()) == {5}
    assert got[42] == 5


def test_cc_empty_pairs():
    ds = ray.data.from_pandas(pd.DataFrame({"doc_a": [], "doc_b": []}).astype(np.int64))
    assert connected_components(ds).count() == 0


def test_cc_long_chain_converges():
    # a 40-link path exercises the iteration loop well past one round
    pairs = [(i, i + 1) for i in range(40)]
    got = _cc(pairs)
    assert set(got.values()) == {0} and len(got) == 41


def test_near_dup_survivors_keeps_min_and_singletons():
    docs = ray.data.from_pandas(pd.DataFrame({"doc_id": [1, 2, 3, 4, 5]}))
    clusters = ray.data.from_pandas(
        pd.DataFrame({"doc_id": [2, 4, 5], "cluster_id": [2, 2, 2]})
    )
    out = near_dup_survivors(docs, clusters).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2, 3]


def test_hash_sample_deterministic_and_disjoint():
    from fs_crawler_ray.text import hash_sample, md5_lower64

    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64)})
    ds = ray.data.from_pandas(df)
    a = sorted(hash_sample(ds, denom=10, keep=0).to_pandas()["doc_id"])
    b = sorted(hash_sample(ds, denom=10, keep=0).to_pandas()["doc_id"])
    assert a == b and len(a) > 0
    # matches the scalar definition
    # NB: uint64 % python-int promotes to float64 and loses precision;
    # keep the modulus as np.uint64 like the operator does
    expect = [i for i in range(200)
              if md5_lower64(np.array([str(i)]))[0] % np.uint64(10) == 0]
    assert a == expect
    # different residues partition the id space
    c = set(hash_sample(ds, denom=10, keep=1).to_pandas()["doc_id"])
    assert not (set(a) & c)


def test_group_quantiles_matches_duckdb_semantics():
    import duckdb

    from fs_crawler_ray.windows import group_quantiles

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 5, size=500),
            "x": rng.normal(size=500).round(4),
        }
    )
    out = (
        group_quantiles(ray.data.from_pandas(df), "k", "x",
                        {"p25": 0.25, "p50": 0.5, "p99": 0.99})
        .to_pandas().sort_values("k").reset_index(drop=True)
    )
    exp = duckdb.sql(
        """SELECT k, quantile_disc(x, 0.25) AS p25, quantile_disc(x, 0.5) AS p50,
                  quantile_disc(x, 0.99) AS p99
           FROM df GROUP BY k ORDER BY k"""
    ).df()
    pd.testing.assert_frame_equal(out.astype({"k": np.int64}), exp.astype({"k": np.int64}))
