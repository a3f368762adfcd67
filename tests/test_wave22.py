"""Unit tests for the wave-22 operators: within-cluster scatter
(ann.label_scatter), fixed-round k-core peeling (graph.kcore_peel) and
the market-basket pair query (pipelines.relational.q_part_pairs). Each
is also strictly oracled against DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import label_scatter
from fs_crawler_ray.graph import kcore_peel


def test_label_scatter_matches_bruteforce():
    rng = np.random.default_rng(7)
    n, dim = 200, 6
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 4, size=n).astype(np.int32)
    t = pa.table({
        "vec_id": np.arange(n),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": labels,
    })
    out = (label_scatter(ray.data.from_arrow(t))
           .to_pandas().sort_values("label").reset_index(drop=True))

    vi = np.floor(vecs.astype(np.float64) * 10**4 + 0.5).astype(np.int64)
    exp_rows = []
    for lab in sorted(set(labels.tolist())):
        m = vi[labels == lab]
        k = len(m)
        scatter = int(np.sum(k * np.sum(m * m, axis=0)
                             - np.sum(m, axis=0) ** 2))
        exp_rows.append({"label": lab, "n_vecs": k, "scatter_fp": scatter})
    exp = pd.DataFrame(exp_rows)
    pd.testing.assert_frame_equal(
        out.astype({"label": "int64", "n_vecs": "int64",
                    "scatter_fp": "int64"}),
        exp.astype({"label": "int64", "n_vecs": "int64",
                    "scatter_fp": "int64"}))
    # the identity: scatter_fp = n^2 * sum of per-dim population variances
    for r in exp_rows:
        m = vi[labels == r["label"]].astype(np.float64)
        var_sum = float(np.sum(np.var(m, axis=0)))
        assert abs(r["scatter_fp"] - r["n_vecs"] ** 2 * var_sum) < 1e-3 * max(
            1.0, abs(r["scatter_fp"]))


def _edges(pairs):
    # child -> parent spans: child c has parents p (one edge per pair)
    return ray.data.from_arrow(pa.table({
        "source": [c for c, _ in pairs],
        "destination": [p for _, p in pairs],
    }))


def test_kcore_peel_cascades():
    # Co-parent graph: triangle a-b-c (each pair shares a child) plus a
    # pendant path c-d, d-e. Peeling deg<2: round 1 drops e (deg 1),
    # round 2 drops d (deg fell to 1), the triangle survives with deg 2.
    pairs = []
    for i, (u, v) in enumerate([("a", "b"), ("b", "c"), ("a", "c"),
                                ("c", "d"), ("d", "e")]):
        pairs += [(f"ch{i}", u), (f"ch{i}", v)]
    out = (kcore_peel(_edges(pairs), k=2, rounds=3)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = pd.DataFrame({"id": ["a", "b", "c"], "deg": [2, 2, 2]})
    pd.testing.assert_frame_equal(out.astype({"deg": "int64"}), exp)


def test_kcore_zero_rounds_is_full_graph():
    pairs = [("ch0", "a"), ("ch0", "b"), ("ch1", "b"), ("ch1", "c")]
    out = (kcore_peel(_edges(pairs), k=2, rounds=0)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = pd.DataFrame({"id": ["a", "b", "c"], "deg": [1, 2, 1]})
    pd.testing.assert_frame_equal(out.astype({"deg": "int64"}), exp)


def test_q_part_pairs_matches_bruteforce():
    from fs_crawler_ray.pipelines.relational import q_part_pairs

    sf = "/root/testdata/sf0.001"
    out = q_part_pairs(sf, k=15)
    li = pd.read_parquet(f"{sf}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).drop_duplicates()
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    exp = (m.groupby(["l_partkey_x", "l_partkey_y"]).size()
           .reset_index(name="cnt")
           .rename(columns={"l_partkey_x": "p1", "l_partkey_y": "p2"})
           .sort_values(["cnt", "p1", "p2"], ascending=[False, True, True])
           .head(15).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"p1": "int64", "p2": "int64", "cnt": "int64"}),
        exp.astype({"p1": "int64", "p2": "int64", "cnt": "int64"}))
