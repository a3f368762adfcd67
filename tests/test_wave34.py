"""Unit tests for the wave-34 operators: global clustering moments
(graph.clustering_global) and conversion-latency quantiles. Each is
also strictly oracled against DuckDB in __ray_entry__."""

import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.graph import clustering_global


def _edges(pairs):
    return ray.data.from_arrow(pa.table({
        "source": [c for c, _ in pairs],
        "destination": [p for _, p in pairs],
    }))


def test_clustering_global_triangle_plus_tail():
    # co-parent graph: triangle a-b-c plus pendant edge c-d
    pairs = []
    for i, (u, v) in enumerate([("a", "b"), ("b", "c"), ("a", "c"),
                                ("c", "d")]):
        pairs += [(f"ch{i}", u), (f"ch{i}", v)]
    out = clustering_global(_edges(pairs)).to_pandas()
    # degrees: a=2 b=2 c=3 d=1 -> wedges = 1+1+3+0 = 5; closed = 3*1
    assert out["n_wedges"].iloc[0] == 5
    assert out["n_closed"].iloc[0] == 3


def test_ttc_quantiles_monotone_and_nonnegative():
    from fs_crawler_ray.pipelines.relational import q_events_ttc_quantiles

    out = q_events_ttc_quantiles("/root/testdata/sf0.001")
    assert len(out) == 1
    row = out.iloc[0]
    assert 0 <= row["p25"] <= row["p50"] <= row["p75"] <= row["p95"]


def test_customer_rfm_consistency():
    from fs_crawler_ray.pipelines.relational import q_customer_rfm

    out = q_customer_rfm("/root/testdata/sf0.001")
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    assert out["n_orders"].sum() == len(orders)
    assert (out["n_orders"] >= 1).all()
    # monetary totals recompose the corpus total in cents
    import numpy as np
    exp = int(np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).sum())
    assert out["total_cents"].sum() == exp


def test_pq_assign_matches_per_subspace_bruteforce():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from fs_crawler_ray.ann import pq_assign

    rng = np.random.default_rng(31)
    n, dim, k = 100, 8, 4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table({"vec_id": np.arange(n),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    out = (pq_assign(ray.data.from_arrow(t), k=k, n_sub=2)
           .to_pandas().sort_values(["vec_id", "sub"]).reset_index(drop=True))
    vi = np.floor(vecs.astype(np.float64) * 10**4 + 0.5).astype(np.int64)
    ci = vi[:k]
    for s, (lo, hi) in enumerate([(0, 4), (4, 8)]):
        d = ((vi[:, lo:hi, None] - ci[:, lo:hi].T[None]) ** 2).sum(axis=1)
        best = np.argmin(d, axis=1)
        rows = out[out["sub"] == s].reset_index(drop=True)
        assert rows["code"].tolist() == best.tolist()
        assert rows["dist_fp"].tolist() == d[np.arange(n), best].tolist()
    # every vector gets exactly n_sub codes
    assert len(out) == 2 * n
