"""Unit tests for the wave-32 operators: quantization reconstruction
error (ann.quantization_error), the 1-hour attribution-window
conversion query, and the dup-cluster size histogram composition.
Each is also strictly oracled against DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import quantization_error


def test_quantization_error_matches_bruteforce():
    rng = np.random.default_rng(21)
    n, dim = 300, 5
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table({"vec_id": np.arange(n),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    out = (quantization_error(ray.data.from_arrow(t))
           .to_pandas().sort_values("i").reset_index(drop=True))

    vi = np.floor(vecs.astype(np.float64) * 10**6 + 0.5).astype(np.int64)
    mn = vi.min(axis=0)
    rr = np.maximum(vi.max(axis=0) - mn, 1)
    q = ((vi - mn) * 255) // rr
    rec = mn + (q * rr) // 255
    err = np.abs(vi - rec)
    assert out["n"].tolist() == [n] * dim
    assert out["max_abs_err"].tolist() == err.max(axis=0).tolist()
    assert out["sum_abs_err"].tolist() == err.sum(axis=0).tolist()
    # int8-style quantization at 1e6 fix-point: error bounded by one
    # quantization step (range/255), and far below it on average
    step = rr // 255 + 1
    assert (out["max_abs_err"].to_numpy() <= step).all()


def test_conversions_subset_of_asof():
    from fs_crawler_ray.pipelines.relational import (
        q_events_asof_purchase_click, q_events_conversions_1h)

    sf = "/root/testdata/sf0.001"
    conv = q_events_conversions_1h(sf)
    asof = q_events_asof_purchase_click(sf)
    # every conversion is an as-of match whose gap is within the hour
    merged = conv.merge(asof, on=["user_id", "purchase_id"], how="left")
    assert merged["click_ts_y"].notna().all()
    gaps = merged["purchase_ts_x"] - merged["click_ts_x"]
    assert (gaps <= pd.Timedelta(hours=1)).all()
    # and the as-of rows outside the window are excluded
    wide = asof[(asof["purchase_ts"] - asof["click_ts"])
                > pd.Timedelta(hours=1)]
    assert not wide.merge(conv, on=["user_id", "purchase_id"]).shape[0]


def test_cluster_sizes_sum_to_clustered_docs():
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    hist = e.queries()["docs_cluster_sizes"](sf)
    clusters = e.queries()["docs_dup_clusters"](sf)
    assert (hist["cluster_size"] * hist["n_clusters"]).sum() == len(clusters)
