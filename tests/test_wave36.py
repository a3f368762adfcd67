"""Unit tests for the wave-36 operators: session-size histogram and
k-means cell-occupancy report. Each is also strictly oracled against
DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import kmeans_cell_sizes


def test_session_size_hist_recomposes_events():
    from fs_crawler_ray.pipelines.relational import (q_events_session_size_hist,
                                                     q_events_sessions)

    sf = "/root/testdata/sf0.001"
    hist = q_events_session_size_hist(sf)
    sess = q_events_sessions(sf)
    # histogram is exactly the size distribution of the session table
    exp = (sess.groupby("n_events").size().reset_index(name="n_sessions")
           .sort_values("n_events").reset_index(drop=True))
    pd.testing.assert_frame_equal(hist.astype("int64"), exp.astype("int64"))
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    assert (hist["n_events"] * hist["n_sessions"]).sum() == len(ev)


def test_kmeans_cell_sizes_partition():
    rng = np.random.default_rng(17)
    n, dim, k = 200, 6, 4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table({"vec_id": np.arange(n),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    out = (kmeans_cell_sizes(ray.data.from_arrow(t), k=k)
           .to_pandas().sort_values("cluster").reset_index(drop=True))
    # sizes partition the corpus; every cluster id is a centroid id
    assert out["n_vecs"].sum() == n
    assert set(out["cluster"]).issubset(set(range(k)))
    # centroids assign to themselves, so every cell is non-empty
    assert (out["n_vecs"] >= 1).all()
