"""Unit tests for the wave-23 operators: k-means assignment step
(ann.kmeans_assign), NTILE quality bucketing (text.rarity_tiles) and
year-over-year growth (pipelines.relational.q_orders_yearly_growth).
Each is also strictly oracled against DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import kmeans_assign
from fs_crawler_ray.text import rarity_tiles


def test_kmeans_assign_matches_bruteforce():
    rng = np.random.default_rng(3)
    n, dim, k = 120, 5, 4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    ids = rng.permutation(n) + 100  # non-contiguous, unsorted ids
    t = pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    out = (kmeans_assign(ray.data.from_arrow(t), k=k)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    vi = np.floor(vecs.astype(np.float64) * 10**4 + 0.5).astype(np.int64)
    order = np.argsort(ids)
    cent_rows = order[:k]
    ci, cids = vi[cent_rows], ids[cent_rows]
    d = ((vi[:, None, :] - ci[None, :, :]) ** 2).sum(-1)
    best = np.argmin(d, axis=1)
    exp = pd.DataFrame({
        "vec_id": ids, "cluster": cids[best],
        "dist_fp": d[np.arange(n), best],
    }).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64"))
    # centroids assign to themselves at distance 0
    self_rows = out[out["vec_id"].isin(cids)]
    assert (self_rows["cluster"] == self_rows["vec_id"]).all()
    assert (self_rows["dist_fp"] == 0).all()


def test_rarity_tiles_ntile_semantics():
    # 7 docs, 3 tiles -> sizes 3, 2, 2 (first n%k tiles get the extra)
    docs = pa.table({
        "doc_id": list(range(7)),
        "text": ["rare%d common common" % i for i in range(7)],
    })
    out = (rarity_tiles(ray.data.from_arrow(docs), n_tiles=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    sizes = out["tile"].value_counts().sort_index().tolist()
    assert sizes == [3, 2, 2]
    # 'common' is the most frequent token (rank 1); each rare%d token
    # ranks 2..8 by ascending spelling, so rarity DESCENDS with doc_id
    # reversed: docs 6,5,4 are tile 1, docs 3,2 tile 2, docs 1,0 tile 3
    assert out["tile"].tolist() == [3, 3, 2, 2, 1, 1, 1]


def test_yearly_growth_delta_identity():
    from fs_crawler_ray.pipelines.relational import q_orders_yearly_growth

    out = q_orders_yearly_growth("/root/testdata/sf0.001")
    assert (out["year"].diff().dropna() >= 1).all()
    # delta telescopes: first delta is 0, the rest recompose rev_cents
    assert out["delta_cents"].iloc[0] == 0
    recomposed = out["rev_cents"].shift(1).fillna(0) + out["delta_cents"]
    assert (recomposed[1:] == out["rev_cents"][1:]).all()
