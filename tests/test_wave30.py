"""Unit tests for the wave-30 operators: forward as-of join
(windows.asof_join direction="forward"), windowed co-occurrence pairs
(text.skipgram_pairs) and the squared-norm histogram
(ann.sqnorm_hist). Each is also strictly oracled against DuckDB in
__ray_entry__."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import sqnorm_hist
from fs_crawler_ray.text import skipgram_pairs
from fs_crawler_ray.windows import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_forward_picks_next_row():
    left = ray.data.from_arrow(pa.table({
        "k": [1, 1, 2], "ts": pa.array([_ts(10), _ts(40), _ts(5)],
                                       pa.timestamp("us")),
        "lid": [100, 101, 102],
    }))
    right = ray.data.from_arrow(pa.table({
        "k": [1, 1, 1, 2],
        "ts": pa.array([_ts(5), _ts(12), _ts(30), _ts(1)],
                       pa.timestamp("us")),
        "val": [1.0, 2.0, 3.0, 4.0],
    }))
    out = (asof_join(left, right, key="k", ts_col="ts", left_cols=["lid"],
                     right_cols=["val"], direction="forward")
           .to_pandas().sort_values("lid").reset_index(drop=True))
    # lid 100 (ts 10) -> next right at 12 (val 2); lid 101 (ts 40) -> no
    # later right row, dropped; lid 102 (k=2, ts 5) -> none after, dropped
    assert out["lid"].tolist() == [100]
    assert out["val"].tolist() == [2.0]

    back = (asof_join(left, right, key="k", ts_col="ts", left_cols=["lid"],
                      right_cols=["val"])
            .to_pandas().sort_values("lid").reset_index(drop=True))
    assert back["lid"].tolist() == [100, 101, 102]
    assert back["val"].tolist() == [1.0, 3.0, 4.0]


def test_skipgram_pairs_window_and_canonical_order():
    docs = pa.table({
        "doc_id": [1],
        "text": ["b a c a"],  # positions: b0 a1 c2 a3
    })
    out = (skipgram_pairs(ray.data.from_arrow(docs), max_dist=2, top_n=50)
           .to_pandas().sort_values(["cnt", "tok_a", "tok_b"],
                                    ascending=[False, True, True])
           .reset_index(drop=True))
    # within dist<=2: (b,a) (b,c) (a,c) (a,a->skip) (c,a) = a<c twice
    got = {(r["tok_a"], r["tok_b"]): r["cnt"] for _, r in out.iterrows()}
    assert got == {("a", "c"): 2, ("a", "b"): 1, ("b", "c"): 1}


def test_sqnorm_hist_buckets():
    vecs = [[1.0, 0.0], [0.6, 0.8], [2.0, 0.0]]  # sqnorms 1, 1, 4 (x1e8)
    t = pa.table({"vec_id": [0, 1, 2],
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    out = (sqnorm_hist(ray.data.from_arrow(t), bucket_width=10**8)
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    exp = pd.DataFrame({"bucket": [1, 4], "n_vecs": [2, 1]})
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))
