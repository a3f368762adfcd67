"""Unit tests for the wave-24 operators: Gopher-style quality rules
(text.gopher_stats), per-modality composition stats
(multimodal.media_type_stats) and inter-centroid separation
(ann.centroid_dists). Each is also strictly oracled against DuckDB in
__ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import centroid_dists
from fs_crawler_ray.text import gopher_stats


def test_gopher_stats_rules():
    docs = pa.table({
        "doc_id": [0, 1, 2],
        "text": [
            # 40 tokens, plenty of stopwords, word length in band
            " ".join(["the", "quick", "brown", "fox"] * 10),
            # too short (3 tokens)
            "tiny doc here",
            # 40 tokens but zero stopwords
            " ".join(["zebra", "quark", "vortex", "prism"] * 10),
        ],
    })
    out = (gopher_stats(ray.data.from_arrow(docs))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["n_tokens"].tolist() == [40, 3, 40]
    # doc 0: 10 "the" of 40 -> 250 permille
    assert out["stop_pm"].tolist()[0] == 250
    assert out["passed"].tolist() == [1, 0, 0]
    # mean word length in deci-chars: doc 0 = (3+5+5+3)*10*10 // 40 = 40
    assert out["mwl10"].iloc[0] == 40


def test_centroid_dists_matches_bruteforce():
    rng = np.random.default_rng(5)
    n, dim, k = 150, 4, 3
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, k, size=n).astype(np.int32)
    t = pa.table({
        "vec_id": np.arange(n),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": labels,
    })
    out = (centroid_dists(ray.data.from_arrow(t))
           .to_pandas().reset_index(drop=True))

    vi = np.floor(vecs.astype(np.float64) * 10**4 + 0.5).astype(np.int64)
    means = {}
    for lab in range(k):
        m = vi[labels == lab]
        means[lab] = (m.sum(axis=0) + len(m) * 160000) // len(m)
    rows = []
    for a in range(k):
        for b in range(a + 1, k):
            rows.append({"label_a": a, "label_b": b,
                         "dist_fp": int(((means[a] - means[b]) ** 2).sum())})
    exp = pd.DataFrame(rows)
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))
    # offset invariance: distances are unchanged by the +16·scale shift
    for r in rows:
        raw = ((vi[labels == r["label_a"]].mean(axis=0)
                - vi[labels == r["label_b"]].mean(axis=0)) ** 2).sum()
        assert abs(r["dist_fp"] - raw) < 4 * 4 * 10**4  # floor error bound


def test_media_type_stats_consistent_with_features():
    from fs_crawler_ray.multimodal import (media_feature_pipeline,
                                           media_type_stats)

    sf = "/root/testdata/sf0.001"
    stats = media_type_stats(sf)
    feats = media_feature_pipeline(sf)
    if len(feats) == 0:
        assert len(stats) == 0
        return
    exp = (feats.groupby("media_type")
           .agg(n_media=("media_ref", "size"),
                n_docs=("doc_id", "nunique"),
                total_len=("decoded_len", "sum"))
           .reset_index().sort_values("media_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        stats.astype({"n_media": "int64", "n_docs": "int64",
                      "total_len": "int64"}),
        exp.astype({"n_media": "int64", "n_docs": "int64",
                    "total_len": "int64"}))
