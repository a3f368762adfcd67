"""Unit tests for the wave-19 operators: sliding-window chunking
(text.chunk_spans), Markov transition counts (windows.transition_counts),
per-dimension embedding stats (ann.dim_stats) and co-parent triangle
enumeration (graph.coparent_triangles). Each is also strictly oracled
against DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import dim_stats
from fs_crawler_ray.graph import coparent_triangles
from fs_crawler_ray.text import chunk_spans
from fs_crawler_ray.windows import transition_counts


def test_chunk_spans_boundaries():
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "one",                      # 1 token  -> 1 chunk (0, 1)
            " ".join(["t"] * 64),       # 64       -> 1 chunk (0, 64)
            " ".join(["t"] * 65),       # 65       -> 2 chunks, 2nd (32, 65)
            " ".join(["t"] * 100),      # 100      -> ceil(36/32)+1 = 3
            "!!!",                      # 0 tokens -> no chunks
        ],
    })
    out = (chunk_spans(ray.data.from_pandas(docs), size=64, stride=32)
           .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    assert out[out.doc_id == 1].values.tolist() == [[1, 0, 0, 1]]
    assert out[out.doc_id == 2].values.tolist() == [[2, 0, 0, 64]]
    assert out[out.doc_id == 3].values.tolist() == [[3, 0, 0, 64], [3, 1, 32, 65]]
    c4 = out[out.doc_id == 4]
    assert c4.values.tolist() == [
        [4, 0, 0, 64], [4, 1, 32, 96], [4, 2, 64, 100]]
    assert (out.doc_id != 5).all()
    # every token index is covered by at least one chunk
    for _, g in out.groupby("doc_id"):
        assert g.start_tok.iloc[0] == 0
        assert (g.start_tok.values[1:] <= g.end_tok.values[:-1]).all()


def test_transition_counts_matches_pandas():
    rng = np.random.default_rng(7)
    n = 400
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 25, n),
        "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(
            rng.integers(0, 10_000, n), unit="s"),
        "event_type": rng.choice(["view", "click", "purchase"], n),
    })
    out = (transition_counts(ray.data.from_pandas(df), num_buckets=4)
           .to_pandas().sort_values(["prev_type", "next_type"])
           .reset_index(drop=True))
    s = df.sort_values(["user_id", "ts", "event_id"])
    prev = s.groupby("user_id")["event_type"].shift()
    exp = (pd.DataFrame({"prev_type": prev, "next_type": s["event_type"]})
           .dropna().groupby(["prev_type", "next_type"]).size()
           .rename("cnt").reset_index()
           .sort_values(["prev_type", "next_type"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out.astype({"cnt": "int64"}), exp)


def test_dim_stats_exact():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 8)).astype(np.float32)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(50), "embedding": list(vecs)}))
    out = dim_stats(ds).to_pandas().sort_values("dim").reset_index(drop=True)
    fp = np.floor(vecs.astype(np.float64) * 10**6 + 0.5).astype(np.int64)
    assert (out["n"] == 50).all()
    np.testing.assert_array_equal(out["sum_fp"].to_numpy(), fp.sum(axis=0))
    np.testing.assert_array_equal(out["min_fp"].to_numpy(), fp.min(axis=0))
    np.testing.assert_array_equal(out["max_fp"].to_numpy(), fp.max(axis=0))


def test_coparent_triangles_known_graph():
    # children c1..c3 give co-parent edges A-B, B-C, A-C (a triangle)
    # plus c4 giving D-E (no triangle).
    edges = pd.DataFrame({
        "source":      ["c1", "c1", "c2", "c2", "c3", "c3", "c4", "c4"],
        "destination": ["A", "B", "B", "C", "A", "C", "D", "E"],
    })
    out = (coparent_triangles(ray.data.from_pandas(edges), num_buckets=4)
           .to_pandas().sort_values(["u", "v", "w"]).reset_index(drop=True))
    assert out.values.tolist() == [["A", "B", "C"]]
