"""Unit tests for the wave-20 operators: span interleave transitions
(multimodal.span_transitions), exact Jaccard similarity join
(text.jaccard_pairs), and the robust-outlier / star-join pipelines in
pipelines/relational.py. Each is also strictly oracled against DuckDB
in __ray_entry__."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.multimodal import span_transitions
from fs_crawler_ray.text import jaccard_pairs


def _spans(kinds):
    return [{"kind": k, "text": "x", "media_ref": "", "offset": i}
            for i, k in enumerate(kinds)]


def test_span_transitions_counts_within_doc_only():
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "spans": [
            _spans(["a", "b", "a", "b"]),   # a>b, b>a, a>b
            _spans(["b", "b"]),             # b>b
            _spans(["c"]),                  # no pairs
        ],
    })
    out = (span_transitions(ray.data.from_arrow(docs))
           .to_pandas().sort_values(["prev_kind", "next_kind"])
           .reset_index(drop=True))
    exp = pd.DataFrame({
        "prev_kind": ["a", "b", "b"],
        "next_kind": ["b", "a", "b"],
        "cnt": [2, 1, 1],
    })
    pd.testing.assert_frame_equal(out.astype({"cnt": "int64"}), exp)
    # doc boundaries: the last span of doc 1 ("b") and first of doc 2
    # ("b") must NOT produce an extra b>b — total pairs = 4
    assert out["cnt"].sum() == 4


def test_jaccard_pairs_exact_vs_bruteforce():
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(30):
        toks = rng.choice(vocab, size=rng.integers(5, 15), replace=True)
        docs.append(" ".join(toks))
    # plant a near-duplicate pair
    docs.append(docs[0] + " extra")
    df = pd.DataFrame({"doc_id": np.arange(len(docs)), "text": docs})

    min_permille, max_df = 300, 100
    out = (jaccard_pairs(ray.data.from_pandas(df),
                         min_permille=min_permille, max_df=max_df,
                         num_buckets=4)
           .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))

    sets = {r.doc_id: set(r.text.lower().split()) for r in df.itertuples()}
    df_count: dict = {}
    for s in sets.values():
        for t in s:
            df_count[t] = df_count.get(t, 0) + 1
    sets = {k: {t for t in v if df_count[t] <= max_df}
            for k, v in sets.items()}
    exp_rows = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        if uni and inter * 1000 >= min_permille * uni:
            exp_rows.append((a, b, inter, uni, inter * 1000 // uni))
    exp = pd.DataFrame(exp_rows, columns=[
        "doc_a", "doc_b", "inter", "uni", "jacc_permille"])
    pd.testing.assert_frame_equal(
        out.astype("int64"), exp.astype("int64"))
    assert ((out.doc_a == 0) & (out.doc_b == 30)).any()  # planted pair found


def test_jaccard_pairs_df_cap_drops_hot_tokens():
    # one token shared by every doc must not create pairs once df > max_df
    df = pd.DataFrame({
        "doc_id": np.arange(6),
        "text": [f"common u{i}" for i in range(6)],
    })
    out = jaccard_pairs(ray.data.from_pandas(df), min_permille=1,
                        max_df=3, num_buckets=2).to_pandas()
    assert len(out) == 0
