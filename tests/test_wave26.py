"""Unit tests for the wave-26 operators: hash split assignment
(text.split_assign), power-of-two length buckets (text.length_buckets)
and the Levenshtein near-dup verifier (text.edit_distance_pairs /
text._levenshtein_row). Each is also strictly oracled against DuckDB
in __ray_entry__."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from fs_crawler_ray.text import (_levenshtein_row, edit_distance_pairs,
                                 length_buckets, split_assign)


def test_split_assign_matches_md5_and_covers():
    ids = list(range(1000))
    t = pa.table({"doc_id": ids})
    out = (split_assign(ray.data.from_arrow(t))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    # bucket is md5-lower64 % 100 of the stringified id (DuckDB's
    # md5_number_lower: little-endian uint64 of digest bytes 8:16)
    for i in (0, 17, 999):
        h = int.from_bytes(hashlib.md5(str(i).encode()).digest()[8:16],
                           "little") % 100
        assert out["bucket"].iloc[i] == h
    frac = out["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert 0.05 < frac["valid"] < 0.15
    assert 0.05 < frac["test"] < 0.15
    # splits follow buckets exactly
    assert ((out["bucket"] < 80) == (out["split"] == "train")).all()


def test_length_buckets_bit_length():
    docs = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": ["one", "a b c", "w " * 8, ""],  # 1, 3, 8, 0 tokens
    })
    out = (length_buckets(ray.data.from_arrow(docs))
           .to_pandas().sort_values("bucket").reset_index(drop=True))
    got = dict(zip(out["bucket"], zip(out["n_docs"], out["total_tokens"])))
    assert got == {0: (1, 0), 1: (1, 1), 2: (1, 3), 4: (1, 8)}


def _ref_lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[-1]


def test_levenshtein_row_matches_reference():
    rng = np.random.default_rng(9)
    for _ in range(30):
        a = "".join(rng.choice(list("abcd"), rng.integers(0, 12)))
        b = "".join(rng.choice(list("abcd"), rng.integers(0, 12)))
        got = _levenshtein_row(a, np.array(list(b))) if b else len(a)
        assert got == _ref_lev(a, b), (a, b)


def test_edit_distance_pairs_on_duplicates():
    texts = ["the quick brown fox jumps over the lazy dog again and again",
             "the quick brown fox jumps over the lazy dog again and again",
             "something entirely different with no overlap whatsoever here"]
    docs = pa.table({"doc_id": [1, 2, 3], "text": texts})
    out = (edit_distance_pairs(ray.data.from_arrow(docs), threshold=0.8)
           .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out["edit_dist"].iloc[0] == 0
