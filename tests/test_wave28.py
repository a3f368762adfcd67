"""Unit tests for the wave-28 operators: duplicated-region interval
merge (text.dup_spans_merged), consecutive-day streaks
(windows.user_streaks) and the shard checksum manifest
(text.shard_manifest). Each is also strictly oracled against DuckDB in
__ray_entry__."""

import datetime
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.text import dup_spans_merged, shard_manifest
from fs_crawler_ray.windows import user_streaks


def test_dup_spans_merged_interval_union():
    # Two docs sharing a long common region: every 16-token window of
    # the shared region fingerprints identically, so the merged span
    # covers the full region in one interval per doc.
    shared = " ".join(f"common{i}" for i in range(40))
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": [shared + " tail1 specific words here",
                 shared + " other unrelated ending tokens",
                 "a completely different document entirely"],
    })
    out = (dup_spans_merged(ray.data.from_arrow(docs), window=16, stride=8)
           .to_pandas().sort_values(["doc_id", "span_start"])
           .reset_index(drop=True))
    assert set(out["doc_id"]) == {1, 2}
    for _, r in out.iterrows():
        assert r["span_start"] == 0
        # windows at 0,8,16,24 all duplicate -> merged end = 24+16 = 40
        assert r["span_end"] == 40
    assert len(out) == 2


def test_user_streaks_islands():
    def ts(day, h=0):
        return datetime.datetime(2024, 1, day, h)

    rows = [
        # user 1: days 1,2,3 then 5,6 -> max streak 3
        (1, ts(1)), (1, ts(2)), (1, ts(2, 12)), (1, ts(3)),
        (1, ts(5)), (1, ts(6)),
        # user 2: single day -> 1
        (2, ts(10)),
    ]
    t = pa.table({
        "user_id": [r[0] for r in rows],
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    out = (user_streaks(ray.data.from_arrow(t))
           .to_pandas().sort_values("user_id").reset_index(drop=True))
    exp = pd.DataFrame({"user_id": [1, 2], "max_streak": [3, 1]})
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))


def test_shard_manifest_checksum_is_order_independent():
    docs = pa.table({"doc_id": list(range(100)),
                     "text": [f"text number {i}" for i in range(100)]})
    a = shard_manifest(ray.data.from_arrow(docs), num_shards=4)
    # reversed row order -> identical manifest (XOR is commutative)
    rev = docs.take(pa.array(list(range(99, -1, -1))))
    b = shard_manifest(ray.data.from_arrow(rev), num_shards=4)
    pd.testing.assert_frame_equal(a, b)
    assert a["n_docs"].sum() == 100
    # spot-check one shard against hand-rolled md5 arithmetic
    def low64(s):
        return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16],
                              "little")
    shard0 = [i for i in range(100) if low64(str(i)) % 4 == 0]
    fp = 0
    for i in shard0:
        fp ^= low64(f"text number {i}")
    row = a[a["shard"] == 0].iloc[0]
    assert row["n_docs"] == len(shard0)
    assert row["content_fp"] == np.uint64(fp).astype(np.int64)
