"""Unit tests for the wave-27 operators: media-position deciles
(multimodal.span_media_position), per-member centroid deviation
(ann.label_deviation) and the weekday profile
(pipelines.relational.q_events_weekday_profile). Each is also strictly
oracled against DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import label_deviation
from fs_crawler_ray.multimodal import span_media_position


def _doc(kinds):
    return [{"kind": k, "text": "x", "media_ref": "", "offset": i}
            for i, k in enumerate(kinds)]


def test_span_media_position_deciles():
    docs = pa.table({
        "doc_id": [1, 2],
        "spans": [
            # 10 spans, media at ordinals 0 and 9 -> deciles 0 and 9
            _doc(["media"] + ["t"] * 8 + ["media"]),
            # 5 spans, media at ordinal 2 -> decile 2*10//5 = 4
            _doc(["t", "t", "media", "t", "t"]),
        ],
    })
    out = (span_media_position(ray.data.from_arrow(docs))
           .to_pandas().sort_values("decile").reset_index(drop=True))
    exp = pd.DataFrame({"decile": [0, 4, 9], "n_media": [1, 1, 1]})
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))


def test_label_deviation_matches_bruteforce_and_centroid_zero():
    rng = np.random.default_rng(13)
    n, dim = 90, 4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 3, size=n).astype(np.int32)
    t = pa.table({
        "vec_id": np.arange(n),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": labels,
    })
    out = (label_deviation(ray.data.from_arrow(t))
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    vi = np.floor(vecs.astype(np.float64) * 10**4 + 0.5).astype(np.int64)
    exp = np.empty(n, dtype=np.int64)
    for lab in range(3):
        idx = np.flatnonzero(labels == lab)
        s = vi[idx].sum(axis=0)
        k = len(idx)
        exp[idx] = ((k * vi[idx] - s) ** 2).sum(axis=1)
    assert out["nsq_dist_fp"].to_numpy().tolist() == exp.tolist()
    # a label whose members are all identical deviates by exactly zero
    same = pa.table({
        "vec_id": [0, 1], "label": np.array([7, 7], np.int32),
        "embedding": pa.array([[0.5, -0.25]] * 2, pa.list_(pa.float32())),
    })
    z = label_deviation(ray.data.from_arrow(same)).to_pandas()
    assert (z["nsq_dist_fp"] == 0).all()


def test_weekday_profile_isodow_range():
    from fs_crawler_ray.pipelines.relational import q_events_weekday_profile

    out = q_events_weekday_profile("/root/testdata/sf0.001")
    assert out["isodow"].between(1, 7).all()
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet",
                         columns=["ts", "event_type", "value"])
    assert out["n_events"].sum() == len(ev)
    exp_cents = int(np.floor(ev["value"].to_numpy() * 100 + 0.5).sum())
    assert out["total_cents"].sum() == exp_cents
