import numpy as np
import pandas as pd
import pytest
import ray.data

from fs_crawler_ray.multimodal import (
    MediaDecoder,
    decode_media,
    synthesize_media_payloads,
)


@pytest.fixture()
def media_refs():
    return pd.DataFrame({
        "doc_id": ["AAAA-001", "AAAA-002", "AAAA-003"],
        "media_ref": [f"memories/10000000{i}/personas/p{i}" for i in range(3)],
    })


def test_payload_synthesis_deterministic(media_refs):
    a = synthesize_media_payloads(media_refs)
    b = synthesize_media_payloads(media_refs)
    assert a.equals(b)
    assert set(a["media_type"].to_pylist()) <= {"image", "audio", "video"}
    assert all(v > 0 for v in a["payload_len"].to_pylist())


def test_decode_pipeline(media_refs):
    ds = ray.data.from_arrow(synthesize_media_payloads(media_refs))
    out = decode_media(ds, concurrency=2, batch_size=2).to_pandas()
    assert len(out) == 3
    assert {"feature", "decoded_len", "media_type"} <= set(out.columns)
    feats = np.stack(out["feature"].to_numpy())
    assert feats.shape == (3, 5)
    assert (out["decoded_len"] > 0).all()


def test_real_decode_is_explicitly_stubbed():
    d = MediaDecoder()
    if not d.pil:
        with pytest.raises(NotImplementedError):
            d._decode_real(b"xx", "image")


def test_frame_sampler_strides_video_only():
    import hashlib

    from fs_crawler_ray.multimodal import FRAME_BYTES, sample_frames, synthesize_media_payloads

    # enough refs that at least one lands on each media type
    refs = pd.DataFrame({
        "doc_id": [f"AAAA-{i:03d}" for i in range(12)],
        "media_ref": [f"memories/2000000{i}/personas/p{i}" for i in range(12)],
    })
    payloads = synthesize_media_payloads(refs)
    out = sample_frames(ray.data.from_arrow(payloads), stride=4,
                        concurrency=2, batch_size=4).to_pandas()
    types = dict(zip(payloads["media_ref"].to_pylist(), payloads["media_type"].to_pylist()))
    lens = dict(zip(payloads["media_ref"].to_pylist(), payloads["payload_len"].to_pylist()))
    assert len(out) > 0
    # only video rows produce frames
    assert all(types[r] == "video" for r in out["media_ref"])
    for ref, grp in out.groupby("media_ref"):
        n_frames = lens[ref] // FRAME_BYTES
        assert grp["frame_idx"].tolist() == list(range(0, n_frames, 4))
    # every video ref with >=1 full frame is present
    want = {r for r, t in types.items() if t == "video" and lens[r] >= FRAME_BYTES}
    assert set(out["media_ref"]) == want


def test_resize_media_fixed_width():
    from fs_crawler_ray.multimodal import resize_media, synthesize_media_payloads

    refs = pd.DataFrame({
        "doc_id": ["AAAA-001", "AAAA-002"],
        "media_ref": ["memories/1/personas/a", "memories/2/personas/b"],
    })
    ds = ray.data.from_arrow(synthesize_media_payloads(refs))
    out = resize_media(ds, target_len=32, concurrency=2, batch_size=2).to_pandas()
    m = np.stack(out["resized"].to_numpy())
    assert m.shape == (2, 32)
    # endpoints of the interp match the raw byte stream's endpoints
    payloads = synthesize_media_payloads(refs)["payload"].to_pylist()
    for row, p in zip(m, payloads):
        arr = np.frombuffer(p, dtype=np.uint8)
        assert row[0] == float(arr[0]) and row[-1] == float(arr[-1])
    # deterministic
    out2 = resize_media(ds, target_len=32, concurrency=2, batch_size=2).to_pandas()
    assert np.array_equal(np.stack(out2["resized"].to_numpy()), m)


def test_span_composition_counts_and_permille():
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from fs_crawler_ray.multimodal import span_composition

    spans_a = [{"kind": "text", "text": "hello", "media_ref": None, "offset": 0},
               {"kind": "media", "text": None, "media_ref": "m1", "offset": 1},
               {"kind": "media", "text": None, "media_ref": "m2", "offset": 2}]
    spans_b = [{"kind": "text", "text": "hi", "media_ref": None, "offset": 0}]
    t = pa.table({"doc_id": ["a", "b"], "spans": [spans_a, spans_b]})
    out = (span_composition(ray.data.from_arrow(t))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(map(tuple, out.to_numpy())) == [
        ("a", 3, 2, 5, 666), ("b", 1, 0, 2, 0)]


def test_span_kind_counts_spans_vs_docs():
    import pyarrow as pa
    import ray.data

    from fs_crawler_ray.multimodal import span_kind_counts

    mk = lambda k: {"kind": k, "text": "x", "media_ref": None, "offset": 0}
    t = pa.table({"doc_id": ["a", "b"],
                  "spans": [[mk("text"), mk("text"), mk("media")],
                            [mk("text")]]})
    out = (span_kind_counts(ray.data.from_arrow(t))
           .to_pandas().sort_values("kind").reset_index(drop=True))
    assert list(map(tuple, out.to_numpy())) == [
        ("media", 1, 1), ("text", 3, 2)]
