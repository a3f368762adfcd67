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
