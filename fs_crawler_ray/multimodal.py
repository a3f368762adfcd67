"""Multimodal column handling: opaque binary payloads + typed metadata,
decode / feature-extract as actor-pool stages.

The crawl's media spans (evidence persona URIs, persons.json
``evidence[]``) reference binary payloads. At deployment scale those
are image/audio bytes in a Lance ``binary`` column; in this container
the decode libraries (PIL/torchaudio/ffmpeg) are NOT installed, so the
decode step is a clearly-marked deterministic fake behind an
import-try — the Ray-side plumbing (schema, small batch sizes for wide
binary rows, actor-pool signature, output layout) is real and tested.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("media_type", pa.string()),   # image | audio | video
        ("payload", pa.binary()),      # opaque bytes
        ("payload_len", pa.int64()),
    ]
)


def synthesize_media_payloads(media_refs: pd.DataFrame) -> pa.Table:
    """Deterministic fake payloads for the media table (the sandbox's
    stand-in for fetched binary blobs): bytes are a seeded function of
    the media_ref, type cycles image/audio/video."""
    types = ["image", "audio", "video"]
    payloads, mtypes = [], []
    for ref in media_refs["media_ref"]:
        seed = int(hashlib.md5(ref.encode()).hexdigest()[:8], 16)
        rng = np.random.RandomState(seed)
        payloads.append(rng.bytes(64 + seed % 192))
        mtypes.append(types[seed % 3])
    return pa.table(
        {
            "doc_id": pa.array(media_refs["doc_id"].astype(str)),
            "media_ref": pa.array(media_refs["media_ref"].astype(str)),
            "media_type": pa.array(mtypes, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "payload_len": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class MediaDecoder:
    """Actor-pool decode/feature stage. Real libraries are gated behind
    import-try; without them the features are a deterministic fake
    (byte-level stats) so the pipeline shape is exercised end-to-end.

    Use small batch sizes for wide binary rows (batch × concurrency
    must fit worker heaps) — callers pass ``batch_size<=256``.
    """

    def __init__(self, target_size: tuple[int, int] = (64, 64)):
        self.target_size = target_size
        try:  # pragma: no cover - not installed in this container
            import PIL.Image  # noqa: F401

            self.pil = True
        except ImportError:
            self.pil = False

    def _decode_real(self, payload: bytes, media_type: str) -> np.ndarray:
        raise NotImplementedError(
            "real decode requires PIL/torchaudio/ffmpeg — not available in this container"
        )

    def _decode_fake(self, payload: bytes, media_type: str) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
        return arr

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, widths = [], []
        for payload, mtype in zip(batch["payload"].to_pylist(), batch["media_type"].to_pylist()):
            if self.pil:
                arr = self._decode_real(payload, mtype)
            else:
                arr = self._decode_fake(payload, mtype)
            feats.append(
                [
                    round(float(arr.mean()), 4),
                    round(float(arr.std()), 4),
                    float(len(arr)),
                    round(float(arr.min()), 4),
                    round(float(arr.max()), 4),
                ]
            )
            widths.append(len(arr))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_ref": batch["media_ref"],
                "media_type": batch["media_type"],
                "feature": pa.array(feats, pa.list_(pa.float32())),
                "decoded_len": pa.array(widths, pa.int64()),
            }
        )


def decode_media(
    media: ray.data.Dataset, concurrency: int = 4, batch_size: int = 128
) -> ray.data.Dataset:
    return media.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,  # small: binary rows are wide
        concurrency=(1, concurrency),
    )


def media_feature_pipeline(sf_dir: str) -> pd.DataFrame:
    """End-to-end: corpus media spans → synthetic payload table →
    actor-pool decode → features. (rows-only check; decode is the
    deterministic fake in this container)."""
    from fs_crawler_ray.pipelines.crawl_queries import span_media

    refs = span_media(sf_dir)
    if len(refs) == 0:
        return pd.DataFrame({"doc_id": [], "media_ref": [], "media_type": [], "decoded_len": []})
    payloads = synthesize_media_payloads(refs)
    ds = ray.data.from_arrow(payloads)
    out = decode_media(ds).to_pandas()
    return out[["doc_id", "media_ref", "media_type", "decoded_len"]].sort_values(
        ["doc_id", "media_ref"]
    ).reset_index(drop=True)


FRAME_BYTES = 16  # fake-decode frame width (bytes per "frame")


class FrameSampler:
    """Actor-pool frame-sampling stage for video rows: split the decoded
    byte stream into fixed-width frames and keep every ``stride``-th one
    (the sampled-frame extraction step of a video training pipeline).
    One input row fans out to ``ceil(n_frames / stride)`` output rows —
    real flat-map plumbing over wide binary rows (keep batches small).
    The per-frame decode is the container's deterministic fake (frame =
    FRAME_BYTES consecutive payload bytes), so the sampled (doc_id,
    media_ref, frame_idx) set is exactly SQL-reproducible from
    md5(media_ref); a real deployment swaps in ffmpeg keyframe decode
    behind the same signature."""

    def __init__(self, stride: int = 4, frame_bytes: int = FRAME_BYTES):
        self.stride = int(stride)
        self.frame_bytes = int(frame_bytes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, refs, idxs, means = [], [], [], []
        for doc_id, ref, payload, mtype in zip(
            batch["doc_id"].to_pylist(), batch["media_ref"].to_pylist(),
            batch["payload"].to_pylist(), batch["media_type"].to_pylist(),
        ):
            if mtype != "video":
                continue
            arr = np.frombuffer(payload, dtype=np.uint8)
            n_frames = len(arr) // self.frame_bytes
            for i in range(0, n_frames, self.stride):
                frame = arr[i * self.frame_bytes:(i + 1) * self.frame_bytes]
                doc_ids.append(doc_id)
                refs.append(ref)
                idxs.append(i)
                means.append(round(float(frame.mean()), 4))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "frame_mean": pa.array(means, pa.float32()),
        })


def sample_frames(
    media: ray.data.Dataset, stride: int = 4, concurrency: int = 4, batch_size: int = 128
) -> ray.data.Dataset:
    return media.map_batches(
        FrameSampler, fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )


class MediaResizer:
    """Actor-pool resize stage: every payload is resampled to a fixed
    ``target_len`` feature vector (np.interp over the byte stream — the
    deterministic stand-in for bilinear image resize / audio resample;
    the real kernel slots into ``_resize_real`` behind the import-try,
    same contract). Output rows are fixed-width ``list<float32>`` —
    the layout a downstream embedding/training stage consumes."""

    def __init__(self, target_len: int = 64):
        self.target_len = int(target_len)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        xs = np.arange(self.target_len, dtype=np.float64)
        for payload in batch["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            if len(arr) == 0:
                out.append(np.zeros(self.target_len, dtype=np.float32))
                continue
            src_x = xs * (len(arr) - 1) / max(self.target_len - 1, 1)
            out.append(np.interp(src_x, np.arange(len(arr)), arr).astype(np.float32))
        return pa.table({
            "doc_id": batch["doc_id"],
            "media_ref": batch["media_ref"],
            "media_type": batch["media_type"],
            "resized": pa.array([list(map(float, o)) for o in out], pa.list_(pa.float32())),
        })


def resize_media(
    media: ray.data.Dataset, target_len: int = 64, concurrency: int = 4, batch_size: int = 128
) -> ray.data.Dataset:
    return media.map_batches(
        MediaResizer, fn_constructor_kwargs={"target_len": target_len},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=(1, concurrency),
    )


def media_frame_sample_pipeline(sf_dir: str, stride: int = 4) -> pd.DataFrame:
    """End-to-end: corpus media spans → payload table → actor-pool frame
    sampling over video rows. Strictly oracled: payload length (and so
    the sampled frame-index set) is a pure function of md5(media_ref)."""
    from fs_crawler_ray.pipelines.crawl_queries import span_media

    refs = span_media(sf_dir)
    if len(refs) == 0:
        return pd.DataFrame({"doc_id": [], "media_ref": [], "frame_idx": []})
    payloads = synthesize_media_payloads(refs)
    ds = ray.data.from_arrow(payloads)
    out = sample_frames(ds, stride=stride).to_pandas()
    return out[["doc_id", "media_ref", "frame_idx"]].sort_values(
        ["doc_id", "media_ref", "frame_idx"]
    ).reset_index(drop=True)


def span_composition(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document interleave composition over the Lance-shaped span
    table (``doc_id, spans: list<struct<kind,text,media_ref,offset>>``)
    — the modality-mix profile a multimodal training pipeline uses to
    balance batches and filter text-only/media-only docs:
    ``(doc_id, n_spans, n_media, text_chars, media_permille)``.

    Map-only and shuffle-free: Arrow ``list_flatten`` /
    ``list_parent_indices`` / ``struct_field`` kernels plus two
    bincount/scatter-adds per batch; integers out, so the UNNEST +
    GROUP BY oracle matches exactly.
    """
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        n_docs = len(t)
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kind = pc.struct_field(flat, "kind")
        text = pc.struct_field(flat, "text")
        n_spans = pc.list_value_length(spans).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        med = pc.equal(kind, "media").to_numpy(zero_copy_only=False)
        n_media = np.bincount(parent[med], minlength=n_docs).astype(np.int64)
        tc = pc.utf8_length(pc.fill_null(text, "")).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        text_chars = np.zeros(n_docs, dtype=np.int64)
        np.add.at(text_chars, parent, tc)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_spans": pa.array(n_spans),
            "n_media": pa.array(n_media),
            "text_chars": pa.array(text_chars),
            "media_permille": pa.array(
                np.where(n_spans > 0, n_media * 1000 // np.maximum(n_spans, 1), 0)),
        })

    return ds.select_columns(["doc_id", "spans"]).map_batches(
        fn, batch_format="pyarrow")


def span_kind_counts(ds: ray.data.Dataset, agg_partitions: int = 8) -> ray.data.Dataset:
    """Corpus schema profile of the interleaved span table:
    ``(kind, n_spans, n_docs)`` — total spans of each kind and the
    number of documents containing at least one. Per-batch partials
    (one dictionary-encode + two bincounts), then a kind-cardinality
    shuffle (a handful of rows per batch)."""
    import pyarrow.compute as pc

    from fs_crawler_ray.relops import bucketed_agg

    def partial(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kind = pc.struct_field(flat, "kind")
        enc = pc.dictionary_encode(kind)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        n_spans = np.bincount(codes, minlength=k).astype(np.int64)
        # docs containing the kind: unique (doc, kind) pairs per batch
        uniq = np.unique(parent * k + codes)
        n_docs = np.bincount(uniq % k, minlength=k).astype(np.int64)
        return pa.table({"kind": enc.dictionary, "n_spans_p": n_spans,
                         "n_docs_p": n_docs})

    agg = bucketed_agg(
        ds.select_columns(["doc_id", "spans"]).map_batches(
            partial, batch_format="pyarrow"),
        ["kind"],
        [("n_spans_p", "sum", "sum(n_spans_p)"), ("n_docs_p", "sum", "sum(n_docs_p)")],
        num_buckets=agg_partitions,
    )
    return agg.map_batches(
        lambda t: pa.table({"kind": t["kind"],
                            "n_spans": t["sum(n_spans_p)"].cast(pa.int64()),
                            "n_docs": t["sum(n_docs_p)"].cast(pa.int64())}),
        batch_format="pyarrow")


def span_transitions(ds: ray.data.Dataset, num_buckets: int = 8) -> ray.data.Dataset:
    """Modality-interleaving transition matrix over the Lance-shaped
    span table: global ``(prev_kind, next_kind, cnt)`` for every
    adjacent span pair inside a document, in array order — the
    structure statistic an interleaved text+media pipeline uses to
    learn/validate layout (how often media follows narrative, etc.).

    Map-only partials: ``list_flatten`` + ``list_parent_indices`` give
    the flattened kind stream with document boundaries; a boundary mask
    drops cross-document pairs, one dictionary-encode + bincount over
    packed pair codes emits ≤ n_kinds² rows per batch, and the final
    re-aggregation shuffle is kind-cardinality-sized. No per-row
    Python, no row-sized shuffle at any corpus size."""
    import pyarrow.compute as pc

    empty = pa.table({"prev_kind": pa.array([], pa.string()),
                      "next_kind": pa.array([], pa.string()),
                      "cnt": pa.array([], pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        if len(flat) < 2:
            return empty
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        kind = pc.struct_field(flat, "kind")
        if isinstance(kind, pa.ChunkedArray):
            kind = kind.combine_chunks()
        enc = pc.dictionary_encode(kind)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary
        n_kinds = len(vocab)
        same_doc = parent[1:] == parent[:-1]
        if not same_doc.any():
            return empty
        pair = codes[:-1][same_doc] * n_kinds + codes[1:][same_doc]
        cnt = np.bincount(pair, minlength=n_kinds * n_kinds)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "prev_kind": vocab.take(pa.array(nz // n_kinds)),
            "next_kind": vocab.take(pa.array(nz % n_kinds)),
            "cnt": cnt[nz].astype(np.int64),
        })

    from fs_crawler_ray.relops import bucketed_agg

    partials = ds.select_columns(["spans"]).map_batches(
        partial, batch_format="pyarrow")
    return bucketed_agg(partials, ["prev_kind", "next_kind"],
                        [("cnt", "sum", "cnt")], num_buckets)


def media_type_stats(sf_dir: str) -> pd.DataFrame:
    """Per-modality corpus report over the decode pipeline's output:
    ``(media_type, n_media, n_docs, total_len)`` — the composition
    table a multimodal ingest publishes (how much image/audio/video,
    referenced from how many documents, total decoded bytes). The
    decode is the container's deterministic fake, so every column is a
    pure function of ``md5(media_ref)`` and the whole actor-pool path
    stays SQL-checkable.

    Aggregation is distributed: per-batch Arrow partial counts/sums
    (type-cardinality rows per batch), one 3-key shuffle; the distinct
    document count rides a (media_type, doc_id) pre-dedup — the same
    two-phase COUNT(DISTINCT) plan as `q_events_daily_users`."""
    import pyarrow.compute as pc

    from fs_crawler_ray.pipelines.crawl_queries import span_media
    from fs_crawler_ray.relops import bucketed_agg, distinct

    refs = span_media(sf_dir)
    if len(refs) == 0:
        return pd.DataFrame({"media_type": [], "n_media": [],
                             "n_docs": [], "total_len": []})
    ds = decode_media(ray.data.from_arrow(synthesize_media_payloads(refs)))

    stats = bucketed_agg(
        ds.map_batches(
            lambda t: pa.table({
                "media_type": t["media_type"],
                "decoded_len": pc.cast(t["decoded_len"], pa.int64())}),
            batch_format="pyarrow"),
        ["media_type"],
        [("decoded_len", "count", "n_media"),
         ("decoded_len", "sum", "total_len")], 4)
    docs = bucketed_agg(
        distinct(ds.map_batches(
            lambda t: pa.table({"media_type": t["media_type"],
                                "doc_id": t["doc_id"]}),
            batch_format="pyarrow"), ["media_type", "doc_id"], 4),
        ["media_type"], [("doc_id", "count", "n_docs")], 4)

    out = stats.to_pandas().merge(docs.to_pandas(), on="media_type")
    return out[["media_type", "n_media", "n_docs", "total_len"]].astype(
        {"n_media": "int64", "n_docs": "int64", "total_len": "int64"}
    ).sort_values("media_type").reset_index(drop=True)


def span_media_position(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Where do media spans sit inside interleaved documents?
    ``(decile, n_media)`` with ``decile = ordinal·10 // n_spans`` (0 =
    opening tenth of the doc, 9 = closing tenth) — the layout statistic
    a text+media pipeline checks before training (lead images vs
    trailing galleries need different truncation strategies). Map-only
    partials via the same ``list_flatten`` / ``list_parent_indices``
    kernels as :func:`span_composition`; the span ordinal within its
    doc comes from one arange-minus-run-start subtraction; the final
    shuffle is 10 rows per batch."""
    import pyarrow.compute as pc

    from fs_crawler_ray.relops import bucketed_agg

    def partial(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        n_spans = pc.list_value_length(spans).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(parent) == 0:
            return pa.table({"decile": pa.array([], pa.int64()),
                             "n_media": pa.array([], pa.int64())})
        starts = np.concatenate([[0], np.cumsum(n_spans)[:-1]])
        ordinal = np.arange(len(parent), dtype=np.int64) - starts[parent]
        med = pc.equal(pc.struct_field(flat, "kind"),
                       "media").to_numpy(zero_copy_only=False)
        decile = (ordinal[med] * 10) // n_spans[parent[med]]
        cnt = np.bincount(decile, minlength=10).astype(np.int64)
        return pa.table({"decile": np.arange(10, dtype=np.int64),
                         "n_media": cnt})

    agg = bucketed_agg(
        ds.select_columns(["spans"]).map_batches(partial, batch_format="pyarrow"),
        ["decile"], [("n_media", "sum", "n_media")], 2)
    return agg.map_batches(
        lambda t: t.filter(pc.greater(t["n_media"], 0)),
        batch_format="pyarrow")
