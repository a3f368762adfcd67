"""Vectorized span parser — the core extractor (SURVEY §2.2 M1–M5).

One zero-copy Arrow pass turns a batch of interleaved documents
``(doc_id, spans, hop)`` into a normalized record table tagged by
``rec_kind``:

- ``vertex``  — person parse (reference ``fscrawler/model/individual.py:41-57``
  name/gender/living/lifespan extraction, ``fscrawler/model/name.py:6-16``
  given/surname parts; for repeated scalar spans the LAST one wins,
  matching the reference's non-preferred-name fallback).
- ``edge``    — one row per child_parent span
  (``fscrawler/controller/fsapi.py:156-161`` parent1/parent2 expansion),
  text ``child|parent|rel_id`` split vectorized.
- ``cand``    — frontier candidates: Couple partners
  (``fsapi.py:151-155``) plus both endpoints of every child_parent span
  (``graph_memory_impl.py:69-72`` add_to_frontier of child and parent).
- ``media``   — media spans (evidence persona URIs) routed to the
  multimodal pipeline.

Rows keep ``(hop, src_doc, offset)`` so downstream keep-first dedup is
deterministic under the canonical visit order (sorted doc id per hop)
without relying on physical execution order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fs_crawler_ray.model import SpanKind

RECORD_SCHEMA = pa.schema(
    [
        ("rec_kind", pa.string()),
        ("id", pa.string()),
        ("color", pa.int8()),
        ("surname", pa.string()),
        ("given_name", pa.string()),
        ("iteration", pa.int32()),
        ("lifespan", pa.string()),
        ("living", pa.bool_()),
        ("source", pa.string()),
        ("destination", pa.string()),
        ("rel_id", pa.string()),
        ("cand_id", pa.string()),
        ("media_ref", pa.string()),
        ("src_doc", pa.string()),
        ("offset", pa.int32()),
        ("hop", pa.int32()),
    ]
)


def _scatter_last(n_docs: int, parent: np.ndarray, values: np.ndarray, default):
    """values scattered to docs; later spans overwrite (last wins)."""
    out = np.full(n_docs, default, dtype=object if isinstance(default, str) else type(default))
    out[parent] = values
    return out


def parse_documents(batch: pa.Table) -> pa.Table:
    """(doc_id, spans, hop) batch → normalized record table."""
    batch = batch.combine_chunks()
    n_docs = len(batch)
    doc_ids = batch["doc_id"].combine_chunks()
    spans = batch["spans"].combine_chunks()
    hops = batch["hop"].combine_chunks() if "hop" in batch.column_names else pa.array([0] * n_docs, pa.int32())

    flat = spans.flatten()
    parent = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
    kind_arr = flat.field("kind")
    text = flat.field("text")
    offset = flat.field("offset").to_numpy(zero_copy_only=False)
    doc_np = doc_ids.to_numpy(zero_copy_only=False)
    hop_np = hops.to_numpy(zero_copy_only=False).astype(np.int32)

    # per-kind boolean masks via Arrow kernels — never materialize the
    # full text column as Python objects (narrative payloads dominate
    # span bytes; only the small per-kind slices are taken out)
    def kind_mask(k: str) -> np.ndarray:
        return pc.equal(kind_arr, k).to_numpy(zero_copy_only=False)

    def take_text(mask: np.ndarray) -> np.ndarray:
        idx = np.nonzero(mask)[0]
        return text.take(pa.array(idx)).to_numpy(zero_copy_only=False)

    parts: list[pa.Table] = []

    def emit(rec_kind: str, n: int, **cols) -> None:
        if n == 0:
            return
        arrays = []
        for f in RECORD_SCHEMA:
            if f.name == "rec_kind":
                arrays.append(pa.array([rec_kind] * n, pa.string()))
            elif f.name in cols:
                arrays.append(pa.array(cols[f.name], f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        parts.append(pa.Table.from_arrays(arrays, schema=RECORD_SCHEMA))

    # --- vertices (one per doc) --------------------------------------
    def last_of(k: str, default=""):
        m = kind_mask(k)
        return _scatter_last(n_docs, parent[m], take_text(m), default)

    given = last_of(SpanKind.NAME_GIVEN)
    surname = last_of(SpanKind.NAME_SURNAME)
    gender_txt = last_of(SpanKind.GENDER)
    living_txt = last_of(SpanKind.LIVING)
    lifespan = last_of(SpanKind.LIFESPAN)
    color = np.select([gender_txt == "Male", gender_txt == "Female"], [-1, 1], 0).astype(np.int8)
    emit(
        "vertex",
        n_docs,
        id=doc_np,
        color=color,
        surname=surname,
        given_name=given,
        iteration=hop_np,
        lifespan=lifespan,
        living=(living_txt == "true"),
        hop=hop_np,
    )

    # --- edges (child_parent spans) ----------------------------------
    cp = kind_mask(SpanKind.CHILD_PARENT)
    n_cp = int(cp.sum())
    if n_cp:
        cp_idx = np.nonzero(cp)[0]
        split = pc.split_pattern(text.take(pa.array(cp_idx)), "|")
        child = pc.list_element(split, 0).to_numpy(zero_copy_only=False)
        par = pc.list_element(split, 1).to_numpy(zero_copy_only=False)
        rid = pc.list_element(split, 2).to_numpy(zero_copy_only=False)
        emit(
            "edge",
            n_cp,
            source=child,
            destination=par,
            rel_id=rid,
            src_doc=doc_np[parent[cp]],
            offset=offset[cp],
            hop=hop_np[parent[cp]],
        )
    else:
        child = par = np.array([], dtype=object)

    # --- frontier candidates -----------------------------------------
    cpl = kind_mask(SpanKind.COUPLE)
    cand = np.concatenate([take_text(cpl), child, par])
    cand_doc = np.concatenate([doc_np[parent[cpl]], doc_np[parent[cp]], doc_np[parent[cp]]])
    cand_off = np.concatenate([offset[cpl], offset[cp], offset[cp]])
    cand_hop = np.concatenate([hop_np[parent[cpl]], hop_np[parent[cp]], hop_np[parent[cp]]])
    emit("cand", len(cand), cand_id=cand, src_doc=cand_doc, offset=cand_off.astype(np.int32), hop=cand_hop)

    # --- media spans --------------------------------------------------
    md = kind_mask(SpanKind.MEDIA)
    n_md = int(md.sum())
    mref_taken = flat.field("media_ref").take(pa.array(np.nonzero(md)[0])).to_numpy(zero_copy_only=False)
    emit("media", n_md, id=doc_np[parent[md]], media_ref=mref_taken,
         src_doc=doc_np[parent[md]], offset=offset[md].astype(np.int32), hop=hop_np[parent[md]])

    if not parts:
        return RECORD_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def spans_roundtrip(batch: pa.Table) -> pa.Table:
    """Identity re-emission of (kind, text, media_ref, offset) sequences —
    used by the span-sequence-equality conformance test (the per-row
    invariant from BASELINE input_hint)."""
    spans = batch["spans"].combine_chunks()
    flat = spans.flatten()
    parent = pc.list_parent_indices(spans)
    return pa.table(
        {
            "doc_id": pc.take(batch["doc_id"].combine_chunks(), parent),
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )
