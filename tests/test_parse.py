import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from fs_crawler_ray.oracle import load_docs
from fs_crawler_ray.stages.parse import RECORD_SCHEMA, parse_documents, spans_roundtrip


def _with_hop(t: pa.Table, hop: int = 0) -> pa.Table:
    return t.append_column("hop", pa.array([hop] * len(t), pa.int32()))


def test_span_sequence_equality(small_corpus):
    """Per-row invariant: (kind, text, media_ref, order) sequences coming
    out of the Ray pipeline equal the raw document spans."""
    ds = ray.data.read_parquet(small_corpus.documents_path)
    out = ds.map_batches(spans_roundtrip, batch_format="pyarrow").to_pandas()
    docs = load_docs(small_corpus.documents_path)
    got = {}
    for r in out.itertuples():
        got.setdefault(r.doc_id, []).append((r.offset, r.kind, r.text, r.media_ref))
    assert set(got) == set(docs)
    for doc_id, spans in docs.items():
        expected = [(s["offset"], s["kind"], s["text"], s["media_ref"]) for s in spans]
        assert sorted(got[doc_id]) == expected, doc_id


def test_parse_vertices_match_oracle_parse(small_corpus):
    t = _with_hop(pq.read_table(small_corpus.documents_path), hop=3)
    rec = parse_documents(t)
    assert rec.schema.equals(RECORD_SCHEMA)
    verts = rec.filter(pa.compute.equal(rec["rec_kind"], "vertex")).to_pylist()
    docs = load_docs(small_corpus.documents_path)
    assert len(verts) == len(docs)
    by_id = {v["id"]: v for v in verts}
    for doc_id, spans in docs.items():
        v = by_id[doc_id]
        sd = {s["kind"]: s["text"] for s in spans}
        assert v["given_name"] == sd["name.given"]
        assert v["surname"] == sd["name.surname"]
        assert v["color"] == {"Male": -1, "Female": 1}.get(sd["gender"], 0)
        assert v["living"] == (sd["living"] == "true")
        assert v["lifespan"] == sd["lifespan"]
        assert v["iteration"] == 3


def test_parse_edges_and_cands(small_corpus):
    t = _with_hop(pq.read_table(small_corpus.documents_path))
    rec = parse_documents(t)
    edges = rec.filter(pa.compute.equal(rec["rec_kind"], "edge"))
    cands = rec.filter(pa.compute.equal(rec["rec_kind"], "cand"))
    docs = load_docs(small_corpus.documents_path)
    n_cp = sum(1 for s_list in docs.values() for s in s_list if s["kind"] == "child_parent")
    n_couple = sum(1 for s_list in docs.values() for s in s_list if s["kind"] == "couple")
    assert len(edges) == n_cp
    assert len(cands) == n_couple + 2 * n_cp
    # every edge splits into valid parts
    e = edges.to_pylist()
    for row in e[:100]:
        assert row["source"] and row["destination"] and row["rel_id"].startswith("R")
        assert row["src_doc"] in docs


def test_parse_media(small_corpus):
    t = _with_hop(pq.read_table(small_corpus.documents_path))
    rec = parse_documents(t)
    media = rec.filter(pa.compute.equal(rec["rec_kind"], "media")).to_pylist()
    docs = load_docs(small_corpus.documents_path)
    n_media = sum(1 for s_list in docs.values() for s in s_list if s["kind"] == "media")
    assert len(media) == n_media
    for m in media[:20]:
        assert m["media_ref"].startswith("memories/")


def test_parse_empty_batch():
    empty = pa.table({"doc_id": pa.array([], pa.string()),
                      "spans": pa.array([], pa.list_(pa.struct(
                          [("kind", pa.string()), ("text", pa.string()),
                           ("media_ref", pa.string()), ("offset", pa.int32())]))),
                      "hop": pa.array([], pa.int32())})
    out = parse_documents(empty)
    assert len(out.filter(pa.compute.equal(out["rec_kind"], "edge"))) == 0


def test_last_wins_on_duplicate_scalar_spans():
    spans = [[
        {"kind": "name.given", "text": "A", "media_ref": "", "offset": 0},
        {"kind": "name.given", "text": "B", "media_ref": "", "offset": 1},
        {"kind": "gender", "text": "Male", "media_ref": "", "offset": 2},
        {"kind": "gender", "text": "Female", "media_ref": "", "offset": 3},
    ]]
    t = pa.table({"doc_id": ["XXXX-AAA"], "spans": spans, "hop": pa.array([0], pa.int32())})
    rec = parse_documents(t)
    v = rec.filter(pa.compute.equal(rec["rec_kind"], "vertex")).to_pylist()[0]
    assert v["given_name"] == "B"
    assert v["color"] == 1
