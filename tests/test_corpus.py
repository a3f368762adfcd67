import pyarrow.parquet as pq

from fs_crawler_ray.corpus import CorpusInfo, CorpusSpec, generate_corpus
from fs_crawler_ray.ids import is_valid_pid
from fs_crawler_ray.model import DOCUMENT_SCHEMA, SpanKind


def test_deterministic(tmp_path):
    a = generate_corpus(CorpusSpec(n_persons=200, seed=1), str(tmp_path / "a"))
    b = generate_corpus(CorpusSpec(n_persons=200, seed=1), str(tmp_path / "b"))
    ta, tb = pq.read_table(a.documents_path), pq.read_table(b.documents_path)
    assert ta.equals(tb)
    assert a.seeds == b.seeds
    ra, rb = pq.read_table(a.relationships_path), pq.read_table(b.relationships_path)
    assert ra.equals(rb)


def test_schema_and_span_order(small_corpus):
    t = pq.read_table(small_corpus.documents_path)
    assert t.schema.equals(DOCUMENT_SCHEMA)
    rows = t.to_pylist()
    assert len(rows) == small_corpus.n_docs
    kind_rank = {k: i for i, k in enumerate(SpanKind.ALL)}
    for row in rows[:50]:
        assert is_valid_pid(row["doc_id"])
        offs = [s["offset"] for s in row["spans"]]
        assert offs == list(range(len(offs)))  # offsets are dense per-doc positions
        ranks = [kind_rank[s["kind"]] for s in row["spans"]]
        assert ranks == sorted(ranks)  # canonical per-doc kind order (FIXTURES F1)
        # scalar kinds appear exactly once
        kinds = [s["kind"] for s in row["spans"]]
        for k in (SpanKind.NAME_GIVEN, SpanKind.NAME_SURNAME, SpanKind.GENDER,
                  SpanKind.LIVING, SpanKind.LIFESPAN):
            assert kinds.count(k) == 1


def test_forest_validity(small_corpus):
    rel = pq.read_table(small_corpus.relationships_path).to_pylist()
    assert len(rel) > 50
    # parent1 always present; each rel_id unique
    ids = [r["rel_id"] for r in rel]
    assert len(set(ids)) == len(ids)
    for r in rel:
        assert r["parent1"] is not None
        assert is_valid_pid(r["child"])


def test_power_law_families(small_corpus):
    rel = pq.read_table(small_corpus.relationships_path).to_pylist()
    from collections import Counter

    fam = Counter((r["parent1"], r["parent2"]) for r in rel if r["parent2"])
    sizes = sorted(fam.values(), reverse=True)
    assert sizes[0] >= 3  # hot lineages exist


def test_missing_docs(missing_doc_corpus):
    t = pq.read_table(missing_doc_corpus.documents_path)
    assert len(t) < missing_doc_corpus.spec.n_persons


def test_meta_roundtrip(small_corpus):
    info = CorpusInfo.load(small_corpus.out_dir)
    assert info.seeds == small_corpus.seeds
    assert info.n_docs == small_corpus.n_docs
