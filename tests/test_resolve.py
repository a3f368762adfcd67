"""Resolution-phase conformance: golden classifier fixture (reference
tests/model/test_graph.py:100-118) + full pass vs the oracle."""

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from fs_crawler_ray.crawl import CrawlConfig, crawl
from fs_crawler_ray.oracle import oracle_crawl, oracle_resolution, oracle_resolve_fetch
from fs_crawler_ray.stages.resolve import (
    candidate_relationships,
    classify_resolution,
    resolve_relationships,
    split_primary_aux,
)


def test_golden_resolution_fixture():
    """Exact reproduction of the reference's determine_resolution test
    (FIXTURES.md F6)."""
    rows = [
        ("Isabella", "9ZT2-JR1", -1),
        ("Isabella", "9ZT2-JR1", 1),
        ("Isabella", "9ZT2-QRF", -1),
        ("Daniel", "M9JK-BT5", -1),
        ("Daniel", "M9JK-BT5", 1),
        ("Barbara", "9VFV-48R", -1),
        ("Barbara", "9VFV-48R", 1),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "source": [r[0] for r in rows],
                "rel_id": [r[1] for r in rows],
                "dest_color": pa.array([r[2] for r in rows], pa.int8()),
            }
        )
    )
    out = {r["rel_id"]: r["rtype"] for r in classify_resolution(ds, num_buckets=4).take_all()}
    assert out == {
        "9ZT2-QRF": "Resolve",
        "9ZT2-JR1": "Resolve",
        "M9JK-BT5": "AssumedBiological",
        "9VFV-48R": "AssumedBiological",
    }


@pytest.fixture(scope="module")
def resolve_corpus(tmp_path_factory):
    """Corpus rich in multi-relationship children → Resolve cases."""
    from fs_crawler_ray.corpus import CorpusSpec, generate_corpus

    out = tmp_path_factory.mktemp("resolve_corpus")
    return generate_corpus(
        CorpusSpec(n_persons=300, seed=11, extra_parent_frac=0.10, single_parent_frac=0.05),
        str(out),
    )


@pytest.fixture(scope="module")
def crawled(resolve_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("resolve_crawl"))
    cfg = CrawlConfig(hops=6, num_shards=4, num_buckets=8)
    result = crawl(resolve_corpus, resolve_corpus.seeds, out, cfg)
    oracle = oracle_crawl(resolve_corpus.documents_path, resolve_corpus.seeds, 6)
    return result, oracle


def test_candidates_and_classification_match_oracle(crawled):
    result, oracle = crawled
    cands = candidate_relationships(result.edges(), result.vertices(), num_partitions=4)
    got = {(r["source"], r["rel_id"], r["dest_color"]) for r in cands.take_all()}
    verts = oracle.vertices
    expected = {
        (s, e["id"], verts[d]["color"])
        for (s, d), e in oracle.edges.items()
        if s in verts and d in verts
    }
    assert got == expected

    cls = classify_resolution(cands, num_buckets=8)
    got_cls = {r["rel_id"]: r["rtype"] for r in cls.take_all()}
    assert got_cls == oracle_resolution(oracle)


def test_full_resolution_matches_oracle(crawled, resolve_corpus):
    result, oracle = crawled
    final = resolve_relationships(
        result.edges(), result.vertices(), resolve_corpus.relationships_path,
        num_partitions=4, num_buckets=8,
    )
    got = {(r["source"], r["destination"]): r["type"] for r in final.take_all()}
    cls = oracle_resolution(oracle)
    expected = oracle_resolve_fetch(oracle, cls, resolve_corpus.relationships_path)
    assert got == expected
    # some edges actually got resolved to concrete fact types
    assert any(t not in ("UntypedParent", "AssumedBiological") for t in got.values())


def test_split_primary_aux(crawled, resolve_corpus):
    result, _ = crawled
    final = resolve_relationships(
        result.edges(), result.vertices(), resolve_corpus.relationships_path,
        num_partitions=4, num_buckets=8,
    ).materialize()
    primary, aux = split_primary_aux(final)
    p = primary.take_all()
    a = aux.take_all()
    assert len(p) + len(a) == final.count()
    assert all(r["type"] in ("UntypedParent", "UnspecifiedParentType", "BiologicalParent") for r in p)
    assert all(r["type"] not in ("UntypedParent", "UnspecifiedParentType", "BiologicalParent") for r in a)


def test_full_resolution_distributed_join_path(crawled, resolve_corpus, monkeypatch):
    """BROADCAST_LIMIT=0 forces the hash_join fallback in
    _left_join_type_override (the 100-TB path); it must agree with the
    broadcast path / oracle exactly — including on the sparse rel-id key
    space that breaks Dataset.join (relops.py:160)."""
    import fs_crawler_ray.stages.resolve as resolve_mod

    monkeypatch.setattr(resolve_mod, "BROADCAST_LIMIT", 0)
    result, oracle = crawled
    final = resolve_relationships(
        result.edges(), result.vertices(), resolve_corpus.relationships_path,
        num_partitions=4, num_buckets=8,
    )
    got = {(r["source"], r["destination"]): r["type"] for r in final.take_all()}
    cls = oracle_resolution(oracle)
    expected = oracle_resolve_fetch(oracle, cls, resolve_corpus.relationships_path)
    assert got == expected
