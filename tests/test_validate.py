"""Validator conformance: M7 golden cases, hand-built category fixture,
and cross-check against the oracle on crawled+resolved data."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from fs_crawler_ray.crawl import CrawlConfig, crawl
from fs_crawler_ray.oracle import oracle_validate
from fs_crawler_ray.stages.resolve import resolve_relationships
from fs_crawler_ray.stages.validate import (
    birth_year_from_lifespan,
    save_valid_graph,
    validate,
)


def test_birth_year_golden_cases():
    vals = birth_year_from_lifespan(
        np.array(["1894-1983", "-1983", "Living", "", "1963-Living", "1912-1993", "2001-2077"])
    )
    # '1963-Living' and '2001-2077' contain no '-1' → 0 (reference quirk,
    # graph_validator.py:24-35)
    assert vals.tolist() == [1894, 1983, 3000, 0, 0, 1912, 0]


def _ds(rows, schema_cols):
    return ray.data.from_arrow(pa.table({c: [r[i] for r in rows] for i, c in enumerate(schema_cols)}))


@pytest.fixture()
def fixture_graph():
    # vertices: (id, color, iteration, lifespan)
    verts = [
        ("AAAA-C01", -1, 0, "1900-1980"),   # child with 2 fathers → 'father'... see edges
        ("AAAA-C02", 1, 0, "1910-1990"),
        ("AAAA-C03", 0, 1, "1920-1999"),
        ("AAAA-C04", -1, 1, "Living"),
        ("AAAA-P01", -1, 2, "1870-1940"),
        ("AAAA-P02", -1, 2, "1871-1941"),
        ("AAAA-P03", 1, 2, "1872-1942"),
        ("AAAA-P04", 1, 2, "1873-1943"),
        ("AAAA-P05", 0, 2, "1874-1944"),
        ("AAAA-C06", 1, 0, "1931-2001"),
    ]
    v = ray.data.from_arrow(pa.table({
        "id": [x[0] for x in verts],
        "color": pa.array([x[1] for x in verts], pa.int8()),
        "surname": ["S"] * len(verts),
        "given_name": ["G"] * len(verts),
        "iteration": pa.array([x[2] for x in verts], pa.int32()),
        "lifespan": [x[3] for x in verts],
    }))
    edges = [
        # C01: 3 validated parents, 2 male 1 female → 'father' invalid, max_father=2
        ("AAAA-C01", "AAAA-P01", "BiologicalParent", "R000-001"),
        ("AAAA-C01", "AAAA-P02", "UnspecifiedParentType", "R000-002"),
        ("AAAA-C01", "AAAA-P03", "BiologicalParent", "R000-003"),
        # C02: 2m + 2f validated → 'male_female'
        ("AAAA-C02", "AAAA-P01", "BiologicalParent", "R000-004"),
        ("AAAA-C02", "AAAA-P02", "BiologicalParent", "R000-004"),
        ("AAAA-C02", "AAAA-P03", "UnspecifiedParentType", "R000-005"),
        ("AAAA-C02", "AAAA-P04", "BiologicalParent", "R000-005"),
        # C03: valid 2-parent
        ("AAAA-C03", "AAAA-P01", "BiologicalParent", "R000-006"),
        ("AAAA-C03", "AAAA-P03", "BiologicalParent", "R000-006"),
        # C04: resolution child (2 male untyped parents)
        ("AAAA-C04", "AAAA-P01", "UntypedParent", "R000-007"),
        ("AAAA-C04", "AAAA-P02", "UntypedParent", "R000-008"),
        # C06: (1,1,1) validated → fallback 'unknown'
        ("AAAA-C06", "AAAA-P01", "BiologicalParent", "R000-009"),
        ("AAAA-C06", "AAAA-P04", "BiologicalParent", "R000-010"),
        ("AAAA-C06", "AAAA-P05", "UnspecifiedParentType", "R000-011"),
        # unknown parent (not vertex, not frontier)
        ("AAAA-C03", "ZZZZ-XXX", "BiologicalParent", "R000-012"),
        # parent in frontier → not unknown
        ("AAAA-C03", "AAAA-FRO", "StepParent", "R000-013"),
    ]
    e = ray.data.from_arrow(pa.table({
        "source": [x[0] for x in edges],
        "destination": [x[1] for x in edges],
        "type": [x[2] for x in edges],
        "id": [x[3] for x in edges],
    }))
    f = ray.data.from_arrow(pa.table({"id": ["AAAA-FRO"]}))
    return v, e, f


def test_fixture_categories(fixture_graph):
    v, e, f = fixture_graph
    stats, classified = validate(v, e, f, num_partitions=4)
    assert stats.vertex_count == 10
    assert stats.edge_count == 16
    assert stats.invalid_counts["father"] == 1
    assert stats.invalid_counts["male_female"] == 1
    assert stats.invalid_counts["unknown"] == 1
    assert stats.invalid_src_count == 3
    assert stats.max_father == 2
    assert stats.max_mother == 2
    assert stats.resolution_src_count == 1
    assert stats.unknown_vertex_count == 1
    assert stats.child_count == 5  # 4 validation children + 1 resolution child
    # C06 '1931-2001' has no '-1' substring → birth year 0 (reference quirk)
    assert stats.birth_decade_histogram == {0: 1, 1900: 1, 1910: 1}
    assert stats.iteration_histogram == {0: 3}


def test_fixture_matches_oracle(fixture_graph):
    v, e, f = fixture_graph
    stats, _ = validate(v, e, f, num_partitions=4)
    o = oracle_validate(v.take_all(), e.take_all(), {r["id"] for r in f.take_all()})
    assert stats.child_count == o["child_count"]
    assert stats.unknown_vertex_count == o["unknown_vertex_count"]
    assert stats.invalid_src_count == len(o["invalid"])
    assert stats.max_father == o["max_father"]
    assert stats.max_mother == o["max_mother"]
    assert stats.resolution_src_count == len(o["resolution_src"])


def test_save_valid_graph(fixture_graph, tmp_path):
    v, e, f = fixture_graph
    _, classified = validate(v, e, f, num_partitions=4)
    paths = save_valid_graph(v, e, classified, str(tmp_path), num_partitions=4)
    verts = ray.data.read_parquet(paths["vertices"]).take_all()
    nums = sorted(r["vertex_number"] for r in verts)
    assert nums == list(range(1, 11))
    edges = ray.data.read_parquet(paths["edges"]).take_all()
    # invalid children C01, C02, C06 dropped; C03/C04 edges with BOTH
    # endpoints numbered survive
    assert len(edges) == 4
    inv = ray.data.read_parquet(paths["invalid"]).take_all()
    assert {r["source"] for r in inv} == {"AAAA-C01", "AAAA-C02", "AAAA-C06"}


def test_validate_crawled_resolved_matches_oracle(small_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("val_crawl"))
    result = crawl(small_corpus, small_corpus.seeds, out,
                   CrawlConfig(hops=5, num_shards=2, num_buckets=8))
    final_edges = resolve_relationships(
        result.edges(), result.vertices(), small_corpus.relationships_path,
        num_partitions=4, num_buckets=8,
    ).materialize()
    stats, _ = validate(result.vertices(), final_edges, result.frontier(), num_partitions=4)
    o = oracle_validate(
        result.vertices().take_all(), final_edges.take_all(),
        {r["id"] for r in result.frontier().take_all()},
    )
    assert stats.child_count == o["child_count"]
    assert stats.invalid_src_count == len(o["invalid"])
    assert stats.unknown_vertex_count == o["unknown_vertex_count"]
    assert stats.resolution_src_count == len(o["resolution_src"])
    assert stats.no_rel_count == o["no_rel_count"]
    assert stats.child_count > 10


def test_validate_never_materializes_per_child_driver_side(fixture_graph, monkeypatch):
    """VERDICT r02 item 3: the stats reduction must stay distributed —
    no to_pandas()/take_all() on the per-child table (one row per child
    ⇒ O(vertices) driver memory at scale). Per-child tables are
    recognizable by their 'v_any' column; small partials/broadcast
    sides are allowed."""
    v, e, f = fixture_graph

    real_to_pandas = ray.data.Dataset.to_pandas
    real_take_all = ray.data.Dataset.take_all

    def _guard(ds):
        try:
            names = ds.schema().names
        except Exception:
            return
        assert "v_any" not in names, "per-child table pulled through the driver"

    def guarded_to_pandas(self, *a, **k):
        _guard(self)
        return real_to_pandas(self, *a, **k)

    def guarded_take_all(self, *a, **k):
        _guard(self)
        return real_take_all(self, *a, **k)

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", guarded_to_pandas)
    monkeypatch.setattr(ray.data.Dataset, "take_all", guarded_take_all)
    stats, _ = validate(v, e, f, num_partitions=4)
    assert stats.invalid_src_count > 0  # reductions still computed
