"""Sharded-corpus layout: documents.parquet is a DIRECTORY of part
files (the at-scale "partitioned parquet, never one giant file" rule).
Pins that the multi-file RangeStore point lookups, the range
boundaries, and the crawl are identical to the single-file behavior.
"""
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from fs_crawler_ray.corpus import CorpusSpec, generate_corpus


@pytest.fixture(scope="module")
def sharded_corpus(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("sharded_corpus"))
    # > PART_DOCS (16k) so the corpus spans several part files
    return generate_corpus(CorpusSpec(n_persons=40_000, seed=7), out)


def test_corpus_is_a_directory_of_sorted_parts(sharded_corpus):
    p = sharded_corpus.documents_path
    assert os.path.isdir(p)
    parts = sorted(f for f in os.listdir(p) if f.endswith(".parquet"))
    assert len(parts) >= 2
    # parts are globally doc_id-sorted in file order
    last_max = b""
    total = 0
    for f in parts:
        t = pq.read_table(os.path.join(p, f), columns=["doc_id"])
        ids = [s.encode() for s in t["doc_id"].to_pylist()]
        assert ids == sorted(ids)
        assert not ids or ids[0] > last_max
        last_max = ids[-1] if ids else last_max
        total += len(ids)
    assert total == sharded_corpus.n_docs


def test_range_store_spans_part_files(sharded_corpus):
    from fs_crawler_ray.sources.doc_table import RangeStore

    rs = RangeStore(sharded_corpus.documents_path, "doc_id")
    assert len(rs) == sharded_corpus.n_docs
    assert len(rs.pfs) >= 2
    all_ids = pq.read_table(sharded_corpus.documents_path,
                            columns=["doc_id"])["doc_id"].to_pylist()
    rng = np.random.RandomState(3)
    want = np.array(sorted(rng.choice(all_ids, size=400, replace=False)))
    docs, found = rs.fetch(want)
    assert found.all()
    assert sorted(docs["doc_id"].to_pylist()) == sorted(want.tolist())
    # ids straddling a part boundary resolve too
    part0 = pq.read_table(os.path.join(
        sharded_corpus.documents_path,
        sorted(os.listdir(sharded_corpus.documents_path))[0]),
        columns=["doc_id"])["doc_id"].to_pylist()
    straddle = np.array([part0[-1], all_ids[len(part0)]])
    docs2, found2 = rs.fetch(straddle)
    assert found2.all() and len(docs2) == 2


def test_range_boundaries_cover_all_parts(sharded_corpus):
    from fs_crawler_ray.sources.doc_table import corpus_range_boundaries

    bnd = corpus_range_boundaries(sharded_corpus.documents_path, "doc_id", 16)
    # cut count is min(requested, row-group count across ALL parts) - 1:
    # 40k docs / 4096-row groups = 10 row groups -> 9 cuts
    assert 2 <= len(bnd) <= 15
    assert (np.sort(bnd) == bnd).all()
    all_ids = np.array(pq.read_table(sharded_corpus.documents_path,
                                     columns=["doc_id"])["doc_id"].to_pylist(),
                       dtype="S")
    w = max(bnd.dtype.itemsize, all_ids.dtype.itemsize)
    buckets = np.searchsorted(bnd.astype(f"S{w}"), all_ids.astype(f"S{w}"),
                              side="left")
    counts = np.bincount(buckets, minlength=len(bnd) + 1)
    # cuts are row-group max stats, so the overflow bucket past the
    # global max is legitimately empty; every other bucket owns ids
    assert (counts[:-1] > 0).all()
    assert counts.sum() == len(all_ids)


def test_parquet_parts_numeric_order(tmp_path):
    """part-100000 must sort after part-99999 (ADVICE r4): lexicographic
    listdir order breaks the range index's global key sort once the
    5-digit padding overflows (~1.6B docs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fs_crawler_ray.sources.doc_table import _parquet_parts

    d = tmp_path / "tbl"
    d.mkdir()
    names = ["part-99998.parquet", "part-100000.parquet",
             "part-99999.parquet", "part-00001.parquet"]
    for n in names:
        pq.write_table(pa.table({"x": [1]}), str(d / n))
    got = [p.rsplit("/", 1)[-1] for p in _parquet_parts(str(d))]
    assert got == ["part-00001.parquet", "part-99998.parquet",
                   "part-99999.parquet", "part-100000.parquet"]
