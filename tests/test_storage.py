"""fsspec-URI checkpoint/corpus IO (sources/storage.py): the multi-node
shared-storage seam. file:// exercises the full URI plumbing against a
real filesystem visible to Ray workers; memory:// covers the helper
surface driver-side (it is per-process, documented)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from fs_crawler_ray.sources import storage as st


def test_memory_fs_helpers_roundtrip():
    base = "memory://stor_test"
    st.rmtree(base) if st.exists(base) else None
    st.makedirs(st.join(base, "d"))
    tbl = pa.table({"id": ["a", "b"], "n": [1, 2]})
    st.write_table(tbl, st.join(base, "d", "part-x.parquet"))
    assert st.isdir(st.join(base, "d"))
    assert st.listdir(st.join(base, "d")) == ["part-x.parquet"]
    assert st.file_rows(st.join(base, "d", "part-x.parquet")) == 2
    st.write_json({"k": 1}, st.join(base, "tmp.json"))
    st.replace(st.join(base, "tmp.json"), st.join(base, "log.json"))
    assert st.read_json(st.join(base, "log.json")) == {"k": 1}
    assert not st.exists(st.join(base, "tmp.json"))
    st.remove(st.join(base, "d", "part-x.parquet"))
    st.rmtree(base)
    assert not st.exists(base)


def test_crawl_through_file_uri_matches_plain_path(small_corpus, tmp_path_factory, ray_session):
    from fs_crawler_ray.crawl import CrawlConfig, crawl

    plain_dir = str(tmp_path_factory.mktemp("crawl_plain"))
    uri_dir = "file://" + str(tmp_path_factory.mktemp("crawl_uri"))
    cfg = CrawlConfig(hops=2)
    r_plain = crawl(small_corpus, small_corpus.seeds, plain_dir, cfg)
    r_uri = crawl(small_corpus, small_corpus.seeds, uri_dir, cfg)

    for name in ("vertices", "edges"):
        a = getattr(r_plain, name)().to_pandas()
        b = getattr(r_uri, name)().to_pandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
    assert [r["frontier"] for r in r_plain.log] == [r["frontier"] for r in r_uri.log]

    # resume from the URI checkpoint reattaches and is identical
    from fs_crawler_ray.crawl import CrawlResult
    reloaded = CrawlResult.load(uri_dir)
    assert reloaded.hops_run == r_uri.hops_run


def test_range_store_over_file_uri(small_corpus):
    from fs_crawler_ray.sources.doc_table import RangeStore

    plain = RangeStore(small_corpus.documents_path, "doc_id")
    uri = RangeStore("file://" + small_corpus.documents_path, "doc_id")
    ids = np.array(sorted(small_corpus.seeds))
    t1, f1 = plain.fetch(ids)
    t2, f2 = uri.fetch(ids)
    assert f1.tolist() == f2.tolist()
    assert t1.equals(t2)


def test_lance_range_store_contract(small_corpus, tmp_path_factory):
    """LanceRangeStore honors the RangeStore contract (skips unless the
    optional ``lance`` package is installed — BASELINE input_hint)."""
    lance = pytest.importorskip("lance")
    import pyarrow.parquet as pq
    from fs_crawler_ray.sources.doc_table import LanceRangeStore, RangeStore

    d = tmp_path_factory.mktemp("lance")
    tbl = pq.read_table(small_corpus.documents_path)
    lance_path = str(d / "documents.lance")
    lance.write_dataset(tbl, lance_path)

    ref = RangeStore(small_corpus.documents_path, "doc_id")
    ls = LanceRangeStore(lance_path, "doc_id")
    assert len(ls) == len(ref)
    ids = np.array(tbl["doc_id"].to_pylist()[:50] + ["G999-NOPE"])
    got_ref, found_ref = ref.fetch(ids)
    got_l, found_l = ls.fetch(ids)
    assert found_l.tolist() == found_ref.tolist()
    assert sorted(got_l["doc_id"].to_pylist()) == sorted(got_ref["doc_id"].to_pylist())


def test_lance_routing_is_suffix_gated():
    from fs_crawler_ray.sources.doc_table import _is_lance

    assert _is_lance("/data/documents.lance")
    assert _is_lance("s3://bucket/corpus/documents.lance/")
    assert not _is_lance("/data/documents.parquet")


def test_jsonl_documents_read_matches_parquet(tmp_path_factory, ray_session):
    """read_documents routes *.jsonl through ray.data.read_json and
    returns the same rows the parquet path does (raw-crawl-dump
    ingestion), including the emulated `columns` projection."""
    import pyarrow.parquet as pq

    from fs_crawler_ray.sources.doc_table import read_documents

    d = tmp_path_factory.mktemp("jsonl")
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                        columns=["doc_id", "text", "lang", "n_chars"])
    jsonl_path = str(d / "documents.jsonl")
    tbl.to_pandas().to_json(jsonl_path, orient="records", lines=True)

    cols = ["doc_id", "lang", "n_chars"]  # exercise the projection too
    got = read_documents(jsonl_path, columns=cols).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    exp = tbl.select(cols).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got.columns) == cols
    for c in cols:
        assert got[c].tolist() == exp[c].tolist()
