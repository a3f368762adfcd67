"""Curation operators: decontamination, repetition stats, length filter.

Each test cross-checks the Ray pipeline against DuckDB running the
registered oracle SQL on the same table — the driver's protocol."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
import ray.data

from fs_crawler_ray.curation import (
    decontaminate,
    doc_ngram_stats,
    eval_ngram_set,
    global_quantiles_disc,
    length_percentile_filter,
)
from fs_crawler_ray.pipelines import oracle_sqls as osql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_tbl():
    return pq.read_table(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs(docs_tbl):
    return ray.data.from_arrow(docs_tbl)


def _oracle(docs_tbl, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute("SET threads=2")
    con.register("documents", docs_tbl)
    return con.execute(sql).fetchdf()


def test_decontaminate_matches_oracle(docs, docs_tbl):
    out = decontaminate(docs, n=3, eval_mod=53).to_pandas()
    exp = _oracle(docs_tbl, osql.docs_decontaminated(n=3, eval_mod=53))
    assert len(out) > 0, "vacuous: no contaminated docs at n=3"
    lhs = out.sort_values("doc_id").reset_index(drop=True)
    rhs = exp.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": np.int64, "n_hits": np.int64})
    pd.testing.assert_frame_equal(lhs, rhs)


def test_decontaminate_excludes_eval_docs(docs):
    out = decontaminate(docs, n=3, eval_mod=53).to_pandas()
    assert (out["doc_id"].to_numpy() % 53 != 0).all()


def test_eval_ngram_set_is_distinct(docs):
    grams = eval_ngram_set(docs, n=3, eval_mod=53)
    vals = grams.to_pylist()
    assert len(vals) == len(set(vals)) > 0


def test_repetition_stats_match_oracle(docs, docs_tbl):
    out = doc_ngram_stats(docs, n=2).to_pandas()
    exp = _oracle(docs_tbl, osql.docs_repetition(n=2)).astype(
        {"doc_id": np.int64, "n_grams": np.int64, "n_distinct": np.int64})
    lhs = out.sort_values("doc_id").reset_index(drop=True)
    rhs = exp.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(lhs, rhs)
    assert (lhs["n_distinct"] <= lhs["n_grams"]).all()


def test_repetition_flags_boilerplate():
    rows = [
        {"doc_id": 1, "text": "spam spam spam spam spam spam"},
        {"doc_id": 2, "text": "every word here is totally unique"},
    ]
    out = (doc_ngram_stats(ray.data.from_pandas(pd.DataFrame(rows)), n=2)
           .to_pandas().set_index("doc_id"))
    assert out.loc[1, "n_grams"] == 5 and out.loc[1, "n_distinct"] == 1
    assert out.loc[2, "n_grams"] == out.loc[2, "n_distinct"] == 5


def test_global_quantiles_match_duckdb(docs, docs_tbl):
    lo, hi = global_quantiles_disc(docs, "n_chars", [0.05, 0.95])
    exp = _oracle(docs_tbl, """
        SELECT quantile_disc(n_chars, 0.05) lo,
               quantile_disc(n_chars, 0.95) hi FROM documents""")
    assert (lo, hi) == (int(exp["lo"][0]), int(exp["hi"][0]))


def test_length_filter_matches_oracle(docs, docs_tbl):
    out = length_percentile_filter(docs, lo=0.05, hi=0.95).to_pandas()
    exp = _oracle(docs_tbl, osql.docs_length_filtered(0.05, 0.95)).astype(
        {"doc_id": np.int64, "n_chars": np.int64})
    assert 0 < len(out) < docs.count()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        exp.sort_values("doc_id").reset_index(drop=True))


def test_repetition_large_vocab_no_overflow():
    """vocab^n past int64 must take the re-ranking path, not silently
    wrap and collide grams: 300 distinct tokens at n=8 (300^8 ≈ 6.6e19
    > 2^63) with an all-unique token stream ⇒ n_distinct == n_grams."""
    toks = " ".join(f"tok{i:03d}" for i in range(300))
    ds = ray.data.from_pandas(pd.DataFrame([{"doc_id": 1, "text": toks}]))
    out = doc_ngram_stats(ds, n=8).to_pandas()
    assert out.loc[0, "n_grams"] == 300 - 8 + 1
    assert out.loc[0, "n_distinct"] == out.loc[0, "n_grams"]


def test_quantiles_empty_input():
    empty = ray.data.from_pandas(
        pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                      "n_chars": pd.Series([], dtype=np.int64)}))
    assert global_quantiles_disc(empty, "n_chars", [0.05, 0.95]) == [0, 0]
    assert len(length_percentile_filter(empty).to_pandas()) == 0


def test_string_ids_supported():
    rows = [{"doc_id": f"url-{i}", "text": "alpha beta gamma delta epsilon"}
            for i in range(200)]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    rep = doc_ngram_stats(ds, n=2).to_pandas()
    assert len(rep) == 200 and rep["doc_id"].dtype == object
    out = decontaminate(ds, n=2, eval_mod=7, concurrency=2).to_pandas()
    # every doc shares every bigram; eval slice is excluded from output
    from fs_crawler_ray.curation import _eval_mask
    n_eval = int(_eval_mask(pd.Series([f"url-{i}" for i in range(200)]), 7).sum())
    assert 0 < n_eval < 200
    assert len(out) == 200 - n_eval


def test_snapshot_diff_classifies_added_removed_changed():
    import pandas as pd
    import ray.data

    from fs_crawler_ray.curation import snapshot_diff

    a = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                      "text": ["one", "two", "three", "four"]})
    b = pd.DataFrame({"doc_id": [2, 3, 4, 5],
                      "text": ["two", "THREE", "four", "five"]})
    out = (snapshot_diff(ray.data.from_pandas(a), ray.data.from_pandas(b))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(map(tuple, out.to_numpy())) == [
        (1, "removed"), (3, "changed"), (5, "added")]


def test_filter_reasons_priority_order():
    import pandas as pd
    import ray.data

    from fs_crawler_ray.curation import filter_reasons

    # doc 0: eval slice (0 % 53 == 0) even though it is also shortest;
    # doc 1: too_short; doc 9: too_long; middle docs pass
    n = 10
    docs = pd.DataFrame({
        "doc_id": range(n),
        "text": ["w" * (i + 1) for i in range(n)],
        "n_chars": [i + 1 for i in range(n)],
    })
    # quantile_disc(0.25) over 1..10 = 3, quantile_disc(0.8) = 8
    out = (filter_reasons(ray.data.from_pandas(docs), lo=0.25, hi=0.8)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    got = dict(zip(out["doc_id"], out["reason"]))
    assert got[0] == "eval_slice"
    assert got[1] == "too_short"
    assert got[9] == "too_long"
