"""Unit tests for the wave-36 operators: session-size histogram and
k-means cell-occupancy report. Each is also strictly oracled against
DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import kmeans_cell_sizes


def test_session_size_hist_recomposes_events():
    from fs_crawler_ray.pipelines.relational import (q_events_session_size_hist,
                                                     q_events_sessions)

    sf = "/root/testdata/sf0.001"
    hist = q_events_session_size_hist(sf)
    sess = q_events_sessions(sf)
    # histogram is exactly the size distribution of the session table
    exp = (sess.groupby("n_events").size().reset_index(name="n_sessions")
           .sort_values("n_events").reset_index(drop=True))
    pd.testing.assert_frame_equal(hist.astype("int64"), exp.astype("int64"))
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    assert (hist["n_events"] * hist["n_sessions"]).sum() == len(ev)


def test_kmeans_cell_sizes_partition():
    rng = np.random.default_rng(17)
    n, dim, k = 200, 6, 4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table({"vec_id": np.arange(n),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    out = (kmeans_cell_sizes(ray.data.from_arrow(t), k=k)
           .to_pandas().sort_values("cluster").reset_index(drop=True))
    # sizes partition the corpus; every cluster id is a centroid id
    assert out["n_vecs"].sum() == n
    assert set(out["cluster"]).issubset(set(range(k)))
    # centroids assign to themselves, so every cell is non-empty
    assert (out["n_vecs"] >= 1).all()


def test_near_dup_scores_exact_duplicates_score_1000():
    from fs_crawler_ray.text import near_dup_scores

    texts = ["the quick brown fox jumps over the lazy dog today",
             "the quick brown fox jumps over the lazy dog today",
             "completely different content with no shared trigrams here"]
    docs = pa.table({"doc_id": [1, 2, 3], "text": texts})
    out = (near_dup_scores(ray.data.from_arrow(docs), threshold=0.8)
           .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert out[["doc_a", "doc_b"]].values.tolist() == [[1, 2]]
    assert out["jac_permille"].iloc[0] == 1000


def test_dedup_keep_best_prefers_low_rarity():
    from fs_crawler_ray.text import dedup_keep_best

    # docs 1 and 2 are near-identical; doc 2 carries an extra rare
    # token so doc 1 (lower mean rarity) must win the cluster
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": [base, base + " zyzzyva", "unrelated text entirely here"],
    })
    out = dedup_keep_best(ray.data.from_arrow(docs)).to_pandas()
    assert len(out) == 1
    assert out["doc_id"].iloc[0] == 1


def test_ship_delay_hist_counts_all_lineitems():
    from fs_crawler_ray.pipelines.relational import q_ship_delay_hist

    sf = "/root/testdata/sf0.001"
    out = q_ship_delay_hist(sf)
    li = pd.read_parquet(f"{sf}/lineitem.parquet", columns=["l_orderkey"])
    assert out["n_items"].sum() == len(li)


def test_source_quality_matrix_partitions_corpus():
    from fs_crawler_ray.text import source_quality_matrix

    docs = pa.table({
        "doc_id": list(range(30)),
        "text": [f"rare{i} common common common" for i in range(30)],
        "source": ["web" if i % 2 else "books" for i in range(30)],
    })
    out = (source_quality_matrix(ray.data.from_arrow(docs), n_tiles=3)
           .to_pandas())
    assert out["n_docs"].sum() == 30
    assert set(out["tile"]) == {1, 2, 3}
    assert set(out["source"]) == {"web", "books"}


def test_vocab_growth_monotone_and_exact_tail():
    from fs_crawler_ray.text import vocab_growth

    docs = pa.table({
        "doc_id": list(range(10)),
        "text": [f"shared word{i}" for i in range(10)],  # 1 new tok/doc
    })
    out = (vocab_growth(ray.data.from_arrow(docs), n_points=10)
           .to_pandas().sort_values("k").reset_index(drop=True))
    # prefix of k docs holds 'shared' + k distinct wordN tokens
    assert out["vocab_size"].tolist() == [k + 1 for k in range(1, 11)]
    assert (out["prefix_docs"].diff().dropna() > 0).all()


def test_ltv_triangle_recomposes_revenue():
    from fs_crawler_ray.pipelines.relational import q_orders_ltv_triangle

    sf = "/root/testdata/sf0.001"
    out = q_orders_ltv_triangle(sf)
    orders = pd.read_parquet(f"{sf}/orders.parquet",
                             columns=["o_totalprice"])
    exp = int(np.floor(orders["o_totalprice"].to_numpy() * 100 + 0.5).sum())
    assert out["rev_cents"].sum() == exp
    assert (out["month_offset"] >= 0).all()
    # offset 0 exists for every cohort (the acquisition month itself)
    zero = out[out["month_offset"] == 0]["cohort_month"]
    assert set(zero) == set(out["cohort_month"])


def test_vote_confusion_counts_all_vectors():
    from fs_crawler_ray.ann import vote_confusion

    rng = np.random.default_rng(41)
    n, dim = 120, 6
    # two well-separated label blobs -> confusion matrix near-diagonal
    # cosine separation needs distinct DIRECTIONS, not offsets: point
    # the two blobs along +e1 and -e1
    labels = np.repeat([0, 1], n // 2).astype(np.int32)
    base = np.zeros((n, dim))
    base[:, 0] = np.where(labels == 0, 3.0, -3.0)
    vecs = (rng.normal(size=(n, dim)) * 0.05 + base).astype(np.float32)
    t = pa.table({"vec_id": np.arange(n),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
                  "label": labels})
    out = vote_confusion(ray.data.from_arrow(t), k=5).to_pandas()
    assert out["n_vecs"].sum() == n
    diag = out[out["label"] == out["voted_label"]]["n_vecs"].sum()
    assert diag == n  # perfectly separated -> all votes correct


def test_part_price_stats_quantile_order():
    from fs_crawler_ray.pipelines.relational import q_part_price_stats

    out = q_part_price_stats("/root/testdata/sf0.001")
    for _, r in out.iterrows():
        assert (r["min_cents"] <= r["p25"] <= r["p50"]
                <= r["p75"] <= r["max_cents"])


def test_anomaly_days_flags_injected_spike():
    import datetime

    import ray.data as rd

    from fs_crawler_ray.pipelines.relational import q_events_anomaly_days

    out = q_events_anomaly_days("/root/testdata/sf0.001")
    assert (out["abs_dev"] >= 0).all()
    assert set(out["is_anomaly"]).issubset({0, 1})
    # rule consistency: recompute median/MAD over the returned series
    n = out["n_events"].to_numpy()
    s = np.sort(n)
    med = s[int(np.ceil(0.5 * len(s))) - 1]
    ad = np.abs(n - med)
    mad = max(int(np.sort(ad)[int(np.ceil(0.5 * len(ad))) - 1]), 1)
    assert (out["is_anomaly"].to_numpy()
            == (ad * 100 > 300 * mad).astype(np.int64)).all()


def test_dedup_savings_counts():
    from fs_crawler_ray.text import dedup_savings

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["aaa", "aaa", "bb", "aaa"],
    })
    out = dedup_savings(ray.data.from_arrow(docs)).to_pandas().iloc[0]
    assert out["n_docs"] == 4
    assert out["n_unique"] == 2
    assert out["dup_docs"] == 2
    assert out["bytes_total"] == 3 * 3 + 2
    assert out["bytes_saved"] == 2 * 3


def test_collocations_pmi_proxy_favors_exclusive_pairs():
    from fs_crawler_ray.text import collocations

    # "neural network" always co-occur exclusively; "the cat" words are
    # frequent apart -> the exclusive pair must outrank it
    docs = pa.table({
        "doc_id": list(range(12)),
        "text": (["neural network runs fine"] * 6
                 + ["the cat the dog the bird the fish"] * 6),
    })
    out = collocations(ray.data.from_arrow(docs), top_n=10,
                       min_count=5).to_pandas()
    top_score = out["score"].max()
    exclusives = set(out[out["score"] == top_score]["gram"])
    assert "neural network" in exclusives
    # every "the ..." gram scores strictly below the exclusive pairs
    the_scores = out[out["gram"].str.contains("the")]["score"]
    assert (the_scores < top_score).all()


def test_priority_matrix_counts_all_orders():
    from fs_crawler_ray.pipelines.relational import q_orders_priority_matrix

    sf = "/root/testdata/sf0.001"
    out = q_orders_priority_matrix(sf)
    orders = pd.read_parquet(f"{sf}/orders.parquet", columns=["o_orderkey"])
    assert out["n_orders"].sum() == len(orders)


def test_token_length_hist_exact():
    from fs_crawler_ray.text import token_length_hist

    docs = pa.table({"doc_id": [0, 1],
                     "text": ["a bb ccc", "bb dddd"]})
    out = (token_length_hist(ray.data.from_arrow(docs))
           .to_pandas().sort_values("length").reset_index(drop=True))
    got = dict(zip(out["length"], out["n_tokens"]))
    assert got == {1: 1, 2: 2, 3: 1, 4: 1}


def test_dim_covariance_matches_numpy():
    from fs_crawler_ray.ann import dim_covariance

    rng = np.random.default_rng(23)
    n, dim = 150, 4
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    t = pa.table({"vec_id": np.arange(n),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float32()))})
    out = (dim_covariance(ray.data.from_arrow(t))
           .to_pandas().sort_values(["dim_a", "dim_b"]).reset_index(drop=True))
    vi = np.floor(vecs.astype(np.float64) * 10**4 + 0.5).astype(np.int64)
    xy = vi.T @ vi
    s = vi.sum(axis=0)
    ia, ib = np.triu_indices(dim, k=1)
    exp = n * xy[ia, ib] - s[ia] * s[ib]
    assert out["cov_fp"].tolist() == exp.tolist()
    # identity: cov_fp / n^2 approximates the float covariance
    fc = np.cov(vi.T, bias=True)
    for r, (a, b) in zip(exp, zip(ia, ib)):
        assert abs(r / n**2 - fc[a, b]) < 1e-6 * max(1, abs(fc[a, b]))


def test_type_value_stats_quantile_order():
    from fs_crawler_ray.pipelines.relational import q_events_type_value_stats

    out = q_events_type_value_stats("/root/testdata/sf0.001")
    assert (out["n_events"] > 0).all()
    assert ((out["p25"] <= out["p50"]) & (out["p50"] <= out["p75"])).all()


def test_family_sizes_recompose_members():
    import __ray_entry__ as e

    sf = "/root/testdata/sf0.001"
    hist = e.queries()["graph_family_sizes"](sf)
    fams = e.queries()["graph_families"](sf)
    assert (hist["family_size"] * hist["n_families"]).sum() == len(fams)
    assert (hist["family_size"] >= 2).all()  # a family needs >= 2 parents


def test_hour_profile_counts_all_events():
    from fs_crawler_ray.pipelines.relational import q_events_hour_profile

    sf = "/root/testdata/sf0.001"
    out = q_events_hour_profile(sf)
    ev = pd.read_parquet(f"{sf}/events.parquet", columns=["event_id"])
    assert out["n_events"].sum() == len(ev)
    assert out["hour"].between(0, 23).all()
