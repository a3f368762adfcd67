"""Unit tests for the wave-31 operators: language confusion matrix
(text.lang_confusion), cross-modal label rarity (ann.label_rarity) and
the assortativity moments (graph.assortativity_sum). Each is also
strictly oracled against DuckDB in __ray_entry__."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ann import label_rarity
from fs_crawler_ray.graph import assortativity_sum
from fs_crawler_ray.text import lang_confusion


def test_lang_confusion_crosstab():
    docs = pa.table({
        "doc_id": [1, 2, 3],
        "text": ["the cat sat on the mat and the dog",   # en stopwords
                 "der hund ist von der stadt und das",   # de stopwords
                 "the the the of of to a in is that"],   # en again
        "lang": ["en", "en", "zh"],  # declared metadata (doc 2 mislabeled)
    })
    out = (lang_confusion(ray.data.from_arrow(docs))
           .to_pandas().sort_values(["lang", "lang_guess"])
           .reset_index(drop=True))
    got = {(r["lang"], r["lang_guess"]): r["n_docs"] for _, r in out.iterrows()}
    assert got == {("en", "en"): 1, ("en", "de"): 1, ("zh", "en"): 1}


def test_label_rarity_totals():
    docs = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["alpha beta", "alpha alpha", "gamma"],
    })
    emb = pa.table({
        "vec_id": [0, 1, 2],
        "embedding": pa.array([[0.1, 0.2]] * 3, pa.list_(pa.float32())),
        "label": np.array([5, 5, 9], np.int32),
    })
    out = (label_rarity(ray.data.from_arrow(emb), ray.data.from_arrow(docs))
           .to_pandas().sort_values("label").reset_index(drop=True))
    # vocab by (count desc, tok): alpha(3)=1, beta(1)=2, gamma(1)=3
    # doc0 rarity = 1+2 = 3 (2 toks); doc1 = 1+1 = 2; doc2 = 3
    exp = pd.DataFrame({"label": [5, 9], "n_docs": [2, 1],
                        "rarity_sum": [5, 3], "token_sum": [4, 1]})
    pd.testing.assert_frame_equal(out.astype("int64"), exp.astype("int64"))


def test_assortativity_sum_hand_graph():
    # star: center c -> a, c -> b  (child->parent spans: a,b parents)
    edges = ray.data.from_arrow(pa.table({
        "source": ["c", "c", "a"],
        "destination": ["a", "b", "b"],
    }))
    out = assortativity_sum(edges).to_pandas()
    # degrees: c=2 (two sources), a=2 (src once, dst once), b=2 (dst twice)
    # edges: (c,a): 2*2=4, (c,b): 2*2=4, (a,b): 2*2=4
    assert out["n_edges"].iloc[0] == 3
    assert out["sum_deg_product"].iloc[0] == 12
    assert out["sum_src_deg"].iloc[0] == 6
    assert out["sum_dst_deg"].iloc[0] == 6
