"""Text-analysis + deduplication operators over document tables
(beyond-the-reference suite for large-scale training-data pipelines).

All operators take/return ``ray.data.Dataset`` over the
``documents(doc_id, text, lang, source, n_chars)`` layout and run as
vectorized ``map_batches`` (regexes/models compiled once per actor in
``__init__`` where stateful). Shuffles follow the bucketed-dedup
pattern of :mod:`fs_crawler_ray.relops`.

Operators:
- exact dedup: md5 content hash → keep-first by doc_id;
- MinHash + LSH near-dup: shingle → minhash signature → banded buckets
  → candidate pairs (groupby bucket) → verified Jaccard;
- SimHash fingerprints + near-dup candidates by Hamming distance;
- n-gram Jaccard pairwise verification;
- language-ID (stopword-profile heuristic), quality scoring
  (length/punct/stopword ratios), token counting, rolling-hash
  document fingerprinting.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from fs_crawler_ray.ids import stable_hash64
from fs_crawler_ray.relops import _BUCKET_COL, _add_bucket

# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------
def add_content_hash(ds: ray.data.Dataset, column: str = "text") -> ray.data.Dataset:
    """md5 hex of the text (md5 so a SQL oracle can reproduce it)."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        df["content_hash"] = [hashlib.md5(t.encode()).hexdigest() for t in df[column]]
        return df

    return ds.map_batches(f, batch_format="pandas")


def exact_dedup(ds: ray.data.Dataset, column: str = "text", id_col: str = "doc_id",
                num_buckets: int = 64) -> ray.data.Dataset:
    """Keep, per identical text, the row with the smallest id."""
    from fs_crawler_ray.relops import dedup_keep_first

    return dedup_keep_first(add_content_hash(ds, column), ["content_hash"], [id_col], num_buckets)


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------
_WORD_RE = re.compile(r"[a-z0-9]+")


def _shingles(text: str, k: int) -> set:
    toks = _WORD_RE.findall(text.lower())
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


from functools import lru_cache


@lru_cache(maxsize=16)
def _minhasher(num_perm: int, shingle_k: int, seed: int = 5) -> "MinHasher":
    """Worker-global cached MinHasher: stateless map tasks rebuild
    nothing after the first batch on a worker (avoids per-execution
    actor-pool churn while keeping the setup-once property)."""
    return MinHasher(num_perm=num_perm, shingle_k=shingle_k, seed=seed)


class MinHasher:
    """Minhash parameters + signature kernel (cached per worker via
    :func:`_minhasher`)."""

    def __init__(self, num_perm: int = 64, shingle_k: int = 3, seed: int = 5):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**61 - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.randint(0, 2**61 - 1, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = shingle_k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        h = stable_hash64(np.array(sorted(sh)))
        with np.errstate(over="ignore"):
            m = (h[:, None] * self.a[None, :] + self.b[None, :])
        return m.min(axis=0)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in df["text"]])
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        out["sig"] = list(sigs)
        return out


def minhash_lsh_candidates(
    ds: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """→ Dataset[doc_a, doc_b] candidate near-dup pairs (doc_a < doc_b).

    shingle→minhash per batch (actor pool) → explode to
    (band_id, band_hash, doc_id) → groupby band bucket → pairs within
    bucket. Pair explosion is bounded per bucket (oversized buckets are
    truncated with a log — hot-bucket salting is the scale lever)."""
    rows_per_band = num_perm // bands

    def sig_fn(df: pd.DataFrame) -> pd.DataFrame:
        return _minhasher(num_perm, shingle_k)(df)

    sigs = ds.select_columns(["doc_id", "text"]).map_batches(sig_fn, batch_format="pandas")

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, band_hash = [], [], []
        for doc, sig in zip(df["doc_id"], df["sig"]):
            s = np.asarray(sig, dtype=np.uint64).reshape(bands, rows_per_band)
            with np.errstate(over="ignore"):
                bh = (s * np.uint64(0x9E3779B97F4A7C15)).sum(axis=1)
            ids.extend([doc] * bands)
            band_ids.extend(range(bands))
            band_hash.extend(bh.tolist())
        return pd.DataFrame({"doc_id": ids, "band": band_ids, "bh": np.array(band_hash, dtype=np.uint64).astype("int64")})

    exploded = sigs.map_batches(explode, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for (_, _), grp in g.groupby(["band", "bh"]):
            ids = sorted(grp["doc_id"].unique())
            if len(ids) > 200:  # hot bucket cap; log-worthy at scale
                ids = ids[:200]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b})

    cand = _add_bucket(exploded, ["band", "bh"], 64).groupby(_BUCKET_COL).map_groups(
        lambda g: pairs(g.drop(columns=[_BUCKET_COL])), batch_format="pandas"
    )
    from fs_crawler_ray.relops import distinct

    return distinct(cand, ["doc_a", "doc_b"], 32)


def ngram_jaccard_verify(
    candidates: ray.data.Dataset,
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Verify candidate pairs by true shingle Jaccard. The docs table is
    broadcast (small side) — for corpora too big to broadcast, join text
    in by doc_id instead."""
    import ray

    tdf = docs.select_columns(["doc_id", "text"]).to_pandas()
    texts_ref = ray.put(dict(zip(tdf["doc_id"], tdf["text"])))

    def verify_fn(df: pd.DataFrame) -> pd.DataFrame:
        texts = ray.get(texts_ref)
        jac = []
        for a, b in zip(df["doc_a"], df["doc_b"]):
            sa, sb = _shingles(texts.get(a, ""), shingle_k), _shingles(texts.get(b, ""), shingle_k)
            inter = len(sa & sb)
            union = len(sa | sb) or 1
            jac.append(inter / union)
        df = df.copy()
        df["jaccard"] = jac
        return df[df["jaccard"] >= threshold]

    return candidates.map_batches(verify_fn, batch_format="pandas")


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
class SimHasher:
    def __init__(self, shingle_k: int = 2):
        self.k = shingle_k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for t in df["text"]:
            sh = sorted(_shingles(t, self.k))
            if not sh:
                out.append(0)
                continue
            h = stable_hash64(np.array(sh))
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
            v = (2 * bits - 1).sum(axis=0)
            u = int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out.append(u - 2**63)  # store as signed int64 (uint64 - int would go through float64)
        res = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        res["simhash"] = np.array(out, dtype=np.int64)
        return res


def simhash_fingerprints(ds: ray.data.Dataset, shingle_k: int = 2, concurrency: int = 4) -> ray.data.Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return SimHasher(shingle_k=shingle_k)(df)

    return ds.select_columns(["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def simhash_near_dups(ds: ray.data.Dataset, max_hamming: int = 3, shingle_k: int = 2) -> ray.data.Dataset:
    """Near-dup pairs by simhash Hamming distance ≤ max_hamming: bucket
    on 16-bit quarters (a pair within distance 3 shares ≥1 identical
    quarter — pigeonhole), verify distance within buckets."""
    fp = simhash_fingerprints(ds, shingle_k)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        h = df["simhash"].to_numpy().astype(np.int64).view(np.uint64)
        parts = []
        for q in range(4):
            quarter = ((h >> np.uint64(16 * q)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pd.DataFrame({"doc_id": df["doc_id"], "q": q, "qv": quarter,
                                       "simhash": df["simhash"]}))
        return pd.concat(parts, ignore_index=True)

    ex = fp.map_batches(explode, batch_format="pandas")

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, dist = [], [], []
        for (_, _), grp in g.groupby(["q", "qv"]):
            rows = grp.drop_duplicates("doc_id").sort_values("doc_id")
            ids = rows["doc_id"].tolist()
            hs = rows["simhash"].to_numpy().astype(np.int64).view(np.uint64)
            for i in range(len(ids)):
                x = np.bitwise_xor(hs[i], hs[i + 1:])
                d = np.array([bin(v).count("1") for v in x])
                ok = np.nonzero(d <= max_hamming)[0]
                for j in ok:
                    out_a.append(ids[i])
                    out_b.append(ids[i + 1 + j])
                    dist.append(int(d[j]))
        return pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "hamming": dist})

    from fs_crawler_ray.relops import distinct

    cand = _add_bucket(ex, ["q", "qv"], 32).groupby(_BUCKET_COL).map_groups(
        lambda g: pairs(g.drop(columns=[_BUCKET_COL])), batch_format="pandas"
    )
    return distinct(cand, ["doc_a", "doc_b"], 16)


# ----------------------------------------------------------------------
# language ID / quality / tokens / fingerprint
# ----------------------------------------------------------------------
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "von", "zu", "mit", "den", "ein"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "du", "est", "dans"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "es", "por"},
}


class TextAnalyzer:
    """Stateful stage: compiled regexes + stopword profiles built once
    per actor. Emits language guess, quality features, token count and a
    rolling-hash fingerprint per document."""

    def __init__(self):
        self.word = re.compile(r"[A-Za-z0-9]+")
        self.punct = re.compile(r"[^\w\s]")
        self.profiles = {lang: sw for lang, sw in _STOPWORDS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        langs, n_tokens, stop_ratio, punct_ratio, quality, fps = [], [], [], [], [], []
        for t in df["text"]:
            toks = [w.lower() for w in self.word.findall(t)]
            n = len(toks)
            n_tokens.append(n)
            scores = {lang: sum(w in sw for w in toks) for lang, sw in self.profiles.items()}
            best = max(scores, key=lambda k: (scores[k], k)) if n else "unknown"
            langs.append(best if scores.get(best, 0) > 0 else "unknown")
            sr = scores.get(best, 0) / n if n else 0.0
            pr = len(self.punct.findall(t)) / max(1, len(t))
            stop_ratio.append(sr)
            punct_ratio.append(pr)
            q = 0.0
            if 10 <= n <= 100000:
                q += 0.4
            q += 0.4 * min(sr * 5, 1.0)
            q += 0.2 * (1.0 - min(pr * 5, 1.0))
            quality.append(round(q, 4))
            # rolling polynomial fingerprint over tokens
            fp = np.uint64(0)
            with np.errstate(over="ignore"):
                if toks:
                    th = stable_hash64(np.array(toks))
                    p = np.uint64(1099511628211)
                    for v in th:
                        fp = fp * p + v
            fps.append(int(fp.astype(np.int64)))
        out = df.copy()
        out["lang_guess"] = langs
        out["n_tokens"] = np.array(n_tokens, dtype=np.int64)
        out["stop_ratio"] = np.round(np.array(stop_ratio), 6)
        out["punct_ratio"] = np.round(np.array(punct_ratio), 6)
        out["quality"] = quality
        out["fingerprint"] = np.array(fps, dtype=np.int64)
        return out


@lru_cache(maxsize=1)
def _analyzer() -> "TextAnalyzer":
    return TextAnalyzer()


def analyze_text(ds: ray.data.Dataset, concurrency: int = 4, batch_size: int = 2048) -> ray.data.Dataset:
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return _analyzer()(df)  # worker-global cached (regexes compiled once)

    return ds.map_batches(fn, batch_format="pandas", batch_size=batch_size)


def token_count(ds: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, n_tokens) with token = [A-Za-z0-9]+ runs — chosen so a
    DuckDB oracle (regexp_extract_all) reproduces it exactly."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        w = re.compile(r"[A-Za-z0-9]+")
        return pd.DataFrame({
            "doc_id": df["doc_id"],
            "n_tokens": df["text"].map(lambda t: len(w.findall(t))).astype(np.int64),
        })

    return ds.select_columns(["doc_id", "text"]).map_batches(f, batch_format="pandas")
