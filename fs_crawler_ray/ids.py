"""Person-ID codec and stable vectorized hashing.

Person IDs follow the reference format ``[A-Z0-9]{4}-[A-Z0-9]{3}``
(validated at ``fscrawler/crawler.py:92-94``). We map dense integer
indices to IDs via base-36 so ID sort order == index order, which makes
the canonical frontier ordering (sorted by id) deterministic and easy
to reason about in both the Ray pipeline and the single-process oracle.

``stable_hash64`` is the ONE hash used for shard routing, bloom/cuckoo
fingerprints and salted repartitioning — a vectorized FNV-1a over the
string bytes. It must be stable across processes (unlike Python's
``hash``) so resume can rebuild filter state identically.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

ALPHABET = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ID_RE = re.compile(r"^[A-Z0-9]{4}-[A-Z0-9]{3}$")

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def index_to_pid(i: int) -> str:
    """Dense index → person id, order-preserving (base-36, 7 digits)."""
    if i < 0 or i >= 36**7:
        raise ValueError(f"index out of range: {i}")
    digits = []
    for _ in range(7):
        digits.append(ALPHABET[i % 36])
        i //= 36
    s = "".join(reversed(digits))
    return s[:4] + "-" + s[4:]


def pid_to_index(pid: str) -> int:
    s = pid.replace("-", "")
    i = 0
    for ch in s:
        i = i * 36 + ALPHABET.index(ch)
    return i


def is_valid_pid(pid: str) -> bool:
    """Seed-ID regex gate (reference crawler.py:92-94)."""
    return bool(ID_RE.match(pid))


def indices_to_pids(idx: np.ndarray) -> np.ndarray:
    """Vectorized index→pid for corpus generation."""
    idx = np.asarray(idx, dtype=np.int64)
    out = np.empty((len(idx), 8), dtype="U1")
    rem = idx.copy()
    chars = np.array(list(ALPHABET))
    cols = [7, 6, 5, 3, 2, 1, 0]  # positions of digits (4 is the dash)
    for c in cols:
        out[:, c] = chars[rem % 36]
        rem //= 36
    out[:, 4] = "-"
    return np.array(["".join(row) for row in out])


def _to_bytes_matrix(values) -> tuple[np.ndarray, np.ndarray]:
    """Strings → (N, maxlen) uint8 matrix + lengths, for vectorized hashing."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_numpy(zero_copy_only=False)
    arr = np.asarray(values, dtype="U")
    # Encode via UTF-32 view → keep low byte (ids are ASCII; general
    # strings still hash stably since we fold all 4 bytes).
    u32 = arr.view(np.uint32).reshape(len(arr), -1)
    lengths = (u32 != 0).sum(axis=1)
    return u32, lengths


def stable_hash64(values, seed: int = 0) -> np.ndarray:
    """Vectorized stable 64-bit hash of an array of strings.

    FNV-1a over UTF-32 code units, with a seed mixed in. Returns
    ``np.uint64`` array. O(maxlen) vectorized passes over all rows.
    """
    u32, lengths = _to_bytes_matrix(values)
    n, width = u32.shape
    h = np.full(n, _FNV_OFFSET ^ np.uint64(seed * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in range(width):
            col = u32[:, c].astype(np.uint64)
            active = c < lengths
            h2 = (h ^ col) * _FNV_PRIME
            h = np.where(active, h2, h)
        # final avalanche (splitmix64 tail)
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def shard_of(values, num_shards: int, seed: int = 7) -> np.ndarray:
    """Hash-partition routing: id → shard index (uint32)."""
    return (stable_hash64(values, seed=seed) % np.uint64(num_shards)).astype(np.uint32)
