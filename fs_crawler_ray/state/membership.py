"""Distributed person/URL-seen membership: bloom pre-filter + partitioned
cuckoo filters in Ray actors, consulted from ``map_batches`` stages.

This replaces the reference's process-local seen state
(``fscrawler/model/graph_memory_impl.py:33-34,45-46,60-63`` in-memory
sets; ``fscrawler/model/graph_db_impl.py:101-127`` SQL point lookups)
with the scale substitution mandated by the north rule:

- keys are hash-partitioned across K shard actors (one id meets exactly
  one shard), route = ``stable_hash64(id) % K``;
- each shard holds, per named set (e.g. ``visited``, ``processing``,
  ``edges``): a bloom bit-array pre-filter (fast definite-negative),
  a cuckoo filter (4-way buckets, 16-bit fingerprints, supports delete)
  and — in ``exact`` mode — an authoritative Python set used by the
  small-scale conformance tests;
- batch RPCs only: ``contains / add / check_and_add`` take numpy string
  arrays and return masks, so a 10^10-key frontier costs O(keys/batch)
  RPCs, not O(keys).

False-positive budget: in ``probabilistic`` mode membership may report
a never-seen id as seen (dropping a frontier candidate). Shards count
bloom/cuckoo occupancy and report it via ``stats()`` so bench runs can
record the fp budget; correctness runs use ``exact`` mode (SURVEY §7.5).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import ray

from fs_crawler_ray.ids import stable_hash64


# ----------------------------------------------------------------------
# Bloom filter (vectorized, double hashing)
# ----------------------------------------------------------------------
class BloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        n_bits = max(64, int(-capacity * np.log(fp_rate) / (np.log(2) ** 2)))
        self.n_bits = 1 << int(np.ceil(np.log2(n_bits)))
        self.k = max(1, int(round(self.n_bits / capacity * np.log(2))))
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        # double hashing: pos_i = h1 + i*h2 (Kirsch–Mitzenmacher)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            return (h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits)

    def add(self, h1: np.ndarray, h2: np.ndarray) -> None:
        pos = self._positions(h1, h2).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.count += len(h1)

    def contains(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        pos = self._positions(h1, h2)  # (k, n)
        word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0).astype(bool)


# ----------------------------------------------------------------------
# Cuckoo filter (4-slot buckets, 16-bit fingerprints)
# ----------------------------------------------------------------------
class CuckooFilter:
    """Partial-key cuckoo filter (Fan et al., CoNEXT'14, public paper).

    Lookup is fully vectorized; insert is vectorized for the
    no-collision fast path with a bounded per-key eviction loop for the
    rest. Supports ``delete`` (needed if a shard must retract
    ``processing`` marks on hop retry).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = max(8, int(capacity / self.SLOTS / 0.84) + 1)
        self.n_buckets = 1 << int(np.ceil(np.log2(n_buckets)))
        self.table = np.zeros((self.n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0
        self._mask = np.uint64(self.n_buckets - 1)
        #: cuckoo-with-stash: a failed eviction chain leaves one
        #: fingerprint in hand that belongs to some PREVIOUSLY inserted
        #: key — dropping it would create a false negative. It goes to
        #: the stash as BOTH of its (bucket, fingerprint) addressings
        #: (the alternate bucket is derivable from either), which lookups
        #: and deletes consult. Bounded in practice; a growing stash
        #: means the filter is undersized (see stats).
        self.stash: set[tuple[int, int]] = set()

    def _fp(self, h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(40)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 = empty slot sentinel

    def _i1(self, h: np.ndarray) -> np.ndarray:
        return (h & self._mask).astype(np.int64)

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            fph = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        return ((i1.astype(np.uint64) ^ fph) & self._mask).astype(np.int64)

    def contains_h(self, h: np.ndarray) -> np.ndarray:
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        t = self.table
        m1 = (t[i1] == fp[:, None]).any(axis=1)
        m2 = (t[i2] == fp[:, None]).any(axis=1)
        out = m1 | m2
        if self.stash:
            miss = np.nonzero(~out)[0]
            for j in miss:
                if (int(i1[j]), int(fp[j])) in self.stash:
                    out[j] = True
        return out

    def add_h(self, h: np.ndarray) -> None:
        """Vectorized insert. Already-present fingerprints are skipped
        (idempotent under Ray task retries — ``count`` tracks distinct
        keys up to fingerprint collisions, so the LOG's probabilistic
        vertex count no longer drifts on retried adds). The ~95%
        no-collision case is a masked scatter; only eviction chains drop
        to the per-key loop."""
        fp_all = self._fp(h)
        i1_all = self._i1(h)
        todo = ~self.contains_h(h)
        if not todo.any():
            return
        fp, i1 = fp_all[todo], i1_all[todo]
        # in-batch dedup of identical (bucket, fingerprint) insertions
        pair_key = (i1.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
        _, first = np.unique(pair_key, return_index=True)
        fp, i1 = fp[first], i1[first]
        i2 = self._i2(i1, fp)
        n = len(fp)
        inserted = np.zeros(n, dtype=bool)
        for buckets in (i1, i2):
            rem = np.nonzero(~inserted)[0]
            if len(rem) == 0:
                break
            idxs = buckets[rem]
            # one write per bucket per pass (avoid scatter conflicts)
            _, first_in_bucket = np.unique(idxs, return_index=True)
            cand = rem[first_in_bucket]
            rows = self.table[buckets[cand]]
            has_empty = (rows == 0).any(axis=1)
            slot = (rows == 0).argmax(axis=1)
            ok = cand[has_empty]
            self.table[buckets[ok], slot[has_empty]] = fp[ok]
            inserted[ok] = True
        for j in np.nonzero(~inserted)[0]:
            self._insert_one(int(i1[j]), int(i2[j]), np.uint16(fp[j]))
        self.count += n

    def _insert_one(self, i1: int, i2: int, fp: np.uint16) -> None:
        for idx in (i1, i2):
            row = self.table[idx]
            empt = np.nonzero(row == 0)[0]
            if len(empt):
                row[empt[0]] = fp
                return
        # evict with bounded kicks; a surviving in-hand fingerprint
        # (belonging to some earlier key) goes to the stash
        rng_state = int(fp)  # deterministic kicks
        idx = i1
        for kick in range(self.MAX_KICKS):
            rng_state = (rng_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = rng_state % self.SLOTS
            fp, self.table[idx, slot] = self.table[idx, slot], fp
            idx = int(self._i2(np.array([idx]), np.array([fp], dtype=np.uint16))[0])
            row = self.table[idx]
            empt = np.nonzero(row == 0)[0]
            if len(empt):
                row[empt[0]] = fp
                return
        self._stash_add(idx, int(fp))

    def _stash_add(self, idx: int, fp: int) -> None:
        alt = int(self._i2(np.array([idx]), np.array([fp], dtype=np.uint16))[0])
        self.stash.add((idx, fp))
        self.stash.add((alt, fp))

    def delete_h(self, h: np.ndarray) -> None:
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        for j in range(len(h)):
            for idx in (int(i1[j]), int(i2[j])):
                row = self.table[idx]
                hit = np.nonzero(row == fp[j])[0]
                if len(hit):
                    row[hit[0]] = 0
                    self.count -= 1
                    break
            else:
                pair = (int(i1[j]), int(fp[j]))
                if pair in self.stash:
                    alt = (int(i2[j]), int(fp[j]))
                    self.stash.discard(pair)
                    self.stash.discard(alt)
                    self.count -= 1


# ----------------------------------------------------------------------
# One shard's state (usable directly, or inside the Ray actor)
# ----------------------------------------------------------------------
class _NamedSet:
    def __init__(self, capacity: int, mode: str):
        self.mode = mode
        self.capacity = capacity
        self.exact: set | None = set() if mode == "exact" else None
        self.bloom = BloomFilter(capacity)
        self.cuckoo = CuckooFilter(capacity)

    def contains(self, keys: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        if self.mode == "exact":
            return np.fromiter((k in self.exact for k in keys), dtype=bool, count=len(keys))
        maybe = self.bloom.contains(h1, h2)
        out = np.zeros(len(keys), dtype=bool)
        if maybe.any():
            out[maybe] = self.cuckoo.contains_h(h1[maybe])
        return out

    def add(self, keys: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> None:
        if self.mode == "exact":
            self.exact.update(keys.tolist())
        self.bloom.add(h1, h2)
        self.cuckoo.add_h(h1)

    def clear(self) -> None:
        if self.exact is not None:
            self.exact = set()
        self.bloom = BloomFilter(self.capacity)
        self.cuckoo = CuckooFilter(self.capacity)


class MembershipShardState:
    """Per-shard multi-set membership. Keys: numpy arrays of strings."""

    H1_SEED, H2_SEED = 11, 23

    def __init__(self, capacity: int = 1 << 16, mode: str = "exact"):
        self.capacity = capacity
        self.mode = mode
        self.sets: dict[str, _NamedSet] = {}
        self._pending: dict[str, set] = {}

    def _get(self, name: str) -> _NamedSet:
        if name not in self.sets:
            self.sets[name] = _NamedSet(self.capacity, self.mode)
        return self.sets[name]

    @staticmethod
    def _hashes(keys: np.ndarray):
        return stable_hash64(keys, seed=MembershipShardState.H1_SEED), \
               stable_hash64(keys, seed=MembershipShardState.H2_SEED)

    def contains(self, name: str, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hashes(keys)
        return self._get(name).contains(keys, h1, h2)

    def contains_any(self, names: list[str], keys: np.ndarray) -> np.ndarray:
        """OR of membership across several named sets (one RPC)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hashes(keys)
        out = np.zeros(len(keys), dtype=bool)
        for n in names:
            out |= self._get(n).contains(keys, h1, h2)
        return out

    def add(self, name: str, keys: np.ndarray) -> int:
        if len(keys) == 0:
            return 0
        h1, h2 = self._hashes(keys)
        self._get(name).add(keys, h1, h2)
        return len(keys)

    def check_and_add(self, name: str, keys: np.ndarray) -> np.ndarray:
        """True where the key was ALREADY present; absent keys are added.
        Duplicate keys within the batch: first occurrence wins."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._hashes(keys)
        s = self._get(name)
        present = s.contains(keys, h1, h2)
        # in-batch duplicates: mark later occurrences as present
        _, first_idx, inv = np.unique(keys, return_index=True, return_inverse=True)
        is_first = np.zeros(len(keys), dtype=bool)
        is_first[first_idx] = True
        dup_present = present[first_idx][inv] | ~is_first
        new = ~dup_present
        new_first = new & is_first
        if new_first.any():
            s.add(keys[new_first], h1[new_first], h2[new_first])
        return present | ~new

    def check_and_add_deferred(self, name: str, keys: np.ndarray) -> np.ndarray:
        """contains() against COMMITTED state only; absent keys are
        buffered in a pending set merged by :meth:`commit`. Task retries
        re-send the same keys and get the same mask (the committed state
        is unchanged mid-epoch and the pending set dedups) — the
        retry-safe fused check+add used by the per-hop edge-seen filter."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        present = self.contains(name, keys)
        pend = self._pending.setdefault(name, set())
        pend.update(keys[~present].tolist())  # native str/bytes scalars
        return present

    def commit(self, name: str) -> int:
        """Merge the pending buffer into the committed filters."""
        pend = self._pending.pop(name, None)
        if not pend:
            return 0
        self.add(name, np.array(sorted(pend)))
        return len(pend)

    def clear(self, name: str) -> None:
        if name in self.sets:
            self.sets[name].clear()
        self._pending.pop(name, None)

    def drop(self, name: str) -> None:
        self.sets.pop(name, None)

    def stats(self) -> dict:
        return {
            name: {
                "mode": s.mode,
                "exact_size": len(s.exact) if s.exact is not None else None,
                "bloom_count": s.bloom.count,
                "cuckoo_count": s.cuckoo.count,
                "cuckoo_load": s.cuckoo.count / (s.cuckoo.n_buckets * CuckooFilter.SLOTS),
                "stash": len(s.cuckoo.stash),
            }
            for name, s in self.sets.items()
        }


MembershipShard = ray.remote(MembershipShardState)


@dataclass
class ShardedMembership:
    """Driver-side handle to the K shard actors + batched routing.

    Routing contract: key → shard ``stable_hash64(key, seed=7) % K``
    (``fs_crawler_ray.ids.shard_of``). Stages route inside their own
    ``map_batches`` batch (see :class:`SeenFilterStage`), so each batch
    issues ≤K RPCs regardless of batch size.
    """

    actors: list
    num_shards: int
    mode: str

    @staticmethod
    def create(num_shards: int, capacity_per_shard: int = 1 << 16, mode: str = "exact") -> "ShardedMembership":
        # num_cpus=0: the shards are lightweight, mostly-idle lookup
        # servers; reserving CPU slots makes them invisible contenders
        # against Ray Data's own resource accounting and can deadlock an
        # actor-pool stage on a small cluster (observed: fetch pool +
        # shard actors > num_cpus → pool never starts).
        actors = [
            MembershipShard.options(num_cpus=0, max_concurrency=1).remote(capacity_per_shard, mode)
            for _ in range(num_shards)
        ]
        return ShardedMembership(actors=actors, num_shards=num_shards, mode=mode)

    def _route(self, keys: np.ndarray):
        from fs_crawler_ray.ids import shard_of

        shards = shard_of(keys, self.num_shards)
        order = np.argsort(shards, kind="stable")
        bounds = np.searchsorted(shards[order], np.arange(self.num_shards + 1))
        return order, bounds

    def _scatter_gather(self, method: str, keys, *args) -> np.ndarray:
        keys = np.asarray(keys)
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        order, bounds = self._route(keys)
        refs, spans = [], []
        for s in range(self.num_shards):
            lo, hi = bounds[s], bounds[s + 1]
            if lo == hi:
                continue
            refs.append(getattr(self.actors[s], method).remote(*args, keys[order[lo:hi]]))
            spans.append((lo, hi))
        results = ray.get(refs)
        out = np.zeros(len(keys), dtype=bool)
        for (lo, hi), r in zip(spans, results):
            if isinstance(r, np.ndarray):
                out[order[lo:hi]] = r
        return out

    def contains(self, name: str, keys) -> np.ndarray:
        return self._scatter_gather("contains", keys, name)

    def contains_any(self, names: list[str], keys) -> np.ndarray:
        return self._scatter_gather("contains_any", keys, names)

    def add(self, name: str, keys) -> None:
        self._scatter_gather("add", keys, name)

    def check_and_add(self, name: str, keys) -> np.ndarray:
        return self._scatter_gather("check_and_add", keys, name)

    def check_and_add_deferred(self, name: str, keys) -> np.ndarray:
        return self._scatter_gather("check_and_add_deferred", keys, name)

    def commit(self, name: str) -> int:
        return sum(ray.get([a.commit.remote(name) for a in self.actors]))

    def clear(self, name: str) -> None:
        ray.get([a.clear.remote(name) for a in self.actors])

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])
