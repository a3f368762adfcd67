"""Robots gating over the synthetic document space.

The reference has no robots implementation (it crawls a single
authenticated API); the north rule requires robots gating as a
first-class stage, so it is designed fresh: person documents are mapped
onto synthetic "hosts" by stable hash, and a deterministic per-host
disallow rule stands in for fetched/parsed robots.txt files. At real
scale the ``rules_for_host`` table would be a small broadcast dataset
(``ray.put`` once, read per fetch actor) refreshed out-of-band.

The policy is deterministic and identical in the Ray fetch actors and
the single-process oracle, so conformance tests can assert equality of
the crawl with gating enabled.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from fs_crawler_ray.ids import stable_hash64


@dataclass(frozen=True)
class RobotsPolicy:
    """Block documents whose host is disallowed.

    host(id) = stable_hash64(id, seed) % n_hosts;
    disallowed iff host % disallow_every == 0 (disallow_every <= 0 → allow all).
    """

    n_hosts: int = 1024
    disallow_every: int = 0
    seed: int = 101

    def hosts(self, ids) -> np.ndarray:
        return (stable_hash64(ids, seed=self.seed) % np.uint64(self.n_hosts)).astype(np.int64)

    def allowed_mask(self, ids) -> np.ndarray:
        hosts = self.hosts(ids)
        if self.disallow_every <= 0:
            return np.ones(len(hosts), dtype=bool)
        return (hosts % self.disallow_every) != 0

    def blocked(self, one_id: str) -> bool:
        return not bool(self.allowed_mask(np.array([one_id]))[0])
