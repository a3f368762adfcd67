"""Crawl metrics + per-partition lineage.

Replaces the reference's request counter (``session.py:111,122``) and
per-iteration LOG rows (``graph_db_impl.py:157-176``) with a small
metrics actor that fetch/filter stages increment in batched,
fire-and-forget RPCs, plus per-hop lineage rows recording what each
fetch actor / membership shard did (a north-rule requirement)."""

from __future__ import annotations

from collections import defaultdict

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counters: dict[str, float] = defaultdict(float)
        #: per-hop counter buckets: fire-and-forget increments from map
        #: tasks are tagged with their hop, so a late-arriving delta can
        #: never be attributed to the wrong hop's lineage row (it lands
        #: in its own hop's bucket even if that hop's snapshot was
        #: already taken).
        self.by_hop: dict[int | None, dict[str, float]] = {}
        self.lineage: list[dict] = []

    def increment(self, deltas: dict[str, float], hop: int | None = None) -> None:
        bucket = self.by_hop.setdefault(hop, defaultdict(float))
        for k, v in deltas.items():
            self.counters[k] += v
            bucket[k] += v

    def add_lineage(self, row: dict) -> None:
        self.lineage.append(row)

    def snapshot(self) -> dict:
        return dict(self.counters)

    def lineage_rows(self) -> list[dict]:
        return list(self.lineage)

    def reset_counters(self, hop: int | None = None) -> dict:
        """Snapshot-and-clear. With ``hop``, only that hop's bucket is
        returned/cleared (hop-accurate lineage); without, the totals."""
        if hop is not None:
            return dict(self.by_hop.pop(hop, {}))
        out = dict(self.counters)
        self.counters = defaultdict(float)
        self.by_hop = {}
        return out
