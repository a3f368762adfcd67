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
        self.lineage: list[dict] = []

    def increment(self, deltas: dict[str, float]) -> None:
        for k, v in deltas.items():
            self.counters[k] += v

    def add_lineage(self, row: dict) -> None:
        self.lineage.append(row)

    def snapshot(self) -> dict:
        return dict(self.counters)

    def lineage_rows(self) -> list[dict]:
        return list(self.lineage)

    def reset_counters(self) -> dict:
        out = dict(self.counters)
        self.counters = defaultdict(float)
        return out
