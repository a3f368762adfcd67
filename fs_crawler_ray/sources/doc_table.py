"""Access layer for the interleaved-document table and relationship store.

All readers/writers of the document corpus go through here so the
storage format is swappable (Parquet in this sandbox; Lance at
deployment scale — ``lance.dataset(...).take`` for point lookups and
``ray.data.read_lance`` for scans; the ``lance`` package is not
installed here).

``DocStore`` is the sandbox stand-in for the crawl's remote fetch
(reference ``fscrawler/controller/session.py:109-132`` HTTP GETs): a
batched point-lookup of doc_ids against the corpus. It memory-maps the
Parquet file once per process/actor (``__init__``-time state per the
actor-pool pattern) and serves ``fetch(ids)`` via a hash index +
``Table.take`` — zero-copy Arrow out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def read_documents(path: str, **kwargs) -> "ray.data.Dataset":
    return ray.data.read_parquet(path, **kwargs)


class DocStore:
    """Point-lookup view of the document corpus (the synthetic "web")."""

    def __init__(self, documents_path: str):
        self.table = pq.read_table(documents_path, memory_map=True)
        ids = self.table["doc_id"].to_numpy(zero_copy_only=False)
        self._index = {d: i for i, d in enumerate(ids)}

    def __len__(self) -> int:
        return len(self.table)

    def fetch(self, ids: np.ndarray) -> tuple[pa.Table, np.ndarray]:
        """ids → (docs table for the found ids, found mask).

        Missing ids are simply absent from the result — the reference
        treats unfetchable persons as silently unresolved (they stay out
        of the graph; ``fsapi.py:139-143`` only processes returned
        persons).
        """
        idx = np.array([self._index.get(d, -1) for d in ids], dtype=np.int64)
        found = idx >= 0
        docs = self.table.take(pa.array(idx[found]))
        return docs, found


class RelStore:
    """Point-lookup of childAndParents relationship docs by rel_id (the
    resolve-phase "API", reference ``fsapi.py:99-101``)."""

    def __init__(self, relationships_path: str):
        self.table = pq.read_table(relationships_path, memory_map=True)
        ids = self.table["rel_id"].to_numpy(zero_copy_only=False)
        self._index = {d: i for i, d in enumerate(ids)}

    def fetch(self, rel_ids: np.ndarray) -> pa.Table:
        idx = np.array([self._index.get(d, -1) for d in rel_ids], dtype=np.int64)
        return self.table.take(pa.array(idx[idx >= 0]))
