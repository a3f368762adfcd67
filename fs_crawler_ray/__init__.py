"""fs_crawler_ray — a Ray-Data-native re-creation of rappdw/fs-crawler.

A from-scratch BFS relationship-frontier crawl engine over person-graph
documents, expressed as ``ray.data.Dataset`` pipelines of ``map_batches``
over zero-copy Arrow batches, with stateful stages (URL/person-seen
membership, politeness-budgeted fetchers) held in Ray actor pools.

The input is a table of interleaved text + media documents
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
— the Lance layout from the design spec; this sandbox stores it as
Parquet because the ``lance`` package is not installed, but every reader
and writer goes through :mod:`fs_crawler_ray.sources.doc_table` so the
storage format is swappable.

Reference semantics are cited per-module as ``file:line`` into
``/root/reference`` (rappdw/fs-crawler); no code is copied from it.
"""

from fs_crawler_ray.model import Gender, RelationshipType, SpanKind

__all__ = ["Gender", "RelationshipType", "SpanKind"]
__version__ = "0.1.0"
