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

# Ray Data's path resolution probes `fsspec.implementations.http` on
# EVERY read/write; with aiohttp absent the import fails and is retried
# each call, and concurrent imports from our threaded hop branches race
# into "cannot import name 'HTTPFileSystem'" ImportErrors that Ray's
# ModuleNotFoundError guard doesn't catch. Install a completed stub once
# (single-threaded, at package import): the isinstance() check against
# the sentinel is always False, which is the correct answer here — this
# sandbox never uses HTTP filesystems.
def _stub_fsspec_http() -> None:
    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        import sys
        import types

        try:
            import fsspec.implementations  # noqa: F401
        except ImportError:
            return
        stub = types.ModuleType("fsspec.implementations.http")

        class _HTTPFileSystemUnavailable:  # pragma: no cover - sentinel
            pass

        stub.HTTPFileSystem = _HTTPFileSystemUnavailable
        sys.modules["fsspec.implementations.http"] = stub


_stub_fsspec_http()

from fs_crawler_ray.model import Gender, RelationshipType, SpanKind

__all__ = ["Gender", "RelationshipType", "SpanKind"]
__version__ = "0.1.0"
