"""CSV graph export — the reference's 6-file layout (SURVEY §2 S4,
``fscrawler/controller/graph_writer.py:10-123``), plus the
within/spanning/frontier edge sets as actual TABLES (the round-1 review
noted only their counts were exposed; a user wanting the spanning-edge
set had to re-derive it).

Files written under ``out_dir`` (headers verbatim from the reference,
``graph_writer.py:5-6``):

    {base}.vertices.csv            #external_id,color,name,iteration,lifespan
    {base}.edges.csv               #source_vertex,destination_vertex,relationship_type,relationship_id
    {base}.spanning.edges.csv      (same header)
    {base}.frontier.edges.csv      (same header)
    {base}.frontier.vertices.csv   #external_id
    {base}.log.csv                 #iteration,duration,vertices,frontier,edges,spanning_edges,frontier_edges

CSV is the reference's single-file interop format, so the writer
streams batches driver-side (O(batch) memory) into one file per table;
the columnar scale path remains the per-hop Parquet checkpoint. The
output round-trips through :mod:`fs_crawler_ray.functions.migrate`.
"""

from __future__ import annotations

import csv
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

RELATIONSHIP_HEADER = ["#source_vertex", "destination_vertex", "relationship_type", "relationship_id"]
VERTEX_HEADER = ["#external_id", "color", "name", "iteration", "lifespan"]
LOG_HEADER = ["#iteration", "duration", "vertices", "frontier", "edges", "spanning_edges", "frontier_edges"]


def classify_edge_tables(edges: ray.data.Dataset, vertices: ray.data.Dataset) -> dict:
    """J1 as TABLES: each edge classified by endpoint membership in the
    resolved vertex set → ``{"within": ds, "spanning": ds, "frontier":
    ds}`` (``graph_writer.py:100-114`` / ``graph_memory_impl.py:106-120``).
    The vertex-id set is broadcast once (Arrow array + ``pc.is_in``);
    for vertex sets beyond broadcast size use the membership shard
    actors (``crawl.MembershipFilter``) with the same category logic."""
    vert_ids = vertices.select_columns(["id"]).to_pandas()["id"].to_numpy()
    ref = ray.put(pa.array(vert_ids))

    def add_cat(t: pa.Table) -> pa.Table:
        ids = ray.get(ref)
        src_in = pc.is_in(t["source"], value_set=ids).to_numpy(zero_copy_only=False)
        dst_in = pc.is_in(t["destination"], value_set=ids).to_numpy(zero_copy_only=False)
        cat = np.select([src_in & dst_in, ~src_in & ~dst_in], ["within", "frontier"], "spanning")
        return t.append_column("category", pa.array(cat.tolist(), pa.string()))

    tagged = edges.map_batches(add_cat, batch_format="pyarrow")

    def only(cat: str):
        return tagged.map_batches(
            lambda t, c=cat: t.filter(pc.equal(t["category"], c)).drop_columns(["category"]),
            batch_format="pyarrow",
        )

    return {"within": only("within"), "spanning": only("spanning"), "frontier": only("frontier")}


def _stream_csv(path: str, header: list[str], ds: ray.data.Dataset | None, row_cols: list[str]) -> int:
    """Stream a Dataset into one reference-format CSV (header row first,
    then batches as they arrive — never materializes the table)."""
    n = 0
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        if ds is None:
            return 0
        for batch in ds.iter_batches(batch_size=8192, batch_format="pandas"):
            w.writerows(batch[row_cols].itertuples(index=False, name=None))
            n += len(batch)
    return n


def write_csv_graph(
    vertices: ray.data.Dataset,
    edges: ray.data.Dataset,
    frontier: ray.data.Dataset,
    log_rows: list[dict],
    out_dir: str,
    basename: str,
    save_living: bool = False,
) -> dict:
    """Write the reference's 6-file CSV graph layout. ``edges`` carries
    whatever types it has (UntypedParent during the crawl, final types
    after the resolution rewrite — both use the same header). Living
    individuals are dropped unless ``save_living`` (M10,
    ``graph_writer.py:85-87``). Returns ``{name: path}``."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "vertices": os.path.join(out_dir, f"{basename}.vertices.csv"),
        "edges": os.path.join(out_dir, f"{basename}.edges.csv"),
        "spanning_edges": os.path.join(out_dir, f"{basename}.spanning.edges.csv"),
        "frontier_edges": os.path.join(out_dir, f"{basename}.frontier.edges.csv"),
        "frontier_vertices": os.path.join(out_dir, f"{basename}.frontier.vertices.csv"),
        "log": os.path.join(out_dir, f"{basename}.log.csv"),
    }

    def fmt_vertices(t: pa.Table) -> pa.Table:
        if not save_living:
            t = t.filter(pc.equal(t["living"], False))
        name = pc.binary_join_element_wise(t["surname"], t["given_name"], ", ")
        return pa.table({
            "external_id": t["id"],
            "color": t["color"],
            "name": name,
            "iteration": t["iteration"],
            "lifespan": t["lifespan"],
        })

    _stream_csv(paths["vertices"], VERTEX_HEADER,
                vertices.map_batches(fmt_vertices, batch_format="pyarrow"),
                ["external_id", "color", "name", "iteration", "lifespan"])

    cats = classify_edge_tables(edges, vertices)
    for key, name in (("edges", "within"), ("spanning_edges", "spanning"), ("frontier_edges", "frontier")):
        ds = cats[name].select_columns(["source", "destination", "type", "id"])
        _stream_csv(paths[key], RELATIONSHIP_HEADER, ds, ["source", "destination", "type", "id"])

    _stream_csv(paths["frontier_vertices"], ["#external_id"],
                frontier.select_columns(["id"]), ["id"])

    with open(paths["log"], "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(LOG_HEADER)
        for row in log_rows:
            w.writerow([row.get("iteration"), row.get("duration"), row.get("vertices"),
                        row.get("frontier"), row.get("edges"), row.get("spanning_edges"),
                        row.get("frontier_edges")])
    return paths


def write_csv_graph_from_result(result, out_dir: str, basename: str,
                                save_living: bool = False, edges: ray.data.Dataset | None = None) -> dict:
    """Convenience: export a :class:`~fs_crawler_ray.crawl.CrawlResult`
    (optionally with resolution-rewritten ``edges``) to the CSV layout."""
    return write_csv_graph(
        result.vertices(), edges if edges is not None else result.edges(),
        result.frontier(), result.log, out_dir, basename, save_living,
    )
