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


def classify_edge_tables(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    broadcast_limit: int | None = None,
    num_partitions: int = 16,
) -> dict:
    """J1 as TABLES: each edge classified by endpoint membership in the
    resolved vertex set → ``{"within": ds, "spanning": ds, "frontier":
    ds}`` (``graph_writer.py:100-114`` / ``graph_memory_impl.py:106-120``).
    Size-aware: small vertex sets are broadcast once (Arrow array +
    ``pc.is_in``); above ``broadcast_limit`` each endpoint membership
    flag comes from a distributed left join against the vertex-id table,
    so nothing is ever materialized driver-side."""
    from fs_crawler_ray.relops import BROADCAST_LIMIT

    limit = BROADCAST_LIMIT if broadcast_limit is None else broadcast_limit
    vert_ids = vertices.select_columns(["id"]).materialize()
    n_verts = vert_ids.count()

    def finish_cat(src_in: np.ndarray, dst_in: np.ndarray) -> pa.Array:
        cat = np.select([src_in & dst_in, ~src_in & ~dst_in], ["within", "frontier"], "spanning")
        return pa.array(cat.tolist(), pa.string())

    if n_verts <= limit:
        ref = ray.put(pa.array([r["id"] for r in vert_ids.take_all()]))

        def add_cat(t: pa.Table) -> pa.Table:
            ids = ray.get(ref)
            src_in = pc.is_in(t["source"], value_set=ids).to_numpy(zero_copy_only=False)
            dst_in = pc.is_in(t["destination"], value_set=ids).to_numpy(zero_copy_only=False)
            return t.append_column("category", finish_cat(src_in, dst_in))

        tagged = edges.map_batches(add_cat, batch_format="pyarrow")
    else:
        # distributed path: flag each endpoint via a left join with the
        # vertex-id table (flag column non-null => endpoint resolved).
        # Distinct right-side key names avoid colliding with the edge
        # table's own `id` (relationship id) column.
        def flag_tbl(col: str):
            def f(t: pa.Table) -> pa.Table:
                return pa.table({f"__{col}_key": t["id"],
                                 f"__{col}_in": pa.array(np.ones(len(t), dtype=bool))})
            return vert_ids.map_batches(f, batch_format="pyarrow")

        # relops.hash_join, not Dataset.join: vertex-id keys can be
        # sparse/skewed relative to the partition count, the regime
        # where the built-in KeyErrors on one-sided shuffle partitions
        # (relops.py:160). Explicit schemas: .schema() on a shuffle
        # output would execute the first join once just to learn types.
        from fs_crawler_ray.relops import hash_join

        e_sch = edges.schema().base_schema
        flag_sch = lambda col: pa.schema(  # noqa: E731
            [(f"__{col}_key", e_sch.field("source").type),
             (f"__{col}_in", pa.bool_())])
        j = hash_join(edges, flag_tbl("src"), on=["source"],
                      right_on=["__src_key"], how="left_outer",
                      num_buckets=num_partitions, left_schema=e_sch,
                      right_schema=flag_sch("src"))
        j = hash_join(j, flag_tbl("dst"), on=["destination"],
                      right_on=["__dst_key"], how="left_outer",
                      num_buckets=num_partitions,
                      left_schema=pa.schema(
                          list(e_sch) + [pa.field("__src_in", pa.bool_())]),
                      right_schema=flag_sch("dst"))

        def add_cat_joined(t: pa.Table) -> pa.Table:
            src_in = pc.is_valid(t["__src_in"]).to_numpy(zero_copy_only=False)
            dst_in = pc.is_valid(t["__dst_in"]).to_numpy(zero_copy_only=False)
            keep = [c for c in t.column_names if not c.startswith("__")]
            return t.select(keep).append_column("category", finish_cat(src_in, dst_in))

        # materialize once: the three per-category consumers would each
        # re-execute BOTH shuffle joins otherwise (6 joins instead of 2);
        # the broadcast path stays lazy — its re-run is one cheap is_in map
        tagged = j.map_batches(add_cat_joined, batch_format="pyarrow").materialize()

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
