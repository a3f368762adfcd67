"""Graph validator (SURVEY §3.2): parent-count validation, invalid
categorization, histograms, valid-graph renumbering.

Faithful re-derivation of ``fscrawler/controller/graph_validator.py``:

- M7 lifespan→birth-year (``graph_validator.py:24-35``): a ``'-1'``
  substring splits birth/death (prefix empty → death-only → use death
  year); ``'Living'`` → 3000; otherwise 0 ("Dead").
- per-child gender-bucketed parent counts over VALIDATION types
  {BiologicalParent, UnspecifiedParentType} and RESOLUTION types
  {UntypedParent}, counting only parents that are resolved vertices
  (``graph_validator.py:94-122``); parents outside vertices ∪ frontier
  are "unknown vertices";
- invalid iff >2 counted parents (or 0), with the reference's 8-way
  category ladder (``graph_validator.py:125-154``); resolution_src =
  children with >1 same-gender UntypedParent parents
  (``graph_validator.py:161-164``);
- A7 birth-decade histogram, A8 per-iteration histogram;
- J4 save_valid_graph (``graph_validator.py:194-225``): renumber
  vertices 1..N, rewrite edges dropping invalid children, emit the
  invalid-relationships table.

Ray mapping: one shuffle join (edge destination → parent gender), one
hash-bucketed grouped aggregation (vectorized pandas per bucket), and
driver-side reduction of the (small) per-bucket stats.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from fs_crawler_ray.relops import _BUCKET_COL, _add_bucket, broadcast_semi_join
from fs_crawler_ray.stages.export import zip_with_index

VALIDATION_TYPES = ["BiologicalParent", "UnspecifiedParentType"]
RESOLUTION_TYPES = ["UntypedParent"]
DEAD, LIVING = 0, 3000

INVALID_CATEGORIES = [
    "male_female_unknown", "female_unknown", "male_unknown",
    "male_female", "father", "mother", "unknown",
]


def birth_year_from_lifespan(lifespans: np.ndarray) -> np.ndarray:
    """Vectorized M7. '1894-1983'→1894, '-1983'→1983, 'Living'→3000, else 0."""
    s = pd.Series(lifespans, dtype="object").fillna("")
    idx = s.str.find("-1")
    out = np.zeros(len(s), dtype=np.int64)
    living = (idx == -1) & (s == "Living")
    out[living.to_numpy()] = LIVING
    pre = idx > 0
    out[pre.to_numpy()] = pd.to_numeric(s[pre].str.slice(0, None).str.extract(r"^(\d+)-1")[0],
                                        errors="coerce").fillna(0).astype(np.int64).to_numpy()
    d_only = idx == 0
    out[d_only.to_numpy()] = pd.to_numeric(s[d_only].str.slice(1), errors="coerce").fillna(0).astype(np.int64).to_numpy()
    return out


@dataclass
class ValidationStats:
    vertex_count: int = 0
    frontier_vertex_count: int = 0
    edge_count: int = 0
    child_count: int = 0
    unknown_vertex_count: int = 0
    invalid_counts: dict = field(default_factory=dict)   # category → n
    no_rel_count: int = 0
    max_father: int = 0
    max_mother: int = 0
    invalid_src_count: int = 0
    resolution_src_count: int = 0
    birth_decade_histogram: dict = field(default_factory=dict)
    iteration_histogram: dict = field(default_factory=dict)


def _per_child_table(
    edges: ray.data.Dataset,
    vertices: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Edges ⟕ vertices(destination→parent gender) → per-child gender
    counts for validation and resolution type families."""
    from fs_crawler_ray.relops import lookup_join

    vg = vertices.select_columns(["id", "color"]).rename_columns({"id": "__p", "color": "pg"})
    j = lookup_join(
        edges.select_columns(["source", "destination", "type"]), vg,
        on="destination", right_on="__p", how="left", num_partitions=num_partitions,
    )

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        known = df["pg"].notna()
        out = pd.DataFrame({"source": df["source"]})
        pg = df["pg"].fillna(99).astype(int)
        for fam, types in (("v", VALIDATION_TYPES), ("r", RESOLUTION_TYPES)):
            in_fam = df["type"].isin(types) & known
            for g, tag in ((-1, "m"), (1, "f"), (0, "u")):
                out[f"{fam}{tag}"] = (in_fam & (pg == g)).astype(np.int64)
            out[f"{fam}_any"] = in_fam.astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    counted = j.map_batches(partial, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.drop(columns=[_BUCKET_COL]).groupby("source", as_index=False).sum()
        return agg

    return _add_bucket(counted, ["source"], 64).groupby(
        _BUCKET_COL, num_partitions=64
    ).map_groups(
        per_bucket, batch_format="pandas"
    )


def classify_children(per_child: pd.DataFrame) -> pd.DataFrame:
    """Vectorized invalid/resolution classification (graph_validator.py:125-164).
    Only children with ≥1 VALIDATION-counted parent enter validation
    (the reference's defaultdict is only created on access)."""
    df = per_child
    v_tot = df["vm"] + df["vf"] + df["vu"]
    has_v = df["v_any"] > 0
    invalid = has_v & ((v_tot > 2) | (v_tot == 0))
    over = has_v & (v_tot > 2)
    m, f, u = df["vm"] > 1, df["vf"] > 1, df["vu"] > 1
    cat = np.select(
        [over & m & f & u, over & f & u, over & m & u, over & m & f, over & m, over & f, over & u],
        ["male_female_unknown", "female_unknown", "male_unknown", "male_female", "father", "mother", "unknown"],
        default="",
    )
    cat = np.where(over & (cat == ""), "unknown", cat)  # reference's else-fallback
    out = df.copy()
    out["invalid"] = invalid
    out["no_rel"] = has_v & (v_tot == 0)
    out["category"] = cat
    out["resolution"] = (df["r_any"] > 0) & ((df["rm"] > 1) | (df["rf"] > 1) | (df["ru"] > 1))
    return out


def validate(
    vertices: ray.data.Dataset,
    edges: ray.data.Dataset,
    frontier: ray.data.Dataset,
    num_partitions: int = 16,
) -> tuple[ValidationStats, ray.data.Dataset]:
    """→ (stats, per-child classification Dataset[source, invalid,
    category, resolution, ...])."""
    stats = ValidationStats()
    stats.vertex_count = vertices.count()
    stats.frontier_vertex_count = frontier.count()
    stats.edge_count = edges.count()

    per_child = _per_child_table(edges, vertices, num_partitions).materialize()
    classified_ds = per_child.map_batches(
        lambda df: classify_children(df), batch_format="pandas"
    ).materialize()

    # small driver-side reductions over per-child rows (one row per child)
    cls = classified_ds.to_pandas()
    stats.child_count = int((cls["v_any"] > 0).sum() + (cls["r_any"] > 0).sum())
    stats.invalid_src_count = int(cls["invalid"].sum())
    stats.no_rel_count = int(cls["no_rel"].sum())
    stats.resolution_src_count = int(cls["resolution"].sum())
    stats.invalid_counts = {
        c: int((cls.loc[cls["invalid"], "category"] == c).sum()) for c in INVALID_CATEGORIES
    }
    over = cls["invalid"] & (cls["vm"] + cls["vf"] + cls["vu"] > 2)
    stats.max_father = int(cls.loc[over & (cls["vm"] > 1), "vm"].max()) if (over & (cls["vm"] > 1)).any() else 0
    stats.max_mother = int(cls.loc[over & (cls["vf"] > 1), "vf"].max()) if (over & (cls["vf"] > 1)).any() else 0

    # unknown vertices: edge destinations outside vertices ∪ frontier
    from fs_crawler_ray.relops import semi_anti_join

    unknown = semi_anti_join(
        edges.select_columns(["destination"]), vertices, "destination", "id",
        anti=True, num_partitions=num_partitions,
    )
    unknown = semi_anti_join(unknown, frontier, "destination", "id",
                             anti=True, num_partitions=num_partitions)
    uniq = unknown.unique("destination")  # None when the dataset is empty
    stats.unknown_vertex_count = len(uniq) if uniq else 0

    # histograms over invalid children (A7/A8)
    inv_ids = cls.loc[cls["invalid"], "source"]
    if len(inv_ids):
        vmeta = broadcast_semi_join(
            vertices.select_columns(["id", "iteration", "lifespan"]), inv_ids.tolist(), "id"
        ).to_pandas()
        by = birth_year_from_lifespan(vmeta["lifespan"].to_numpy())
        dec, cnt = np.unique(by // 10 * 10, return_counts=True)
        stats.birth_decade_histogram = {int(d): int(c) for d, c in zip(dec, cnt)}
        it, cnt = np.unique(vmeta["iteration"].to_numpy(), return_counts=True)
        stats.iteration_histogram = {int(i): int(c) for i, c in zip(it, cnt)}

    return stats, classified_ds


def save_valid_graph(
    vertices: ray.data.Dataset,
    edges: ray.data.Dataset,
    classified: ray.data.Dataset,
    out_dir: str,
    num_partitions: int = 16,
) -> dict:
    """J4: renumber vertices 1..N (insertion order = (iteration, id)),
    rewrite edges through the numbering dropping invalid children, and
    emit the invalid-relationships table. Returns output paths."""
    import os

    numbered = zip_with_index(vertices, ["iteration", "id"], "vertex_number").materialize()
    vpath = os.path.join(out_dir, "validated.vertices.parquet")
    numbered.write_parquet(vpath)

    from fs_crawler_ray.relops import lookup_join, semi_anti_join

    invalid = classified.map_batches(
        lambda t: t.filter(pc.equal(t["invalid"], True)), batch_format="pyarrow"
    ).select_columns(["source"]).materialize()

    num = numbered.select_columns(["id", "vertex_number"])
    e = semi_anti_join(edges, invalid, "source", "source", anti=True,
                       num_partitions=num_partitions)
    e = lookup_join(e, num.rename_columns({"id": "__s", "vertex_number": "src_n"}),
                    on="source", right_on="__s", how="inner", num_partitions=num_partitions)
    e = lookup_join(e, num.rename_columns({"id": "__d", "vertex_number": "dst_n"}),
                    on="destination", right_on="__d", how="inner", num_partitions=num_partitions)
    epath = os.path.join(out_dir, "validated.edges.parquet")
    e.select_columns(["src_n", "dst_n"]).write_parquet(epath)

    inv_rel = semi_anti_join(edges, invalid, "source", "source", anti=False,
                             num_partitions=num_partitions).select_columns(["source", "id"])
    # the reference emits a deduplicated (child, rel) set via its
    # child_to_rel dict (graph_validator.py:220-225) — a two-parent
    # relationship must not produce duplicate rows
    from fs_crawler_ray.relops import distinct

    inv_rel = distinct(inv_rel, ["source", "id"], num_partitions)
    ipath = os.path.join(out_dir, "invalid.edges.parquet")
    inv_rel.write_parquet(ipath)
    return {"vertices": vpath, "edges": epath, "invalid": ipath}
