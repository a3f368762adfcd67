"""Single-process, reference-faithful oracle crawler.

A direct re-derivation (NOT a copy) of the reference's in-memory crawl
semantics, used ONLY by tests as ground truth for the Ray Data engine:

- frontier/visited/processing superstep algebra:
  ``fscrawler/model/graph_memory_impl.py:60-98`` (add_to_frontier checks
  ``not in visited and not in processing``; start_iteration does
  ``frontier -= individuals; visited |= individuals; processing = frontier``).
- person-result processing: ``fscrawler/controller/fsapi.py:145-161``
  (add_individual per person; Couple relationships → both partners to
  frontier; childAndParents → edge per parent + both endpoints to
  frontier).
- edge dedup keeps the FIRST (source,destination) observation
  (``graph_memory_impl.py:69-73``).
- resolution classification: ``fscrawler/model/graph.py:188-224`` —
  per (source, gender) distinct rel-id sets; a rel is AssumedBiological
  iff its gender-set has size 1 and the source's total (sum of per-gender
  distinct counts) is < 3, else Resolve.
- resolve fetch: ``fscrawler/controller/fsapi.py:87-123`` — per rel,
  parent facts → type, default UnspecifiedParentType; update keyed by
  (child, parent).

Visit order within a hop is DEFINED as sorted person id (the reference's
order is incidental set/table order — SURVEY §2.6 O5); both the oracle
and the Ray engine use this canonical order, making keep-first edge
dedup deterministic: ordered by (hop, source_doc_id, span offset).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq

from fs_crawler_ray.model import RelationshipType, SpanKind
from fs_crawler_ray.state.robots import RobotsPolicy


@dataclass
class OracleResult:
    vertices: dict[str, dict] = field(default_factory=dict)   # id → record
    edges: dict[tuple[str, str], dict] = field(default_factory=dict)  # (src,dst) → {id, hop, type}
    frontier: set[str] = field(default_factory=set)
    visited: set[str] = field(default_factory=set)
    visit_order: list[str] = field(default_factory=list)      # canonical fetch order
    log: list[dict] = field(default_factory=list)


def load_docs(documents_path: str) -> dict[str, list[dict]]:
    t = pq.read_table(documents_path)
    return {d: s for d, s in zip(t["doc_id"].to_pylist(), t["spans"].to_pylist())}


def load_rels(relationships_path: str) -> dict[str, dict]:
    t = pq.read_table(relationships_path)
    return {r["rel_id"]: r for r in t.to_pylist()}


def oracle_crawl(
    documents_path: str,
    seeds: list[str],
    hops: int,
    robots: RobotsPolicy | None = None,
    frontier_budget: int | None = None,
) -> OracleResult:
    docs = load_docs(documents_path)
    res = OracleResult()
    frontier: dict[str, int] = {s: 0 for s in seeds}  # id → priority (hop queued)
    visited: set[str] = set()
    individuals: dict[str, dict] = {}

    for hop in range(hops):
        # start_iteration (graph_memory_impl.py:75-87)
        for k in individuals:
            frontier.pop(k, None)
        visited |= individuals.keys()
        individuals = {}
        eligible = sorted(
            ((p, i) for i, p in frontier.items() if i not in visited)
        )
        if frontier_budget is not None:
            head, tail = eligible[:frontier_budget], eligible[frontier_budget:]
        else:
            head, tail = eligible, []
        processing = {i for _, i in head}
        remainder = {i: p for p, i in tail}
        frontier = {}

        def add_to_frontier(fid: str) -> None:
            if fid not in visited and fid not in processing:
                if fid not in frontier or frontier[fid] > hop + 1:
                    frontier[fid] = hop + 1

        to_fetch = [i for _, i in head]
        n_vertices_before = len(visited)
        for fid in to_fetch:
            if robots is not None and robots.blocked(fid):
                continue
            spans = docs.get(fid)
            if spans is None:
                continue  # unfetchable; stays out of graph, may re-enter frontier later
            res.visit_order.append(fid)
            # person parse (individual.py:41-57, name.py:6-16)
            rec = {"id": fid, "color": 0, "surname": "", "given_name": "",
                   "iteration": hop, "lifespan": "", "living": False}
            for s in spans:
                k = s["kind"]
                if k == SpanKind.NAME_GIVEN:
                    rec["given_name"] = s["text"]
                elif k == SpanKind.NAME_SURNAME:
                    rec["surname"] = s["text"]
                elif k == SpanKind.GENDER:
                    rec["color"] = {"Male": -1, "Female": 1}.get(s["text"], 0)
                elif k == SpanKind.LIVING:
                    rec["living"] = s["text"] == "true"
                elif k == SpanKind.LIFESPAN:
                    rec["lifespan"] = s["text"]
                elif k == SpanKind.COUPLE:
                    add_to_frontier(s["text"])
                elif k == SpanKind.CHILD_PARENT:
                    child, parent, rel_id = s["text"].split("|")
                    add_to_frontier(child)
                    add_to_frontier(parent)
                    if (child, parent) not in res.edges:
                        res.edges[(child, parent)] = {
                            "id": rel_id, "hop": hop,
                            "type": RelationshipType.UNTYPED_PARENT.value,
                        }
            if fid not in visited and fid not in individuals:
                individuals[fid] = rec
                res.vertices[fid] = rec
        # carry unprocessed remainder with its original priority
        for i, p in remainder.items():
            if i not in frontier or frontier[i] > p:
                frontier[i] = p
        # end_iteration metrics (graph_memory_impl.py:89-120)
        members = visited | individuals.keys()
        within = spanning = front = 0
        for (s, d) in res.edges:
            si, di = s in members, d in members
            if si and di:
                within += 1
            elif not si and not di:
                front += 1
            else:
                spanning += 1
        res.log.append({
            "iteration": hop, "vertices": len(members), "frontier": len(frontier),
            "edges": within, "spanning_edges": spanning, "frontier_edges": front,
        })

    for k in individuals:
        frontier.pop(k, None)
    visited |= individuals.keys()
    res.frontier = set(frontier)
    res.visited = visited
    return res


def oracle_resolution(result: OracleResult) -> dict[str, str]:
    """Lazy-resolution classification over the crawled graph
    (graph_db_impl.py:217-231 candidate query + graph.py:188-224).

    Returns rel_id → 'AssumedBiological' | 'Resolve' for every
    UntypedParent edge whose BOTH endpoints are resolved vertices.
    """
    verts = result.vertices
    per_source: dict[str, dict[int, set[str]]] = {}
    for (s, d), e in result.edges.items():
        if e["type"] != RelationshipType.UNTYPED_PARENT.value:
            continue
        if s in verts and d in verts:
            per_source.setdefault(s, {}).setdefault(verts[d]["color"], set()).add(e["id"])
    out: dict[str, str] = {}
    for s, gender_sets in per_source.items():
        total = sum(len(v) for v in gender_sets.values())
        for rel_set in gender_sets.values():
            t = (RelationshipType.ASSUMED_BIOLOGICAL if len(rel_set) == 1 and total < 3
                 else RelationshipType.RESOLVE)
            for rid in rel_set:
                out[rid] = t.value
    return out


def oracle_validate(
    vertices: list[dict],
    edges: list[dict],
    frontier_ids: set[str],
) -> dict:
    """Single-pass validator oracle (graph_validator.py:40-164 semantics):
    returns the counter set the Ray validator must reproduce."""
    gender_map = {v["id"]: v["color"] for v in vertices}
    val_counts: dict[str, list[int]] = {}
    res_counts: dict[str, list[int]] = {}
    unknown = set()
    for e in edges:
        parent = e["destination"]
        if parent in gender_map:
            g = gender_map[parent]  # -1/0/1 → list index -1/0/1 like the reference
            if e["type"] in ("BiologicalParent", "UnspecifiedParentType"):
                val_counts.setdefault(e["source"], [0, 0, 0])[g] += 1
            if e["type"] == "UntypedParent":
                res_counts.setdefault(e["source"], [0, 0, 0])[g] += 1
        elif parent not in frontier_ids:
            unknown.add(parent)
    invalid = {}
    no_rel = 0
    max_father = max_mother = 0
    for child, v in val_counts.items():
        male, female, unk = v[-1], v[1], v[0]
        total = male + female + unk
        if total > 2:
            if male > 1:
                max_father = max(max_father, male)
            if female > 1:
                max_mother = max(max_mother, female)
            if male > 1 and female > 1 and unk > 1:
                cat = "male_female_unknown"
            elif female > 1 and unk > 1:
                cat = "female_unknown"
            elif male > 1 and unk > 1:
                cat = "male_unknown"
            elif male > 1 and female > 1:
                cat = "male_female"
            elif male > 1:
                cat = "father"
            elif female > 1:
                cat = "mother"
            else:
                cat = "unknown"
            invalid[child] = cat
        if total == 0:
            no_rel += 1
            invalid[child] = "no_rel"
    resolution = {c for c, v in res_counts.items() if v[0] > 1 or v[1] > 1 or v[-1] > 1}
    return {
        "child_count": len(val_counts) + len(res_counts),
        "unknown_vertex_count": len(unknown),
        "invalid": invalid,
        "no_rel_count": no_rel,
        "max_father": max_father,
        "max_mother": max_mother,
        "resolution_src": resolution,
    }


def oracle_resolve_fetch(
    result: OracleResult,
    classification: dict[str, str],
    relationships_path: str,
) -> dict[tuple[str, str], str]:
    """Apply classification by rel_id, then fetch Resolve-flagged rels and
    update edge types by (child, parent) (fsapi.py:99-123). Returns the
    final (source, destination) → type map."""
    rels = load_rels(relationships_path)
    final: dict[tuple[str, str], str] = {}
    for key, e in result.edges.items():
        final[key] = classification.get(e["id"], e["type"])
    resolve_ids = sorted({rid for rid, t in classification.items()
                          if t == RelationshipType.RESOLVE.value})
    for rid in resolve_ids:
        rel = rels.get(rid)
        if rel is None:
            continue  # resolve-phase errors are tolerated (fsapi.py:207-213)
        child = rel["child"]
        for pk, tk in (("parent1", "parent1_type"), ("parent2", "parent2_type")):
            parent = rel[pk]
            if parent is None or child is None:
                continue
            t = rel[tk] or RelationshipType.UNSPECIFIED_PARENT.value
            if (child, parent) in final:
                final[(child, parent)] = t
    return final
