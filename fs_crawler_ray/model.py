"""Core data model: enums, Arrow schemas, span kinds.

Mirrors the reference's fixed schemas (cited per item) re-expressed as
Arrow types:

- Gender/"color": ``fscrawler/model/individual.py:8-11`` (Male=-1,
  Unknown=0, Female=1) — doubles as the RedBlackGraph vertex color.
- RelationshipType 12-value enum: ``fscrawler/model/relationship_types.py:15-27``.
- VERTEX table: ``fscrawler/model/graph_db_impl.py:29-38``.
- EDGE table: ``fscrawler/model/graph_db_impl.py:39-46``.
- FRONTIER_VERTEX: ``fscrawler/model/graph_db_impl.py:66-70`` (extended
  with priority/hop for the sharded frontier).
- LOG table: ``fscrawler/model/graph_db_impl.py:76-86``.
"""

from __future__ import annotations

import enum

import pyarrow as pa


class Gender(enum.IntEnum):
    MALE = -1
    UNKNOWN = 0
    FEMALE = 1

    @staticmethod
    def from_text(text: str) -> "Gender":
        return {"Male": Gender.MALE, "Female": Gender.FEMALE}.get(text, Gender.UNKNOWN)

    @property
    def text(self) -> str:
        return {Gender.MALE: "Male", Gender.FEMALE: "Female", Gender.UNKNOWN: "Unknown"}[self]


class RelationshipType(str, enum.Enum):
    """The 12 relationship states (reference relationship_types.py:15-27).

    The first four are synthetic workflow states; the rest are the
    GEDCOM-X fact types (shortened path component of the fact URI).
    """

    UNTYPED_PARENT = "UntypedParent"
    ASSUMED_BIOLOGICAL = "AssumedBiological"
    RESOLVE = "Resolve"
    UNSPECIFIED_PARENT = "UnspecifiedParentType"
    UNTYPED_COUPLE = "UntypedCouple"
    ADOPTIVE_PARENT = "AdoptiveParent"
    BIOLOGICAL_PARENT = "BiologicalParent"
    FOSTER_PARENT = "FosterParent"
    GUARDIAN_PARENT = "GuardianParent"
    STEP_PARENT = "StepParent"
    SOCIOLOGICAL_PARENT = "SociologicalParent"
    SURROGATE_PARENT = "SurrogateParent"


#: Concrete fact types the synthetic relationship store can answer with
#: (everything except the 5 workflow states).
FACT_TYPES = [
    RelationshipType.BIOLOGICAL_PARENT,
    RelationshipType.STEP_PARENT,
    RelationshipType.ADOPTIVE_PARENT,
    RelationshipType.FOSTER_PARENT,
    RelationshipType.GUARDIAN_PARENT,
    RelationshipType.SOCIOLOGICAL_PARENT,
    RelationshipType.SURROGATE_PARENT,
]

#: Edge types kept in the primary edges output after resolution rewrite
#: (reference relationship_rewriter.py:8-12); everything else → aux edges.
PRIMARY_EDGE_TYPES = {
    RelationshipType.UNTYPED_PARENT.value,
    RelationshipType.UNSPECIFIED_PARENT.value,
    RelationshipType.BIOLOGICAL_PARENT.value,
}

#: Edge types included in the adjacency export (reference db_reader.py:15,25,41).
ADJACENCY_EDGE_TYPES = (
    RelationshipType.ASSUMED_BIOLOGICAL.value,
    RelationshipType.UNSPECIFIED_PARENT.value,
    RelationshipType.BIOLOGICAL_PARENT.value,
)


class SpanKind:
    """Span kinds of the interleaved-document table, in canonical per-doc
    order (FIXTURES.md F1). The per-row invariant vs the reference is
    span-sequence equality on ``(kind, text, media_ref, order)``."""

    NAME_GIVEN = "name.given"
    NAME_SURNAME = "name.surname"
    GENDER = "gender"
    LIVING = "living"
    LIFESPAN = "lifespan"
    COUPLE = "couple"
    CHILD_PARENT = "child_parent"
    MEDIA = "media"

    ALL = [NAME_GIVEN, NAME_SURNAME, GENDER, LIVING, LIFESPAN, COUPLE, CHILD_PARENT, MEDIA]


SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

DOCUMENT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

#: Synthetic relationship-resolution store ("the relationship API"):
#: answers the resolve fetch (reference fsapi.py:99-123). parent2 may be
#: null (single-parent relationship). A null *_type means the API
#: returned no facts → UnspecifiedParentType (fsapi.py:105-107 default).
RELATIONSHIP_SCHEMA = pa.schema(
    [
        ("rel_id", pa.string()),
        ("child", pa.string()),
        ("parent1", pa.string()),
        ("parent2", pa.string()),
        ("parent1_type", pa.string()),
        ("parent2_type", pa.string()),
    ]
)

VERTEX_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("color", pa.int8()),
        ("surname", pa.string()),
        ("given_name", pa.string()),
        ("iteration", pa.int32()),
        ("lifespan", pa.string()),
        ("living", pa.bool_()),
    ]
)

EDGE_SCHEMA = pa.schema(
    [
        ("source", pa.string()),  # child
        ("destination", pa.string()),  # parent
        ("type", pa.string()),
        ("id", pa.string()),  # relationship id; shared by parent1/parent2 rows
        ("hop", pa.int32()),  # hop at which the edge was first observed
    ]
)

FRONTIER_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("priority", pa.int64()),
        ("hop", pa.int32()),
    ]
)

LOG_SCHEMA = pa.schema(
    [
        ("iteration", pa.int32()),
        ("duration", pa.float64()),
        ("vertices", pa.int64()),
        ("frontier", pa.int64()),
        ("edges", pa.int64()),
        ("spanning_edges", pa.int64()),
        ("frontier_edges", pa.int64()),
    ]
)
