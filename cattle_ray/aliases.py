"""FIXTURES.md §4: the entity-linking alias dictionary (deterministic).

64 entities (8 imf countries + 56 synthetic), each with its canonical name +
2 deterministic variants (lowercase; first token). 8 engineered ambiguous
aliases map to two entity_uris each — candidate generation must emit both,
the linker picks max prior.
"""

from __future__ import annotations

import pyarrow as pa

from .pages import ENTITIES


def entity_uri(k: int) -> str:
    return f"https://example.org/id/entity/{k:04d}"


def alias_rows() -> list[dict]:
    rows = []
    for k, name in enumerate(ENTITIES):
        variants = [name, name.lower()]
        first = name.split()[0]
        if first != name:
            variants.append(first)
        seen = set()
        uniq = [v for v in variants if not (v in seen or seen.add(v))]
        for rank, alias in enumerate(uniq):
            rows.append(
                {"alias": alias, "entity_uri": entity_uri(k), "prior": 1.0 / (rank + 1)}
            )
    # engineered ambiguity: alias of entity k also points at entity k+32
    for k in range(8, 16):
        rows.append(
            {"alias": ENTITIES[k], "entity_uri": entity_uri(k + 32), "prior": 0.25}
        )
    return rows


ALIAS_SCHEMA = pa.schema(
    [
        pa.field("alias", pa.string()),
        pa.field("entity_uri", pa.string()),
        pa.field("prior", pa.float64()),
    ]
)


def alias_table() -> pa.Table:
    return pa.Table.from_pylist(alias_rows(), schema=ALIAS_SCHEMA)
