"""Result-type audit for the DuckDB oracle SQL registry.

Round-3 postmortem: two oracles (``corpus_mixture``, ``hopping_counts``)
emitted un-cast integer ``SUM`` columns, which DuckDB types as HUGEINT.
The local mirror fetched via ``fetchall()`` — HUGEINT coerces to Python
``int`` there, so the mirror stayed green — but the driver's fetch path
coerces HUGEINT through Arrow as decimal128/float, so its value hash
diverged while rows/schema matched. The failure class is invisible to any
value-level comparison on our side; the only reliable gate is to reject
the *type* before hashing.

``audit_oracle_types`` whitelists the DuckDB result types whose
cross-engine coercion we have verified to be stable. Anything else —
HUGEINT, UHUGEINT, DECIMAL, UBIGINT… — must be CAST in the oracle SQL.
"""

from __future__ import annotations

# Types whose Arrow/pandas/fetchall coercion is identical across DuckDB
# fetch paths. LIST types are allowed when their element type is allowed.
ALLOWED_ORACLE_TYPES = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP_NS",
}


def bad_oracle_types(columns, types) -> list[tuple[str, str]]:
    """Return ``(column, duckdb_type)`` pairs whose type is outside the
    verified-stable whitelist. ``types`` is ``relation.types``; nested
    LIST wrappers are stripped before the base type is checked."""
    bad = []
    for name, t in zip(columns, types):
        s = str(t)
        base = s
        while base.endswith("[]"):
            base = base[:-2]
        if base not in ALLOWED_ORACLE_TYPES:
            bad.append((name, s))
    return bad


def audit_relation(rel) -> list[tuple[str, str]]:
    """Audit a DuckDB relation's result schema (no rows are fetched)."""
    return bad_oracle_types([d[0] for d in rel.description], rel.types)
