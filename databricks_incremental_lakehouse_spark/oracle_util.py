"""Helpers for composing DuckDB oracle SQL from layered CTE fragments."""

from __future__ import annotations


def with_clause(ctes: dict[str, str], final_select: str) -> str:
    """Render an ordered CTE dict plus the terminal SELECT."""
    body = ",\n".join(f"{name} AS ({sql})" for name, sql in ctes.items())
    return f"WITH {body}\n{final_select}"


def replace_cast(cols_to_type: dict[str, str]) -> str:
    """Render a DuckDB ``* REPLACE`` clause casting columns to hash-stable types.

    The driver's order-insensitive value hash serializes DECIMAL and HUGEINT
    differently between Spark and DuckDB even when every value is identical
    (CORRECTNESS_r03: 16 value-identical ``hash_match: false`` rows). Every
    oracle whose output would otherwise carry DECIMAL (-> DOUBLE) or HUGEINT
    (-> BIGINT) applies this at its terminal SELECT; the Spark twin is cast
    centrally in ``registry.register``. Internal CTEs keep DECIMAL so the
    reference-DDL fidelity (create_extract_schemas.py:28) is preserved on the
    materialized pipeline path.
    """
    inner = ", ".join(f"CAST({c} AS {t}) AS {c}" for c, t in cols_to_type.items())
    return f"* REPLACE ({inner})"
