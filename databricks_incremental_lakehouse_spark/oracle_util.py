"""Helpers for composing DuckDB oracle SQL from layered CTE fragments."""

from __future__ import annotations


def with_clause(ctes: dict[str, str], final_select: str) -> str:
    """Render an ordered CTE dict plus the terminal SELECT."""
    body = ",\n".join(f"{name} AS ({sql})" for name, sql in ctes.items())
    return f"WITH {body}\n{final_select}"
