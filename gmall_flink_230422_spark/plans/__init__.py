"""Named query registry.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent DuckDB oracle SQL string (None for non-SQL-expressible ops, which
get a rows-only check). Names map to SURVEY.md §2 operator ids; the Spark
side and the SQL side alias every computed column identically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from collections.abc import Callable


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable  # (spark, sf_dir) -> DataFrame
    oracle: str | None  # DuckDB SQL or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = ()


def registry() -> dict[str, QuerySpec]:
    from . import analytics, dwd, gmall, graphq, llm, r8, r9, r10, r11, streamq, tpch, tpch_ext

    out: dict[str, QuerySpec] = {}
    for mod in (gmall, llm, tpch, tpch_ext, analytics, dwd, streamq, graphq, r8, r9, r10, r11):
        for spec in mod.SPECS:
            assert spec.name not in out, f"duplicate query name {spec.name}"
            out[spec.name] = spec
    return out
