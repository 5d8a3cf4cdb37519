"""Query registry backing the driver contract (``__spark_entry__.py``).

Every implemented operator from SURVEY §2 registers here as a
``QuerySpec``: a DataFrame builder ``(spark, sf_dir) -> DataFrame`` plus
(when SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle.

Determinism rules (SURVEY §4.3):
* alias every computed column identically in builder and oracle;
* round floating aggregates (sums of 2-decimal money values round
  exactly; averages to 6 dp) so both engines hash identically;
* no uuid()/current_timestamp()/rand() in oracle-checked queries;
* timestamps leave the query as DATE, epoch BIGINT, or formatted string.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None → rows-only check
    survey_ids: str  # SURVEY §2 operator ids this query evidences
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, survey_ids: str, oracle: str | None = None
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name,
            builder=fn,
            oracle=oracle.strip() if oracle else None,
            survey_ids=survey_ids,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return wrap


def registry() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)
