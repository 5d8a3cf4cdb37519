"""Aggregates the query registry from all plan modules."""

from __future__ import annotations

from .base import QuerySpec, register, registry


def all_specs() -> dict[str, QuerySpec]:
    """Import every plan module (side effect: registration) and return
    the full name → QuerySpec registry."""
    from . import relational  # noqa: F401

    for mod in (
        "windows",
        "setops",
        "joins",
        "scalars",
        "streaming_batch",
        "llm",
        "python_udfs",
        "sql_api",
        "station",
    ):
        try:
            __import__(f"{__name__}.{mod}")
        except ImportError:
            pass  # module not written yet (incremental build)
    return registry()


__all__ = ["QuerySpec", "register", "registry", "all_specs"]
