"""Composite operators Spark lacks natively (SURVEY §4.3)."""

from .asof import asof_join  # noqa: F401
