"""Composite operators Spark lacks natively (SURVEY §4.3)."""

from .asof import asof_join  # noqa: F401
from .zorder import interleave_bits, minmax_bucket, zorder_layout  # noqa: F401
