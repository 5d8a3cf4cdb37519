"""Composite operators Spark lacks natively (SURVEY §4.3)."""

from .asof import asof_join  # noqa: F401
from .hll import (  # noqa: F401
    bucket_col,
    estimate_col,
    map_to_registers,
    merge_registers_agg,
    register_map_agg,
    rho_col,
)
from .zorder import interleave_bits, minmax_bucket, zorder_layout  # noqa: F401
