"""Scalar/text/vector function library (SURVEY §2.7, §2.10)."""

from . import scalar  # noqa: F401
