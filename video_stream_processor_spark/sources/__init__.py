"""Enrichment sources (SURVEY §2.1 S3-S5, §2.9 U1)."""

from .extractor import Extractor, StubExtractor, make_enrich_fn  # noqa: F401
