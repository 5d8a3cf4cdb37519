"""The reference station pipeline, batch + streaming twins (SURVEY §7 Phase 2)."""

from .station import build_station_records, enrich_links  # noqa: F401
