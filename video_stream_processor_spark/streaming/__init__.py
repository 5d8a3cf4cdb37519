"""Streaming analytics (SURVEY §2.8 T1-T11).

Design rule: every analytic is a *plan builder* that accepts either a
batch or a streaming DataFrame — Structured Streaming treats a stream
as an unbounded relation, so the same declarative graph serves both.
Batch twins are registered as oracle-checked queries (plans/
streamshape.py); streaming execution is covered by equivalence tests
(tests/test_streaming.py) that replay the same parquet through the
file source and assert identical results.
"""

from .analytics import (  # noqa: F401
    session_stats,
    session_stats_sliced,
    signup_purchase_attribution,
    sliding_counts,
    stream_dedup,
    tumbling_stats,
    windowed_to_flat,
)
from .rollup import (  # noqa: F401
    MIN_DERIVED_STATE_STORES,
    backfill_rollup,
    coarsen_rollup,
    compact_rollup,
    derived_state_partitions,
    migrate_rollup,
    read_rollup,
    read_rollup_tiered,
    rollup_stats,
    rollup_table_p,
    sketch_p_of,
    start_rollup_maintenance,
    upgrade_rollup_v3_to_v4,
)
from .stateful import (  # noqa: F401
    closed_sessions_batch,
    closed_user_sessions,
    running_user_totals,
)
