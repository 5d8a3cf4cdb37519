"""Skew-mitigation: salted equi-join (SURVEY §2.3 scale notes).

AQE's skew-join split (on by default, session.py) handles most skew at
runtime by splitting oversized partitions; salting is the explicit
pre-plan form for the pathological case AQE can't fix — one join key so
hot that a single task would still own it after splitting (power-law
user_ids, null-ish sentinel keys).

Shape: the skewed (big) side gets a deterministic salt in [0, S);
the small side is replicated S times (explode over the salt range);
the join key becomes (key, salt). The hot key's rows now spread over S
tasks. Cost: small side inflates S× — keep S modest (8-32) and the
small side genuinely small.

Everything is deterministic (pmod of a hash, not rand()) so results
are reproducible and retries are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, key: str, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Per-row salt: hash of the join key mixed with a row-unique id, so
    EXACT duplicate rows of a hot key still spread across buckets (a
    row-content hash would collapse them into one). The id is not stable
    across retries, but salt placement never affects results — the small
    side is replicated to every bucket, so any assignment joins the
    same rows."""
    return df.withColumn(
        salt_col,
        F.pmod(
            F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(buckets)
        ),
    )


def replicate_salts(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Explode the small side across all salt values."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side
    salted and the small side replicated; semantically identical to
    ``big.join(small, on, how)`` for inner/left joins. Other join types
    (right/full/anti) would break under small-side replication — every
    small row appears ``buckets`` times — so they are rejected."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left'); got {how!r} — "
            "replicating the small side breaks right/full/anti semantics"
        )
    salted_big = with_salt(big, on, buckets)
    salted_small = replicate_salts(small, buckets)
    joined = salted_big.join(salted_small, [on, "_salt"], how)
    return joined.drop("_salt")
