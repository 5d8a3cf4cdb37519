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
    """Deterministic per-row salt derived from the whole row's hash —
    uniform across a hot key's rows, stable across retries."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
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
    ``big.join(small, on, how)`` for inner/left joins."""
    salted_big = with_salt(big, on, buckets)
    salted_small = replicate_salts(small, buckets)
    joined = salted_big.join(salted_small, [on, "_salt"], how)
    return joined.drop("_salt")
