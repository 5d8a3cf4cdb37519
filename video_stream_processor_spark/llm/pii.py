"""PII detection and redaction for training-data pipelines.

A large-scale corpus pipeline scrubs personally identifiable
information before training: emails, phone numbers, IP addresses,
national-id and card-shaped digit runs. This module implements the
scrub as pure JVM regex Column expressions — ``regexp_count`` for
per-kind detection counts and a chained ``regexp_replace`` for
redaction — so the hot path stays inside whole-stage codegen with no
Python involvement and scales linearly with the scan.

Pattern dialect: every regex here is valid, with identical matching
semantics, in BOTH Java ``java.util.regex`` (Spark) and RE2 (DuckDB —
the oracle engine): ASCII character classes only, non-capturing
groups, ``\\b`` word boundaries, and NO lookaround or backreferences
(RE2 has neither). Counts are non-overlapping left-to-right matches —
the same rule in both engines.

Not in the reference (it processes video-station metadata:
``video_processor.py`` has no text scrubbing); this is part of the
beyond-reference LLM-pipeline surface (SURVEY §2 L4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered dict: redaction applies in THIS order (email before the
# digit-run kinds so an address is consumed whole, never partially
# rewritten by a later digit pattern).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "card": r"\b\d{4}(?:[ -]\d{4}){3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
}


def pii_count(col, kind: str) -> Column:
    """Non-overlapping match count of one PII kind. Counts are taken
    independently per kind on the ORIGINAL text (not the partially
    redacted text), so kinds commute and the numbers are auditable."""
    return F.regexp_count(F.col(col) if isinstance(col, str) else col,
                          F.lit(PII_PATTERNS[kind]))


def pii_count_cols(col, kinds: tuple[str, ...] | None = None) -> list[Column]:
    """One ``n_<kind>`` LONG column per requested kind."""
    kinds = tuple(PII_PATTERNS) if kinds is None else kinds
    return [pii_count(col, k).cast("long").alias(f"n_{k}") for k in kinds]


def redact_pii(col, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII match with a ``<KIND>`` token, applying kinds
    in ``PII_PATTERNS`` order (email first). Chained ``regexp_replace``
    — one codegen'd projection, no shuffle, no UDF."""
    out = F.col(col) if isinstance(col, str) else col
    kinds = tuple(PII_PATTERNS) if kinds is None else kinds
    for k in kinds:
        out = F.regexp_replace(out, F.lit(PII_PATTERNS[k]), F.lit(f"<{k.upper()}>"))
    return out


def pii_oracle_exprs(text_expr: str, kinds: tuple[str, ...] | None = None
                     ) -> tuple[list[str], str]:
    """DuckDB twins of ``pii_count_cols`` + ``redact_pii`` over the SQL
    expression ``text_expr``: (count select-exprs, redacted expr).
    Kept next to the patterns so engine and oracle can never drift."""
    kinds = tuple(PII_PATTERNS) if kinds is None else kinds
    counts = [
        f"CAST(len(regexp_extract_all({text_expr}, '{PII_PATTERNS[k]}')) "
        f"AS BIGINT) AS n_{k}"
        for k in kinds
    ]
    red = text_expr
    for k in kinds:
        red = (f"regexp_replace({red}, '{PII_PATTERNS[k]}', "
               f"'<{k.upper()}>', 'g')")
    return counts, red
