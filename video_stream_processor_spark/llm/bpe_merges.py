"""Frozen BPE merge table — the shipped-tokenizer pattern.

Trained once with ``text.bpe_train(documents, n_merges=48,
min_pair_count=2)`` on the sf0.001 ``documents`` fixture (2026-08-14)
and frozen here, exactly like a production pipeline ships a trained
``tokenizer.json`` and applies it unchanged to any corpus. Freezing is
what makes the learned tokenizer oracle-checkable: both the Spark
plan (``text.bpe_count_col``) and the DuckDB oracle
(``text.bpe_count_sql``) replay this same table, so the driver
value-checks learned-subword token counts end to end.

Retrain and refresh deliberately (it is a versioned artifact, not a
cache): ``bpe_train`` is deterministic for a given corpus — ties
break on (max pair count, lexicographically smallest pair).
"""

from __future__ import annotations

PRETRAINED_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("d", "ow"), ("in", "dow"),
    ("w", "indow"), ("d", "er"), ("or", "der"), ("or", "t"),
    ("s", "ort"), ("par", "t"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("in", "e"),
    ("l", "ine"), ("e", "y"), ("k", "ey"), ("j", "o"), ("jo", "in"),
    ("g", "e"), ("mer", "ge"), ("er", "y"), ("g", "r"), ("gr", "o"),
    ("gro", "up"), ("q", "u"), ("qu", "ery"), ("c", "t"),
    ("ct", "or"), ("e", "ctor"),
]
