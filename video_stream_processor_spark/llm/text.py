"""L4 — text analysis over ``documents``: quality stats, BPE-ish token
counting, language ID, rolling-hash fingerprints.

Reference parity: generalizes the reference's tag tokenizer
(``video_processor.py:221-224`` — regex tokenize, stopword filter) and
keyword language classifier (``:226-244``, F9). Everything is built-in
Column expressions — zero Python in the row path.

Scale notes: all per-doc derivations are map-side (narrow); the only
shuffles are the final small groupBys. Fingerprints use integer
arithmetic inside ``F.aggregate`` (whole-stage codegen'd), not a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _memo_checkpoint, tokens

STOPWORDS = ["the", "a", "of", "and", "to", "in"]

# GPT-2-flavoured pre-tokenizer classes: letter runs, digit runs,
# single non-space symbols. Portable subset (no \p classes) so the
# DuckDB oracle can run the identical pattern.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"

# Deterministic marker-token language model (F9 generalized): priority
# order is fixed — first max score wins, so ties are stable. The test
# corpus is synthetic word-soup, so the interesting property is the
# classifier's determinism and shape, not its accuracy on fake labels.
# No marker-less entry: a language with no markers scores a constant 0
# and predicted_lang requires best > 0, so it could never be predicted —
# the actual no-marker fallback is the 'und' literal in predicted_lang
# (r15 review: a dead 'zh' entry here claimed to be "the explicit
# default" while being unreachable).
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "and", "of"]),
    ("de", ["der", "die", "und", "nicht"]),
    ("es", ["el", "la", "que", "los"]),
    ("fr", ["le", "la", "et", "les"]),
]

FP_BASE = 1000003
FP_MOD = (1 << 31) - 1


def quality_columns() -> dict[str, Column]:
    """Per-doc quality signals (length / stopword / diversity ratios)."""
    tok = tokens()
    n_tok = F.size(tok)
    stop = F.array([F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(tok, lambda x: F.array_contains(stop, x)))
    return {
        "n_chars": F.length("text"),
        "n_tokens": n_tok,
        "n_distinct_tokens": F.size(F.array_distinct(tok)),
        # try_divide: empty docs (n_tokens=0) exist in any real crawl —
        # under ANSI mode (Spark 4 default) a plain / would throw;
        # NULL ratios drop out of the avg() aggregates naturally.
        "stopword_ratio": F.try_divide(n_stop, n_tok),
        "avg_token_len": F.try_divide(F.length("text") - (n_tok - 1), n_tok),
    }


def text_quality_by_lang(docs: DataFrame) -> DataFrame:
    """L4: corpus quality profile per lang — the filter basis a
    training-data pipeline thresholds on — plus the BPE-ish
    pre-tokenizer budget columns (how many tokens each stratum
    contributes to a training mix). One narrow per-doc pass + one
    small groupBy."""
    q = quality_columns()
    n_bpe = F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE))
    per_doc = docs.select(
        "lang", *[v.alias(k) for k, v in q.items()], n_bpe.alias("n_bpe")
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg("n_distinct_tokens"), 6).alias("avg_distinct_tokens"),
        F.round(F.avg("stopword_ratio"), 6).alias("avg_stopword_ratio"),
        F.round(F.avg("avg_token_len"), 6).alias("avg_token_len"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.min("n_bpe").alias("min_bpe"),
        F.max("n_bpe").alias("max_bpe"),
        F.round(F.avg("n_bpe"), 6).alias("avg_bpe"),
    )


def token_counts_by_source(docs: DataFrame) -> DataFrame:
    """L4: BPE-ish pre-tokenizer counts per source (budgeting signal:
    how many tokens a source contributes)."""
    n = F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE))
    return docs.select("source", n.alias("n_bpe")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").alias("total_bpe_tokens"),
        F.min("n_bpe").alias("min_bpe"),
        F.max("n_bpe").alias("max_bpe"),
        F.round(F.avg("n_bpe"), 6).alias("avg_bpe"),
    )


def _contains_any(markers: list[str]):
    """One-arg lambda factory (a default arg would change the lambda's
    arity and flip pyspark into (value, index) mode)."""
    arr = F.array([F.lit(m) for m in markers])
    return lambda x: F.array_contains(arr, x)


def predicted_lang() -> Column:
    """Marker-scored language prediction with fixed priority order."""
    tok = tokens()
    scores = [
        (lang, F.size(F.filter(tok, _contains_any(markers))))
        for lang, markers in LANG_MARKERS
    ]
    best = F.greatest(*[s for _, s in scores])
    pred: Column = F.lit("und")
    # reverse order => earlier languages win ties (first-max priority)
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def langid_confusion(docs: DataFrame) -> DataFrame:
    """L4: labeled-lang × predicted-lang confusion counts."""
    return (
        docs.select("lang", predicted_lang().alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def bpe_word_frequencies(
    docs: DataFrame,
    text_col: str = "text",
    min_word_count: int = 1,
    max_vocab: int | None = 500_000,
) -> DataFrame:
    """Distributed phase of BPE training: pre-token word frequencies,
    BOUNDED before any driver collect. ``min_word_count`` drops rare
    words (hapax legomena dominate a web-scale vocab but contribute
    almost nothing to pair counts); ``max_vocab`` keeps the top-N by
    (count desc, word asc — deterministic tie-break), executed as a
    TakeOrdered (per-partition top-N then merge), not a global sort.
    Together they make the driver collect O(max_vocab) regardless of
    corpus size."""
    wc = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BPE_TOKEN_RE), 0
                )
            ).alias("w")
        )
        .groupBy("w")
        .count()
    )
    if min_word_count > 1:
        wc = wc.filter(F.col("count") >= min_word_count)
    if max_vocab is not None:
        wc = wc.orderBy(F.col("count").desc(), F.col("w").asc()).limit(
            max_vocab
        )
    return wc


def bpe_train(
    docs: DataFrame,
    n_merges: int = 48,
    min_pair_count: int = 2,
    text_col: str = "text",
    min_word_count: int = 1,
    max_vocab: int | None = 500_000,
) -> list[tuple[str, str]]:
    """L4: learn a BPE merge table from a corpus (real subword
    tokenization, not just the pre-tokenizer regex).

    Scale shape — the two standard phases:
    1. distributed: pre-token *word frequencies* (one explode + hash
       agg), CAPPED before collection: ``min_word_count`` floors the
       frequency and ``max_vocab`` (default 500k, always on) truncates
       to the most frequent words, so the driver collect is bounded by
       max_vocab even on a 100 TB corpus — the same vocab pruning
       in-memory BPE trainers apply. BPE trains on the word-frequency
       dict, never the raw corpus.
    2. driver: classic pair-merge loop over the vocab. Deterministic
       regardless of collect order: the best pair is chosen by
       (max count, then lexicographically smallest pair).

    Application is engine-portable: replaying the returned merges in
    order, each exhaustively left-to-right (plain string replace),
    reproduces the training segmentation exactly.
    """
    wc = bpe_word_frequencies(
        docs,
        text_col=text_col,
        min_word_count=min_word_count,
        max_vocab=max_vocab,
    ).collect()
    vocab = {r["w"]: int(r["count"]) for r in wc}
    syms: dict[str, tuple[str, ...]] = {w: tuple(w) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, c in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        ab = a + b
        for w, s in syms.items():
            if a not in s:
                continue
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


def _bpe_word_expr(w: Column, merges: list[tuple[str, str]]) -> Column:
    """Space-joined BPE symbols of one pre-token: split to chars, then
    replay every merge in rank order (literal replace-all — exactly the
    training-time evolution). Pure string Columns, JVM-side."""
    s = F.concat_ws(
        " ", F.filter(F.split(w, ""), lambda x: x != F.lit(""))
    )
    for a, b in merges:
        s = F.replace(s, F.lit(f"{a} {b}"), F.lit(a + b))
    return s


def bpe_count_col(
    merges: list[tuple[str, str]], col: str = "text"
) -> Column:
    """Learned-BPE token count per document (BIGINT, 0 for empty) —
    the budget number a training pipeline actually bills by, vs the
    pre-tokenizer upper bound ``regexp_count(BPE_TOKEN_RE)``."""
    pre = F.regexp_extract_all(F.col(col), F.lit(BPE_TOKEN_RE), 0)
    counts = F.transform(
        pre, lambda w: F.size(F.split(_bpe_word_expr(w, merges), " "))
    )
    return F.aggregate(
        counts, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def bpe_segment_col(
    merges: list[tuple[str, str]], col: str = "text"
) -> Column:
    """Array of learned-BPE subword tokens for a document (pre-token
    boundaries never crossed, like real BPE)."""
    pre = F.regexp_extract_all(F.col(col), F.lit(BPE_TOKEN_RE), 0)
    return F.flatten(
        F.transform(
            pre, lambda w: F.split(_bpe_word_expr(w, merges), " ")
        )
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_count_sql(merges: list[tuple[str, str]], text_expr: str = "text") -> str:
    """DuckDB twin of ``bpe_count_col`` — same merge replay as nested
    literal ``replace`` calls, so a learned tokenizer is still
    oracle-checkable once its merge table is fixed."""
    s = (
        "array_to_string(list_filter(string_split(w, ''),"
        " x -> x != ''), ' ')"
    )
    for a, b in merges:
        s = f"replace({s}, {_sql_quote(f'{a} {b}')}, {_sql_quote(a + b)})"
    return (
        "CAST(coalesce(list_sum(list_transform("
        f"regexp_extract_all({text_expr},"
        " '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'),"
        f" w -> len(string_split({s}, ' ')))), 0) AS BIGINT)"
    )


def fingerprint_col() -> Column:
    """Order-sensitive polynomial rolling hash of the token stream:
    fp = fold(fp * B + (31*len(tok) + ascii(tok[0]))) mod M. Pure
    integer Column arithmetic — identical in the DuckDB oracle."""
    tok_val = lambda x: (F.length(x) * 31 + F.ascii(x)).cast("long")  # noqa: E731
    return F.aggregate(
        tokens(),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * FP_BASE + tok_val(x)) % FP_MOD,
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """L4: per-doc rolling-hash fingerprint + a grouped collision
    profile would be dedup L1 on ordered content."""
    return docs.select(
        "doc_id", fingerprint_col().alias("fingerprint"), F.length("text").alias("n_chars")
    )


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """L4: top-k terms per source by tf-idf — pure relational form
    (explode -> two aggregations -> window top-k), no ML pipeline
    object. tf = term count within the source; idf = ln(n_sources /
    n_sources_containing_term); stopword-free.

    Scale: one explode + shuffles keyed by (source, token) then token —
    the standard inverted-index build; the window top-k is per source
    (small state)."""
    from pyspark.sql import Window

    stop = F.array([F.lit(s) for s in STOPWORDS])
    tok = docs.select(
        "source",
        F.explode(F.filter(tokens(), lambda x: ~F.array_contains(stop, x))).alias(
            "token"
        ),
    )
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    # n_sources joins in as a broadcast 1-row aggregate — building this
    # plan triggers ZERO jobs (an eager distinct().count() here would
    # run a Spark job per plan build and break single-DAG laziness).
    n_sources = docs.agg(
        F.count_distinct("source").cast("double").alias("__n_sources")
    )
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n_sources))
        .select(
            "source",
            "token",
            F.round(
                F.col("tf") * F.log(F.col("__n_sources") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("source", "token", "tfidf", "rnk")
    )


def unigram_lm_bits(docs: DataFrame) -> DataFrame:
    """L4 (CCNet-style LM quality scoring, Wenzek et al. 2020 §4.3):
    per-doc cross-entropy in bits/token under the corpus's OWN unigram
    language model — the deterministic stand-in for CCNet's external
    KenLM perplexity (no model artifacts in this container), preserving
    the pipeline shape: train LM on corpus -> score every doc -> bucket
    into head/middle/tail.

    Plan (what holds at 100 TB):
    1. ONE explode of the token arrays into per-doc term frequencies
       (groupBy(doc_id, lang, token).count()) — the only scan of the
       corpus. The tf exchange is the shared spine of the plan: the
       vocab build and the scoring join both read it, and Catalyst's
       ReusedExchange makes the tokenize+explode run ONCE (the naive
       two-subtree form re-tokenized the whole corpus for scoring);
    2. vocab = tf.groupBy(token).sum — the LM "training" shuffle over
       (doc, token) pairs, already deduplicated per doc;
    3. total token count joins as a broadcast 1-row aggregate (lazy —
       same pattern as ``tfidf_top_terms``'s n_sources);
    4. scoring BROADCASTS the vocab back onto the tf rows (a unigram
       vocab is bounded by distinct tokens — megabytes even for
       web-scale corpora once min-count trimmed), so the corpus itself
       is never shuffled for scoring; the per-instance average is the
       tf-weighted average over distinct terms;
    5. the per-doc agg shuffles ~1 row per doc (partial agg).

    Empty docs drop out at the explode (no tokens to score) — exactly
    the docs a perplexity filter cannot rank.
    """
    ex = docs.select("doc_id", "lang", F.explode(tokens()).alias("token"))
    # Materialize the tf spine once (memoized per session/plan): the
    # vocab build and the scoring join both read it, so the corpus is
    # tokenized exactly once — at cluster scale, "write the tf table,
    # read it twice".
    tf = _memo_checkpoint(
        ex.groupBy("doc_id", "lang", "token").agg(
            F.count(F.lit(1)).alias("tf")
        ),
        "unigram_tf",
    )
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("__total_tokens"))
    return (
        tf.join(F.broadcast(vocab), "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (
                F.sum(
                    F.col("tf")
                    * -F.log2(F.col("cnt") / F.col("__total_tokens"))
                )
                / F.sum("tf")
            ).alias("bits_per_token"),
        )
    )


def unigram_lm_by_lang(docs: DataFrame) -> DataFrame:
    """Per-lang rollup of ``unigram_lm_bits`` plus the CCNet
    head/middle/tail split: ntile(3) over ALL scored docs ordered by
    rounded bits/token (round-6 first, then doc_id — the rounding makes
    the sort key bit-identical across engines, so the bucket boundary
    can never sit on a float-noise tie), then per-lang bucket counts:
    which languages contribute "head" (most predictable) vs "tail"
    documents to a training mix.

    Scale note: the global ntile is a single-partition window over ONE
    ROW PER DOC (not the corpus rows); at extreme scale the same split
    comes from two approx-quantile thresholds instead — the output
    contract (3 near-equal buckets) is unchanged.
    """
    from pyspark.sql import Window

    bits = unigram_lm_bits(docs)
    w = Window.orderBy(F.round("bits_per_token", 6), "doc_id")
    bucketed = bits.withColumn("bucket", F.ntile(3).over(w))
    return bucketed.groupBy("lang").agg(
        F.round(F.avg("bits_per_token"), 6).alias("avg_bits_per_token"),
        F.round(F.min("bits_per_token"), 6).alias("min_bits_per_token"),
        F.round(F.max("bits_per_token"), 6).alias("max_bits_per_token"),
        F.sum((F.col("bucket") == 1).cast("long")).alias("n_head"),
        F.sum((F.col("bucket") == 2).cast("long")).alias("n_middle"),
        F.sum((F.col("bucket") == 3).cast("long")).alias("n_tail"),
    )


def repetition_signals(docs: DataFrame) -> DataFrame:
    """L4 (Gopher-style repetition filters): per-doc duplicate-n-gram
    fractions and the character share of the single most repeated
    token — the "repetitious document" signals a training-data
    pipeline thresholds on (Rae et al. 2021, §A1.1).

    * ``dup2_frac`` / ``dup3_frac`` — fraction of word n-grams that are
      repeats of an earlier n-gram in the same doc (NULL when the doc
      is too short to have any).
    * ``top_char_frac`` — max over distinct tokens of
      (occurrences x token length) / total token chars: the char mass
      the most dominant token accounts for.

    Scale: every column is a higher-order-function expression over the
    token array — map-side, codegen'd, zero shuffle, no Python. The
    per-doc distinct-token scan is O(distinct x n) on arrays already in
    memory, never a join.
    """
    from ..operators.hll import _let

    tok = tokens()
    n = F.size(tok)

    def _gram_dup_frac(k: int) -> Column:
        # double let (r15): unbound, every gram's element_at re-ran the
        # tokenization (O(n^2) per doc), and the three ``grams``
        # references re-built the gram array per reference.
        def _frac(t: Column) -> Column:
            return _let(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - (k - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(t, i + j) for j in range(k)]
                    ),
                ),
                lambda grams: F.round(
                    (F.size(grams) - F.size(F.array_distinct(grams)))
                    / F.size(grams),
                    6,
                ),
            )

        # CASE guards the descending-sequence trap: sequence(1, 0)
        # counts DOWN in Spark, and element_at(, 0) throws under ANSI.
        return F.when(n >= k, _let(tok, _frac))

    # let-bound (r15): the per-distinct-token filter otherwise re-ran
    # the tokenization once PER DISTINCT TOKEN — O(distinct * n) full
    # re-tokenizations per doc, the hottest site in this module.
    top_chars = _let(
        tok,
        lambda t: F.array_max(
            F.transform(
                F.array_distinct(t),
                lambda x: F.size(F.filter(t, lambda y: y == x)) * F.length(x),
            )
        ),
    )
    total_chars = F.aggregate(
        tok, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        _gram_dup_frac(2).alias("dup2_frac"),
        _gram_dup_frac(3).alias("dup3_frac"),
        F.when(n >= 1, F.round(top_chars / total_chars, 6)).alias(
            "top_char_frac"
        ),
    )


def corpus_report(docs: DataFrame) -> DataFrame:
    """One-row corpus audit — the "is this corpus sane" call an
    operator runs before and after every curation step: size, token
    budget, distinct-token estimate (HLL — sketch, not a giant exact
    distinct), language/source breadth, exact-duplicate rate, and mean
    quality ratios.

    Scale shape: ONE scan of the corpus into a single global aggregate
    (map-side partials for every column, HLL for the distinct
    estimate), plus one hash-shuffle for the duplicate-group count —
    the same two-pass budget as ``exact_dedup_groups`` alone. Nothing
    is collected; the result is a 1-row DataFrame.
    """
    tok = tokens()
    n_tok = F.size(tok)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(n_tok).cast("long").alias("total_tokens"),
        F.approx_count_distinct("lang").alias("n_langs"),
        F.approx_count_distinct("source").alias("n_sources"),
        F.round(F.avg(F.try_divide(F.size(F.array_distinct(tok)), n_tok)), 6).alias(
            "avg_distinct_token_ratio"
        ),
        F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(sha2(text, 256), 12))").alias(
            "approx_distinct_texts"
        ),
    )
    dups = (
        docs.groupBy(F.sha2("text", 256).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum(F.col("n") - 1).cast("long").alias("n_duplicate_docs"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_texts"),
        )
    )
    return stats.crossJoin(F.broadcast(dups)).withColumn(
        "dup_rate",
        F.round(F.try_divide(F.col("n_duplicate_docs"), F.col("n_docs")), 6),
    )


def chunk_token_windows(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    with_text: bool = False,
) -> DataFrame:
    """L4: overlapping token-window chunking — the RAG/pretraining
    chunker. Each doc expands to its stride-spaced windows identified
    by (doc_id, chunk_idx); ``with_text=False`` carries only an md5
    digest per chunk (the registered llm_sequence_packing oracle form —
    nothing wide crosses the explode), ``with_text=True`` carries the
    chunk text itself (the shard-writing form: replicating the
    overlapped text IS the output).

    Scale shape: slice/hash/join run INSIDE the per-row transform
    before the explode — map-side only, no shuffle, no Python; 100 TB
    chunks in one scan. Empty docs produce no chunks on both engines.
    """
    from ..operators.hll import _let

    keep = [c for c in docs.columns if c != "text"]
    tok = tokens()
    n = F.size(tok)
    payload = "chunk_text" if with_text else "chunk_md5"

    # let-bound token array (r15): each chunk's two slices otherwise
    # re-ran the tokenization — O(n^2 / stride) characters per doc.
    def _chunks(t: Column) -> Column:
        def body(s):
            joined = F.concat_ws(" ", F.slice(t, s, F.lit(window)))
            return joined if with_text else F.md5(joined)

        return F.transform(
            F.sequence(F.lit(1), F.size(t), F.lit(stride)),
            lambda s: F.struct(
                F.floor((s - 1) / stride + 1).cast("int").alias("chunk_idx"),
                F.size(F.slice(t, s, F.lit(window))).alias("chunk_tokens"),
                body(s).alias(payload),
            ),
        )

    chunks = _let(tok, _chunks)
    return (
        docs.filter(n >= 1)
        .select(*keep, F.explode(chunks).alias("c"))
        .select(
            *keep,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk_tokens").alias("chunk_tokens"),
            F.col(f"c.{payload}").alias(payload),
        )
    )
